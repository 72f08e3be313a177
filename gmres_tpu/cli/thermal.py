"""3D-IC thermal analysis driver — the src_thermal main/main2 equivalent.

Reads a GCB matrix directory (A/B/C/u_vec/t_step .mtx, parserGCB.m format)
and runs:
  (default)      backward-Euler transient, per-step preconditioned GMRES
                 (main2.cu:437-506)
  -bench-spmv    SpMV benchmark + host verification (main.cu:203-279)
  -oneshot       single GMRES solve A x = B u_0 (main.cu/main1.cu)
Preconditioner menu matches main2.cu:55-80: none/diag/ilu0/ainv (+iluk).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="thermal")
    ap.add_argument("gcb_dir", help="directory with A/B/C/u_vec/t_step .mtx")
    ap.add_argument("-precond", default="ilu0",
                    choices=["auto", "none", "diag", "jacobi", "ilu0",
                             "iluk", "ainv", "mg"],
                    help="default ilu0 matches the reference's menu default "
                         "(main2.cu:55-80); auto resolves to ainv on the "
                         "grounded thermal systems (cheapest device apply)")
    ap.add_argument("-tol", type=float, default=1e-6)
    ap.add_argument("-restart", type=int, default=32)
    ap.add_argument("-maxiter", type=int, default=60000)
    ap.add_argument("-single", dest="single", action="store_true", default=True)
    ap.add_argument("-double", dest="single", action="store_false")
    ap.add_argument("-steps", type=int, default=0, help="limit time steps")
    ap.add_argument("-chunk", type=int, default=256, metavar="STEPS",
                    help="dispatch the transient in segments of this many "
                         "steps (0 = one program over all steps)")
    ap.add_argument("-o", dest="out", default="xTPU.txt")
    ap.add_argument("-bench-spmv", action="store_true")
    ap.add_argument("-oneshot", action="store_true")
    ap.add_argument("-verify", action="store_true",
                    help="verify device SpMV vs host (rel err < 1e-6)")
    return ap


def main(argv=None) -> int:
    from gmres_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from gmres_tpu.frontend.gcb import read_gcb, write_vector
    from gmres_tpu.models.thermal import thermal_transient
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond import make_preconditioner
    from gmres_tpu.solvers.gmres import gmres
    from gmres_tpu.utils.timing import PhaseTimers

    args = build_argparser().parse_args(argv)
    dtype = jnp.float32 if args.single else jnp.float64
    timers = PhaseTimers()

    with timers.phase("read"):
        sys_ = read_gcb(args.gcb_dir)
    print(f"* {args.gcb_dir}: n={sys_.n}, nnz(A)={sys_.A.nnz}, "
          f"inputs={sys_.B.shape[1]}, steps={sys_.num_steps}, h={sys_.t_step:g}")

    with timers.phase("formats"):
        A_op = device_operator(sys_.A, dtype=dtype)
        x0 = np.zeros(sys_.n)

    if args.verify or args.bench_spmv:
        xr = np.random.default_rng(0).standard_normal(sys_.n)
        y_dev = np.asarray(jax.jit(lambda v: A_op(v))(jnp.asarray(xr, dtype=dtype)))
        y_ref = sys_.A.matvec(xr)
        rel = np.linalg.norm(y_dev - y_ref) / np.linalg.norm(y_ref)
        print(f"* SpMV verify: rel L2 err = {rel:.3e} "
              + ("PASSED" if rel < 1e-5 else "FAILED"))
        if rel >= 1e-5:
            return 1

    if args.bench_spmv:
        from jax import lax

        iters = 100
        xd = jnp.asarray(np.random.default_rng(0).standard_normal(sys_.n), dtype)

        @jax.jit
        def chain(x):
            return lax.fori_loop(0, iters, lambda i, v: A_op(v) * 0.5, x)

        _ = float(jnp.sum(chain(xd)))
        t0 = time.perf_counter()
        _ = float(jnp.sum(chain(xd)))
        dt = (time.perf_counter() - t0) / iters
        gflops = 2 * sys_.A.nnz / dt / 1e9
        print(f"* SpMV: {dt*1e6:.1f} us/iter, {gflops:.2f} GFLOPS, "
              f"{sys_.A.nnz/dt/1e9:.2f} Gnnz/s")
        timers.report()
        return 0

    nsteps = 1 if args.oneshot else (args.steps or sys_.num_steps)
    with timers.phase("precond_setup"):
        # steps feeds the auto policy's amortized cost model (setup +
        # steps * iters * apply): warm-started transient steps favor AINV,
        # deep one-shot solves at scale favor MG (resolve_precond)
        M = make_preconditioner(args.precond, sys_.A, dtype=dtype,
                                fmt="auto", steps=nsteps)

    if args.oneshot:
        b = sys_.B.matvec(sys_.U[:, 0])
        with timers.phase("gmres"):
            res = gmres(A_op, jnp.asarray(b, dtype=dtype),
                        restart=args.restart, tol=args.tol,
                        maxiter=args.maxiter, M_left=M)
        print(f"* one-shot GMRES: iters={int(res.iterations)}, "
              f"restarts={int(res.restarts)}, "
              f"rel residual={float(res.residual):.3e}, "
              f"converged={bool(res.converged)}")
        write_vector(args.out, np.asarray(res.x))
        print(f"** {args.out} dumped")
        timers.report()
        return 0 if bool(res.converged) else 1

    U = sys_.U.T
    if args.steps:
        U = U[: args.steps]
    with timers.phase("transient"):
        res = thermal_transient(
            A_op,
            device_operator(sys_.B, dtype=dtype),
            device_operator(sys_.C_over_h(), dtype=dtype),
            U,
            x0=jnp.zeros((sys_.n,), dtype),
            restart=args.restart, tol=args.tol, maxiter=args.maxiter,
            M_left=M, dtype=dtype, chunk_steps=args.chunk,
        )
        X = np.asarray(res.X)
    it = np.asarray(res.iterations)
    print(f"* transient: {U.shape[0]} steps, {int(it.sum())} GMRES iters "
          f"(mean {it.mean():.1f}/step), "
          f"max residual {float(np.asarray(res.residuals).max()):.3e}, "
          f"all converged={bool(np.asarray(res.converged).all())}")
    write_vector(args.out, X[-1])
    print(f"** {args.out} dumped (final state)")
    timers.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
