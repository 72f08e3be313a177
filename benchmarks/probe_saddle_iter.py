"""Per-iteration GMRES cost, saddle vs jacobi, at contest scale.

The round-3 iterprobe measured 36.88 ms/iter (saddle) vs 2.97 (jacobi) at
2.1M — 12.4x, the number VERDICT r3 #3 demanded be cut to <=3x. Slope over
two maxiter budgets of the REAL solver (operators as jit args inside
gmres's own jitted program), so compile+dispatch fixed costs cancel.

Usage: python benchmarks/probe_saddle_iter.py [netlist]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402


def run(Aop, b, M, iters, restart=50):
    from gmres_tpu.solvers.gmres import gmres

    t0 = time.perf_counter()
    res = gmres(Aop, b, restart=restart, tol=1e-30, maxiter=iters, M_left=M)
    it = int(res.iterations)
    return time.perf_counter() - t0, it, float(res.residual)


def main():
    netlist = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/contest2m.sp"
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond import make_preconditioner

    mna = load_netlist(netlist)
    h = mna.tstep
    A = CSRMatrix.from_scipy(mna.G.to_scipy() + mna.C.to_scipy() / h)
    Aop = device_operator(A, dtype=jnp.float32)
    b = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]).astype(
            np.float32))

    for name in ("jacobi", "saddle"):
        t0 = time.time()
        M = make_preconditioner(name, A, dtype=jnp.float32, fmt="auto")
        setup = time.time() - t0
        t1, i1, _ = run(Aop, b, M, 100)     # compile + warm short
        t1, i1, r1 = run(Aop, b, M, 100)
        t2, i2, _ = run(Aop, b, M, 300)     # compile + warm long
        t2, i2, r2 = run(Aop, b, M, 300)
        per = (t2 - t1) / max(i2 - i1, 1)
        print(f"{name:8s}: setup {setup:.1f} s; {i1}/{i2} iters "
              f"{t1:.2f}/{t2:.2f} s -> {per*1e3:.2f} ms/iter "
              f"(res {r2:.3e})", flush=True)


if __name__ == "__main__":
    main()
