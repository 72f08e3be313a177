"""Power-grid analysis driver — the ``etbr_cmd``/``mna_cmd`` equivalent.

Flag surface mirrors etbr_cmd_short.cpp:91-167:
  -fast        ETBR reduction path (else full MNA)
  -nq Q        reduced order (default 20)
  -ec          dynamic error control (mixed transient)
  -th T        IR/error threshold (default 0.05)
  -mt N        threaded sample solves
  -tpu         device engines (accepted alias: -gpu)
  -single/-double   f32 / f64 iteration
  -gmres       iterative full-MNA engine (else direct LU)
  -precond P   auto|none|diag|ilu0|iluk|ainv|ilutp|saddle (default auto:
               saddle = constraint-Schur over AINV on saddle-point MNA,
               ainv on grounded systems; ilutp = the ILU++/ILUCDP pivoting
               class, reference -ilu)
  -ir          IR-drop report
  -dc          DC solve only
Dispatch mirrors the reference matrix at etbr_cmd_short.cpp:248-383.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="pg", description="TPU-native power-grid analysis (GPU-GMRES capability set)"
    )
    ap.add_argument("netlist")
    ap.add_argument("-fast", action="store_true", help="ETBR reduced simulation")
    ap.add_argument("-nq", type=int, default=20, help="reduced order q")
    ap.add_argument("-fftn", type=int, default=1024,
                    help="ETBR source-spectra FFT length (raise to cover "
                         "transients longer than 1024 steps; etbr2.cpp "
                         "hardcodes 1024)")
    ap.add_argument("-ec", action="store_true", help="error-controlled mixed stepping")
    ap.add_argument("-th", type=float, default=0.05, help="error/IR threshold")
    ap.add_argument("-mt", type=int, default=0, metavar="N", help="threaded sample solves")
    ap.add_argument("-np", dest="nparts", type=int, default=1,
                    help="domain-decomposition parts for sample solves")
    ap.add_argument("-ooc", action="store_true",
                    help="out-of-core DD (spill part blocks to disk)")
    ap.add_argument("-tpu", "-gpu", dest="device", action="store_true",
                    help="run engines on the accelerator")
    ap.add_argument("-single", dest="single", action="store_true", default=True)
    ap.add_argument("-double", dest="single", action="store_false")
    ap.add_argument("-gmres", action="store_true", help="iterative full-MNA engine")
    ap.add_argument("-precond", default="auto",
                    choices=["auto", "none", "diag", "jacobi", "ilu0",
                             "iluk", "ainv", "ilutp", "saddle"],
                    help="auto = saddle (constraint-Schur over AINV) on "
                         "saddle-point MNA (zero-diagonal V-source branch "
                         "rows), ainv otherwise")
    ap.add_argument("-ir", action="store_true", help="IR-drop analysis")
    ap.add_argument("-dc", action="store_true", help="DC operating point only")
    ap.add_argument("-refine", action="store_true", default=None,
                    help="mixed-precision iterative refinement (GMRES-IR): "
                         "f64 state/residuals, f32 inner loop — reaches "
                         "tolerances below the f32 floor. DEFAULT for "
                         "-single -gmres: plain f32 stalls at ~1e-4 true "
                         "relative residual on multi-decade MNA systems "
                         "(convergence is declared on the true residual, "
                         "never the preconditioned norm)")
    ap.add_argument("-no-refine", dest="refine", action="store_false",
                    help="disable GMRES-IR (plain working-dtype iteration)")
    ap.add_argument("-tol", type=float, default=1e-7)
    ap.add_argument("-restart", type=int, default=32)
    ap.add_argument("-maxiter", type=int, default=10000,
                    help="per-solve inner-iteration cap (reference "
                         "max_it=10^4, gmres_interface_pg.cu:7). Long "
                         "single dispatches trip the TPU runtime watchdog: "
                         "bound maxiter*chunk to what the device can run "
                         "in ~1 min")
    ap.add_argument("-dcmethod", default="direct",
                    choices=["direct", "gmres"],
                    help="DC operating-point solver seeding the transient: "
                         "host sparse LU (mna_solve.cpp DC semantics) or "
                         "device GMRES (the reference's -gmres path also "
                         "solves DC iteratively on the device, "
                         "mna_solve_gpu_gmres.cpp:529-538); host LU fill "
                         "dominates setup at multi-million nodes")
    ap.add_argument("-chunk", type=int, default=256, metavar="STEPS",
                    help="dispatch the transient in segments of this many "
                         "steps (bounds per-dispatch device time; 0 = one "
                         "program over all steps)")
    ap.add_argument("-o", dest="out", default=None, help="output file basename")
    ap.add_argument("-external", action="store_true",
                    help="UCR_EXTERNAL output format")
    ap.add_argument("-cd", "-device-info", dest="device_info",
                    action="store_true",
                    help="print device/backend info (reference -cd)")
    return ap


def main(argv=None) -> int:
    from gmres_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.frontend.writers import (
        write_dc_output, write_output, write_xgraph,
    )
    from gmres_tpu.models.dc import dc_solve
    from gmres_tpu.models.ir import ir_analysis, write_ir_report
    from gmres_tpu.models.transient import transient_direct, transient_gmres
    from gmres_tpu.utils.timing import PhaseTimers

    args = build_argparser().parse_args(argv)
    if args.refine is None:
        # auto: f32 iteration needs IR to honestly reach tol<=1e-6 on
        # multi-decade MNA systems; f64 iteration doesn't need it
        args.refine = bool(args.gmres and args.single)
    if args.refine:
        # GMRES-IR keeps f64 state; x64 must be on before any tracing.
        import jax

        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.single else jnp.float64
    base = args.out or os.path.splitext(args.netlist)[0]
    timers = PhaseTimers()

    if args.device_info:
        from gmres_tpu.utils.device import device_report

        print(device_report())

    with timers.phase("parse"):
        mna = load_netlist(args.netlist)
    print(f"* parsed {args.netlist}: {mna.num_nodes} nodes, "
          f"{mna.num_vsrc} V-src, {mna.num_ind} L, nnz(G)={mna.G.nnz}")

    if args.dc or mna.tstep <= 0:
        with timers.phase("dc"):
            x = dc_solve(mna, method="gmres" if args.gmres else "direct",
                         precond=args.precond, dtype=dtype)
        names = mna.port_names or list(mna.node_index)[: 20]
        idx = (mna.ports if mna.ports.size
               else np.arange(min(20, mna.num_nodes)))
        write_dc_output(base + ".output", x[idx], names)
        print(f"** {base}.output dumped (DC)")
        timers.report()
        return 0

    if args.fast:
        from gmres_tpu.models.etbr import (
            etbr_reduce, mixed_transient, reduced_transient,
        )

        with timers.phase("etbr_reduce"):
            model = etbr_reduce(
                mna, q=args.nq, workers=args.mt,
                method="gmres" if (args.device and args.gmres) else "lu",
                nparts=args.nparts, out_of_core=args.ooc, fft_n=args.fftn,
                gmres_opts=dict(verbose=True)
                if (args.device and args.gmres) else None,
            )
        print(f"* reduced order q={model.q}, "
              f"sigma1={model.sigma[0]:.3e}, "
              f"sigma_q/sigma1={model.sigma[min(model.q, len(model.sigma)-1)]/model.sigma[0]:.3e}")
        with timers.phase("reduced_transient"):
            if args.ec:
                res = mixed_transient(model, mna, threshold=args.th)
                print(f"* error control: {res.stats['full_resolves']} full re-solves")
            else:
                res = reduced_transient(
                    model, mna, dtype=jnp.float64 if not args.single else jnp.float32
                )
    else:
        with timers.phase("mna_transient"):
            if args.gmres and args.nparts > 1:
                # row-sharded distributed engine over a device mesh — the
                # -np dispatch of the reference (etbr_cmd_short.cpp:364)
                # rebuilt on the framework's scaling axis (SURVEY §2.7 P4/P5)
                import jax

                from gmres_tpu.parallel.dist_transient import (
                    dist_transient_gmres,
                )
                from gmres_tpu.parallel.mesh import make_mesh

                ndev = len(jax.devices())
                nparts = min(args.nparts, ndev)
                if nparts < args.nparts:
                    print(f"* -np {args.nparts} clamped to {nparts} "
                          f"(visible devices)")
                mesh = make_mesh(n_rows=nparts)
                # every preconditioner class has a shard-aligned form:
                # auto/saddle -> DistSaddlePrecond (constraint-Schur),
                # ilutp/ilupp -> block-ILUTP (per-shard pivoting spilu),
                # ilu0/iluk -> block-ILU, ainv -> shard-blocked AINV
                res = dist_transient_gmres(
                    mna, mesh, precond=args.precond, dtype=dtype,
                    tol=args.tol,
                    restart=args.restart, dc_method=args.dcmethod,
                    chunk_steps=args.chunk, refine=args.refine,
                )
                it = res.iterations
                print(f"* distributed gmres transient ({nparts} shards, "
                      f"{res.comm}): {int(it.sum())} total iterations, "
                      f"mean {float(it.mean()):.1f}/step, "
                      f"converged={res.converged}")
                if res.stats:
                    split = ", ".join(f"{k}={v:.1f}s"
                                      for k, v in res.stats.items())
                    print(f"*   setup/run split: {split}")
            elif args.gmres:
                def _progress(done, _x, r):
                    it = np.asarray(r.iterations)
                    print(f"*   step {done}: mean {it.mean():.1f} GMRES "
                          f"iters/step over last {it.size}", flush=True)

                res = transient_gmres(
                    mna, precond=args.precond, dtype=dtype, tol=args.tol,
                    restart=args.restart, maxiter=args.maxiter,
                    refine=args.refine, dc_method=args.dcmethod,
                    chunk_steps=args.chunk, on_chunk=_progress,
                )
                it = res.stats["iterations"]
                print(f"* gmres transient: {int(it.sum())} total iterations, "
                      f"mean {float(it.mean()):.1f}/step, "
                      f"converged={res.stats['converged']}")
                ph = res.stats.get("phases")
                if ph:
                    print("*   engine split: " + ", ".join(
                        f"{k}={v:.1f}s" for k, v in ph.items()))
            else:
                # -tpu: the device-resident direct-LU engine
                # (wrapperGPUforPG.cu:17 equivalent)
                res = transient_direct(mna, device=args.device, dtype=dtype,
                                       chunk_steps=args.chunk)

    names = mna.port_names or [f"n{i}" for i in
                               (mna.ports if mna.ports.size else range(0))]
    with timers.phase("write"):
        if names:
            write_output(base + ".output", res.times, res.port_values, names,
                         external=args.external)
            write_xgraph(base + ".xgraph", res.times, res.port_values, names)
            print(f"** {base}.output dumped")
    if args.ir and names:
        rep = ir_analysis(res.port_values, names)
        write_ir_report(base + ".ir", rep)
        print(f"** {base}.ir dumped")
    timers.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
