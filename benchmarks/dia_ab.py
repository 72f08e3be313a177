"""DIA SpMV A/B: Pallas kernel vs XLA shifted-adds, N runs each
(VERDICT r1 #4: resolve the 40.6 vs 16.4 Gnnz/s variance, flip the default
to the winner).

Usage: python benchmarks/dia_ab.py [--nx 128] [--runs 5]
Prints per-run nnz/s for both paths interleaved (ABAB...) so slow drift of
the shared dev TPU hits both arms equally, then median +- spread.
"""

import argparse
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_dia_laplacian3d
    from gmres_tpu.ops.pallas_spmv import dia_spmv_pallas
    from gmres_tpu.ops.spmv import dia_spmv_xla

    import numpy as np

    A, _, nnz = build_dia_laplacian3d(args.nx)
    n_pad = A.shape[0]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n_pad),
                    jnp.float32)

    def chain(fn):
        @jax.jit
        def run(v):
            return lax.fori_loop(0, args.iters,
                                 lambda i, u: fn(A, u) * 0.08, v)
        return run

    arms = {"pallas": chain(dia_spmv_pallas), "xla": chain(dia_spmv_xla)}
    results = {k: [] for k in arms}
    for k, fn in arms.items():          # compile + warm both first
        _ = float(jnp.sum(fn(x)))
    for r in range(args.runs):
        for k, fn in arms.items():      # interleave ABAB
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(x)))
            dt = (time.perf_counter() - t0) / args.iters
            rate = nnz / dt / 1e9
            results[k].append(rate)
            print(f"run {r} {k:7s} {rate:8.2f} Gnnz/s", flush=True)
    for k, v in results.items():
        med = statistics.median(v)
        print(f"{k:7s} median {med:8.2f} Gnnz/s  "
              f"min {min(v):.2f} max {max(v):.2f}", flush=True)
    winner = max(results, key=lambda k: statistics.median(results[k]))
    print(f"WINNER: {winner}", flush=True)


if __name__ == "__main__":
    main()
