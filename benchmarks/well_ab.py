"""General-sparsity SpMV A/B on the 100K PG matrix: WELL v1 (cross-window
chunks, dynamic sublane reads) vs WELL v2 (slab + MXU one-hot select) vs
hybrid DIA+WELL (natural ordering), N runs each, interleaved.

Usage: python benchmarks/well_ab.py [--runs 5] [--nx 316]
"""

import argparse
import statistics
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=316)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import build_pg_mna
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.ops.well import to_hybrid, to_well, to_well_slab

    An = build_pg_mna(args.nx, rcm=False)
    Ab = build_pg_mna(args.nx, rcm=True)
    nnz = An.nnz
    print(f"n={An.shape[0]} nnz={nnz} backend={jax.default_backend()}",
          flush=True)

    arms = {}
    W1 = to_well(CSRMatrix.from_scipy(Ab), dtype=jnp.float32)
    arms["v1_rcm"] = (W1, Ab)
    W2 = to_well_slab(CSRMatrix.from_scipy(Ab), dtype=jnp.float32)
    if W2 is not None:
        print(f"v2 slab={W2.slab} groups={W2.ngroups} spill={W2.spill_nnz}",
              flush=True)
        arms["v2_rcm"] = (W2, Ab)
    H = to_hybrid(CSRMatrix.from_scipy(An), dtype=jnp.float32)
    if H is not None:
        print(f"hybrid diags={len(H.dia.offsets)} rest={type(H.rest).__name__}",
              flush=True)
        arms["hyb_nat"] = (H, An)

    def make_chain(dev):
        @jax.jit
        def chain(v):
            return lax.fori_loop(0, args.iters,
                                 lambda i, u: spmv(dev, u) * 0.08, v)
        return chain

    chains, xs = {}, {}
    for k, (dev, Aref) in arms.items():
        x = np.zeros(dev.shape[1], np.float32)
        x[: Aref.shape[0]] = np.random.default_rng(0).standard_normal(
            Aref.shape[0])
        xs[k] = jnp.asarray(x)
        # verify before timing
        y = np.asarray(jax.jit(lambda v: spmv(dev, v))(xs[k]))[: Aref.shape[0]]
        yr = Aref.astype(np.float64) @ x[: Aref.shape[0]].astype(np.float64)
        rel = np.linalg.norm(y - yr) / np.linalg.norm(yr)
        assert rel < 1e-5, f"{k}: verify failed rel={rel}"
        chains[k] = make_chain(dev)
        _ = float(jnp.sum(chains[k](xs[k])))   # compile + warm

    results = {k: [] for k in arms}
    for r in range(args.runs):
        for k in arms:
            t0 = time.perf_counter()
            _ = float(jnp.sum(chains[k](xs[k])))
            dt = (time.perf_counter() - t0) / args.iters
            rate = nnz / dt / 1e9
            results[k].append(rate)
            print(f"run {r} {k:8s} {rate:8.2f} Gnnz/s", flush=True)
    for k, v in results.items():
        print(f"{k:8s} median {statistics.median(v):8.2f} Gnnz/s "
              f"min {min(v):.2f} max {max(v):.2f}", flush=True)


if __name__ == "__main__":
    main()
