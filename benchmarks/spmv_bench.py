"""SpMV format shoot-out: DIA (XLA vs Pallas), ELL, WELL on stencil and
general matrices. Prints a table; all timings in-graph with forced
materialization (see MEASUREMENTS.md for why).

Usage: python benchmarks/spmv_bench.py [--nx 128] [--iters 100]
"""

import argparse
import time

import numpy as np


def chain_time(f, x, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, iters, lambda i, v: f(v) * 0.08, x)

    _ = float(jnp.sum(chain(x)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(chain(x)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--general", action="store_true",
                    help="also run a reordered random-banded general matrix")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.pallas_spmv import dia_pallas_supported, dia_spmv_pallas
    from gmres_tpu.ops.spmv import dia_spmv, ell_spmv
    from gmres_tpu.ops.well import to_well, well_spmv

    nx = args.nx
    n = nx ** 3
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nx)
    A = (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(T, I), I)).tocsr()
    host = CSRMatrix.from_scipy(A)
    nnz = host.nnz
    print(f"stencil: n={n}, nnz={nnz}, backend={jax.default_backend()}")

    rng = np.random.default_rng(0)

    Ad = host.to_dia(dtype=jnp.float32, pad_to=1024)
    xp = jnp.asarray(rng.standard_normal(Ad.shape[0]), jnp.float32)
    from gmres_tpu.ops import spmv as spmv_mod

    # XLA shifted-adds path (bypass auto-routing)
    def dia_xla(v):
        n_, _ = Ad.shape
        maxneg = max(0, -min(Ad.offsets))
        maxpos = max(0, max(Ad.offsets))
        vp = jnp.pad(v, (maxneg, maxpos))
        y = jnp.zeros_like(v)
        for d_idx, off in enumerate(Ad.offsets):
            seg = jax.lax.dynamic_slice_in_dim(vp, off + maxneg, n_)
            y = y + Ad.data[d_idx, :] * seg
        return y

    dt = chain_time(dia_xla, xp, args.iters)
    print(f"  DIA/XLA    : {dt*1e6:9.1f} us  {nnz/dt/1e9:8.2f} Gnnz/s")
    if dia_pallas_supported(Ad) and jax.default_backend() == "tpu":
        dt = chain_time(lambda v: dia_spmv_pallas(Ad, v), xp, args.iters)
        print(f"  DIA/Pallas : {dt*1e6:9.1f} us  {nnz/dt/1e9:8.2f} Gnnz/s")

    W = to_well(host, dtype=jnp.float32)
    xw = jnp.asarray(rng.standard_normal(W.shape[1]), jnp.float32)
    if jax.default_backend() == "tpu":
        def wf(v):
            return well_spmv(W, v)[: W.shape[1]]

        dt = chain_time(wf, xw, args.iters)
        print(f"  WELL/Pallas: {dt*1e6:9.1f} us  {nnz/dt/1e9:8.2f} Gnnz/s")

    if args.general:
        from gmres_tpu.ops.reorder import rcm_ordering

        m = min(n, 500_000)
        B = sp.random(m, m, density=8 / m, random_state=rng, format="csr")
        B = B + sp.eye(m)
        hostB = CSRMatrix.from_scipy(B.tocsr())
        perm = rcm_ordering(hostB)
        hostB = hostB.permute(perm)
        WB = to_well(hostB, dtype=jnp.float32)
        xb = jnp.asarray(rng.standard_normal(WB.shape[1]), jnp.float32)
        print(f"general (RCM): n={m}, nnz={hostB.nnz}, "
              f"slot util={hostB.nnz/np.prod(WB.vals.shape):.3f}")
        if jax.default_backend() == "tpu":
            def wbf(v):
                return well_spmv(WB, v)[: WB.shape[1]]

            dt = chain_time(wbf, xb, args.iters)
            print(f"  WELL/Pallas: {dt*1e6:9.1f} us  "
                  f"{hostB.nnz/dt/1e9:8.2f} Gnnz/s")
        Eb = hostB.to_ell(dtype=jnp.float32)
        dt = chain_time(lambda v: ell_spmv(Eb, v), xb[: m], args.iters)
        print(f"  ELL/XLA    : {dt*1e6:9.1f} us  "
              f"{hostB.nnz/dt/1e9:8.2f} Gnnz/s")


if __name__ == "__main__":
    main()
