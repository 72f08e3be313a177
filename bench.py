"""Headline benchmark: SpMV nnz/s per chip (BASELINE.json primary metric).

Runs the DIA-format SpMV (the thermal/PG stencil fast path) on a 7-point
3D-Laplacian thermal matrix on whatever accelerator JAX exposes, verifies it
against the host oracle, and prints ONE JSON line.

``vs_baseline``: the reference never published absolute SpMV rates; its
GFLOPS metric (src_thermal/main.cu:258-260: 2*nnz/time) on the Tesla C2070
(144 GB/s) tops out around 5e9 nnz/s for CSR SpMV — we use that as the
baseline denominator (see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_NNZ_PER_S = 5e9


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import spmv

    nx = 128  # 2.1M nodes, ~14.6M nnz
    n = nx * nx * nx
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nx)
    A = (
        sp.kron(sp.kron(I, I), T)
        + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    ).tocsr()
    host = CSRMatrix.from_scipy(A)
    nnz = host.nnz

    A_dev = host.to_dia(dtype=jnp.float32, pad_to=1024)
    n_pad = A_dev.shape[0]
    xh = np.zeros(n_pad, np.float32)
    xh[:n] = np.random.default_rng(0).standard_normal(n)
    x = jnp.asarray(xh)

    # verify (relative L2 < 1e-5 vs f64 host oracle; main.cu:263-279 analogue)
    y = jax.jit(lambda x: spmv(A_dev, x))(x)
    y_ref = host.matvec(xh[:n].astype(np.float64))
    rel = np.linalg.norm(np.asarray(y)[:n] - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-5, f"SpMV verify failed: rel={rel}"

    # time a chained in-graph loop (matches solver usage; per-dispatch
    # latency through the device tunnel would otherwise dominate), and force
    # materialization with a host read — block_until_ready alone does not
    # block on tunneled backends.
    iters = 100

    @jax.jit
    def chain(x):
        import jax.lax as lax

        return lax.fori_loop(0, iters, lambda i, v: spmv(A_dev, v) * 0.08, x)

    _ = float(jnp.sum(chain(x)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(chain(x)))
    dt = (time.perf_counter() - t0) / iters

    nnz_per_s = nnz / dt
    print(
        json.dumps(
            {
                "metric": "spmv_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / BASELINE_NNZ_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
