"""Headline benchmark: SpMV nnz/s per chip (BASELINE.json primary metric).

Runs the DIA-format SpMV (the thermal/PG stencil fast path) on a 7-point
3D-Laplacian thermal matrix, verifies against a NumPy oracle, and prints ONE
JSON line. The matrix is assembled directly in DIA form (no scipy) so the
whole benchmark fits in a short window on the shared dev TPU.

Timing: chained in-graph loop with forced host materialization —
per-dispatch tunnel latency would otherwise dominate, and
``block_until_ready`` alone does not block on tunneled backends.

``vs_baseline``: the reference never published absolute SpMV rates; its
GFLOPS metric (src_thermal/main.cu:258-260: 2*nnz/time) on the Tesla C2070
(144 GB/s) tops out around 5e9 nnz/s for CSR SpMV — that is the denominator
(see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_NNZ_PER_S = 5e9


def build_dia_laplacian3d(nx: int, pad_to: int = 1024):
    """7-point 3D Laplacian directly in DIA layout (row-aligned convention:
    data[d, i] multiplies x[i + off_d])."""
    import jax.numpy as jnp

    from gmres_tpu.ops.formats import DiaMatrix, round_up

    n = nx ** 3
    n_pad = round_up(n, pad_to)
    offsets = [-nx * nx, -nx, -1, 0, 1, nx, nx * nx]
    i = np.arange(n)
    ix = i % nx
    iy = (i // nx) % nx
    iz = i // (nx * nx)
    data = np.zeros((len(offsets), n_pad), dtype=np.float32)
    data[0, : n][iz > 0] = -1.0
    data[1, : n][iy > 0] = -1.0
    data[2, : n][ix > 0] = -1.0
    data[3, : n] = 6.0
    data[4, : n][ix < nx - 1] = -1.0
    data[5, : n][iy < nx - 1] = -1.0
    data[6, : n][iz < nx - 1] = -1.0
    nnz = int((data != 0).sum())
    A = DiaMatrix(data=jnp.asarray(data), offsets=tuple(offsets),
                  shape=(n_pad, n_pad), logical_n=n)
    return A, data, nnz


def dia_matvec_numpy(data: np.ndarray, offsets, x: np.ndarray) -> np.ndarray:
    n = data.shape[1]
    y = np.zeros(n, dtype=np.float64)
    for d, off in enumerate(offsets):
        lo = max(0, -off)
        hi = min(n, n - off)
        y[lo:hi] += data[d, lo:hi].astype(np.float64) * x[lo + off: hi + off]
    return y


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gmres_tpu.ops.spmv import spmv

    nx = 128  # 2.1M nodes, 14.6M nnz
    A, data_np, nnz = build_dia_laplacian3d(nx)
    n_pad = A.shape[0]
    x_np = np.zeros(n_pad, np.float32)
    x_np[: nx ** 3] = np.random.default_rng(0).standard_normal(nx ** 3)
    x = jnp.asarray(x_np)

    # verify (relative L2 < 1e-5 vs f64 oracle; main.cu:263-279 analogue)
    y = jax.jit(lambda v: spmv(A, v))(x)
    y_ref = dia_matvec_numpy(data_np, A.offsets, x_np.astype(np.float64))
    rel = np.linalg.norm(np.asarray(y) - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-5, f"SpMV verify failed: rel={rel}"

    iters = 100

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, iters, lambda i, v: spmv(A, v) * 0.08, x)

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
