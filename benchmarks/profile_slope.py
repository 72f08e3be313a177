"""Slope-based timing: time chain(n1) and chain(n2); slope removes the
fixed per-call tunnel cost (~24 ms round-trip on the axon relay)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_pg_mna, build_dia_laplacian3d  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from gmres_tpu.ops.formats import CSRMatrix  # noqa: E402
from gmres_tpu.ops.spmv import spmv  # noqa: E402
from gmres_tpu.ops.well import to_hybrid  # noqa: E402


def chain_time(fn, x, iters, reps=3):
    @jax.jit
    def chain(v, it):
        return lax.fori_loop(0, it, lambda i, u: fn(u) * 0.08, v)

    _ = float(jnp.sum(chain(x, iters)))
    best = np.inf
    for _r in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(chain(x, iters)))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, x, n1=20, n2=520):
    t1 = chain_time(fn, x, n1)
    t2 = chain_time(fn, x, n2)
    return (t2 - t1) / (n2 - n1), t1, t2


# fixed cost
x = jnp.asarray(np.random.default_rng(0).standard_normal(100352).astype(np.float32))
dt, t1, t2 = slope(lambda v: v, x)
print(f"empty     : {dt*1e6:8.2f} us/iter   (t20={t1*1e3:.1f} ms, t520={t2*1e3:.1f} ms)")

# small DIA
An = build_pg_mna(rcm=False)
H = to_hybrid(CSRMatrix.from_scipy(An), dtype=jnp.float32)
dt, t1, t2 = slope(lambda v: spmv(H.dia, v), x)
nnz_d = int(sum(np.count_nonzero(np.asarray(r)) for r in H.dia.data))
print(f"small DIA : {dt*1e6:8.2f} us/iter = {nnz_d/dt/1e9:7.2f} Gnnz/s")
dt, t1, t2 = slope(lambda v: spmv(H.rest, v), x)
print(f"rest(v1)  : {dt*1e6:8.2f} us/iter = {(An.nnz-nnz_d)/dt/1e9:7.2f} Gnnz/s "
      f"({type(H.rest).__name__}, nnz={An.nnz-nnz_d})")
dt, t1, t2 = slope(lambda v: spmv(H, v), x)
print(f"hybrid    : {dt*1e6:8.2f} us/iter = {An.nnz/dt/1e9:7.2f} Gnnz/s")

# large DIA flagship
A, data_np, nnz = build_dia_laplacian3d(128)
xl = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]).astype(np.float32))
dt, t1, t2 = slope(lambda v: spmv(A, v), xl, 20, 270)
print(f"large DIA : {dt*1e6:8.2f} us/iter = {nnz/dt/1e9:7.2f} Gnnz/s  "
      f"(HBM floor ~{(nnz*4 + 2*A.shape[0]*4)/819e9*1e6:.0f} us)")
