"""Isolate fixed overhead on small SpMVs: empty chain vs small-DIA chain."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_pg_mna, bench_chain  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from gmres_tpu.ops.formats import CSRMatrix  # noqa: E402
from gmres_tpu.ops.spmv import spmv  # noqa: E402
from gmres_tpu.ops.well import to_hybrid  # noqa: E402

An = build_pg_mna(rcm=False)
H = to_hybrid(CSRMatrix.from_scipy(An), dtype=jnp.float32)
D = H.dia
n = D.shape[1]
x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

dt0 = bench_chain(jax, lambda v: v, x)
print(f"empty chain        : {dt0*1e6:8.2f} us/iter")

dt1 = bench_chain(jax, lambda v: spmv(D, v), x)
print(f"small DIA (n={n}): {dt1*1e6:8.2f} us/iter  "
      f"({int(np.count_nonzero(np.asarray(D.data)))/dt1/1e9:.2f} Gnnz/s)")

# raw XLA shifted-multiply formulation, hand-written
data = D.data
offs = D.offsets
def manual(v):
    y = jnp.zeros_like(v)
    for d, off in enumerate(offs):
        y = y + data[d] * jnp.roll(v, -off)
    return y
dt2 = bench_chain(jax, manual, x)
print(f"manual roll DIA    : {dt2*1e6:8.2f} us/iter")

def manual_slice(v):
    # pad + static slice instead of roll
    m = max(abs(o) for o in offs)
    vp = jnp.pad(v, (m, m))
    y = jnp.zeros_like(v)
    for d, off in enumerate(offs):
        y = y + data[d] * lax.dynamic_slice(vp, (m + off,), (n,))
    return y
dt3 = bench_chain(jax, manual_slice, x)
print(f"manual slice DIA   : {dt3*1e6:8.2f} us/iter")

# what does the current spmv dispatch do for DIA?
from gmres_tpu.ops import spmv as spmod
print("routing env GMRES_TPU_PALLAS:", __import__("os").environ.get("GMRES_TPU_PALLAS"))
jaxpr = jax.make_jaxpr(lambda v: spmv(D, v))(x)
s = str(jaxpr)
print("jaxpr ops:", {w for w in ("roll", "pallas_call", "gather",
      "dynamic_slice", "concatenate", "rev") if w in s})
