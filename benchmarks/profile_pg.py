"""Micro-profile of the PG general-sparsity SpMV paths on the real TPU.

Times each component of the hybrid (DIA part, slab/COO remainder) plus the
raw slab kernel on the RCM ordering, to locate where the nnz/s go.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_pg_mna, bench_chain  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gmres_tpu.ops.formats import CSRMatrix  # noqa: E402
from gmres_tpu.ops.spmv import spmv, device_matrix  # noqa: E402
from gmres_tpu.ops.well import to_well, to_well_slab, to_hybrid  # noqa: E402


def run(name, Ac, dev, nnz=None):
    nw = dev.shape[1]
    xw = np.zeros(nw, np.float32)
    xw[: Ac.shape[0]] = np.random.default_rng(1).standard_normal(Ac.shape[0])
    xj = jnp.asarray(xw)
    y = jax.jit(lambda v: spmv(dev, v))(xj)
    yref = Ac.astype(np.float64) @ xw[: Ac.shape[0]].astype(np.float64)
    rel = (np.linalg.norm(np.asarray(y)[: Ac.shape[0]] - yref)
           / np.linalg.norm(yref))
    dt = bench_chain(jax, lambda v: spmv(dev, v), xj)
    nnz = nnz if nnz is not None else Ac.nnz
    print(f"{name:28s} rel={rel:.2e}  dt={dt*1e6:8.1f} us  "
          f"{nnz/dt/1e9:7.2f} Gnnz/s  ({type(dev).__name__})")
    return dt


An = build_pg_mna(rcm=False)
Acsr = CSRMatrix.from_scipy(An)
H = to_hybrid(Acsr, dtype=jnp.float32)
print(f"natural PG: n={An.shape[0]} nnz={An.nnz}")
if H is not None:
    ndia = int(sum(np.count_nonzero(np.asarray(r)) for r in H.dia.data))
    print(f"hybrid: dia diags={len(H.dia.offsets)} dia_nnz={ndia} "
          f"rest={type(H.rest).__name__} rest_nnz={An.nnz - ndia}")
    run("hybrid (total)", An, H)
    # DIA part alone
    import scipy.sparse as sp
    Z = sp.csr_matrix(An.shape)
    t0 = time.perf_counter()
    xw = np.zeros(H.shape[1], np.float32)
    xj = jnp.asarray(xw)
    dt_dia = bench_chain(jax, lambda v: spmv(H.dia, v), xj)
    dt_rest = bench_chain(jax, lambda v: spmv(H.rest, v), xj)
    print(f"  dia part alone: {dt_dia*1e6:8.1f} us   "
          f"rest part alone: {dt_rest*1e6:8.1f} us")
else:
    print("to_hybrid returned None")

Ab = build_pg_mna(rcm=True)
Bcsr = CSRMatrix.from_scipy(Ab)
W = to_well_slab(Bcsr, dtype=jnp.float32)
if W is not None:
    print(f"slab: ngroups={W.ngroups} steps={W.steps} slab={W.slab} "
          f"spill={W.spill_nnz}")
    run("RCM slab kernel", Ab, W)
V1 = to_well(Bcsr, dtype=jnp.float32)
if V1 is not None:
    run("RCM well v1 kernel", Ab, V1)
