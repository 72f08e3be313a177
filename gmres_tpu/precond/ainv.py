"""AINV approximate-inverse preconditioner (Benzi–Tůma biconjugation).

M^{-1} = Z D^{-1} W^T with Z, W unit upper triangular, built on the host by
two-sided biconjugation with drop tolerance; the device apply is **two SpMVs
and a diagonal scale** — no triangular solves, making this the natural TPU
preconditioner.

Covers MyAINV (preconditioner.cu:110-187, built via CUSP
``nonsym_bridson_ainv(A, 0.1)``; the reference's host apply is likewise two
SpMVs + a scale, preconditioner.cu:110-127; the TVLSI paper §V found AINV
the most robust of its preconditioners).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix, EllMatrix, to_device
from gmres_tpu.ops.spmv import ell_spmv

__all__ = ["AinvPrecond", "ainv", "ainv_factor"]


def ainv_factor(A: CSRMatrix, drop_tol: float = 0.1, max_col_nnz: int = 0,
                block_size: int = 0):
    """Nonsymmetric AINV biconjugation with relative drop tolerance.

    Returns (Z, Wt, inv_d): Z and W^T as host CSR, inv_d = 1/diag(D), such
    that M^{-1} = Z diag(inv_d) W^T approximates A^{-1}. ``max_col_nnz``
    bounds per-column fill (native path only): keeps the largest entries so
    setup stays O(n * cap * band) on big grids.

    ``block_size > 0`` switches to **block-Jacobi AINV**: contiguous
    diagonal blocks are biconjugated independently (in parallel threads —
    the ctypes call releases the GIL) and assembled block-diagonally.
    Biconjugation cost grows superlinearly with n, so blocking cuts setup
    by orders of magnitude at ~1M rows for a modest iteration-count hit;
    callers should RCM/band-order A first so coupling is local.
    """
    n = A.shape[0]
    if block_size and 0 < block_size < n:
        return _ainv_factor_blocked(A, drop_tol, max_col_nnz, block_size)
    try:
        from gmres_tpu.native import ainv_factor_native

        out = ainv_factor_native(A, drop_tol, max_col_nnz)
        if out is not None:
            return out
    except ImportError:
        pass
    n = A.shape[0]
    Acsr = A.to_scipy().astype(np.float64)
    Acsc = Acsr.tocsc()

    # Columns of Z and W as dicts {row: value}; inverted index row -> set of
    # column ids currently containing that row (to find nonzero dots fast).
    z_cols = [dict() for _ in range(n)]
    w_cols = [dict() for _ in range(n)]
    z_inv = [set() for _ in range(n)]
    w_inv = [set() for _ in range(n)]
    for j in range(n):
        z_cols[j][j] = 1.0
        w_cols[j][j] = 1.0
        z_inv[j].add(j)
        w_inv[j].add(j)
    d = np.zeros(n)

    indptrR, indicesR, dataR = Acsr.indptr, Acsr.indices, Acsr.data
    indptrC, indicesC, dataC = Acsc.indptr, Acsc.indices, Acsc.data

    for i in range(n):
        # p_j = (row i of A) . z_j for j >= i with nonzero overlap
        row_idx = indicesR[indptrR[i]:indptrR[i + 1]]
        row_val = dataR[indptrR[i]:indptrR[i + 1]]
        cand_p = set()
        for k in row_idx:
            cand_p.update(c for c in z_inv[k] if c >= i)
        p = {}
        for jcol in cand_p:
            zc = z_cols[jcol]
            s = 0.0
            for k, av in zip(row_idx, row_val):
                zv = zc.get(int(k))
                if zv is not None:
                    s += av * zv
            if s != 0.0:
                p[jcol] = s
        # q_j = (col i of A) . w_j
        col_idx = indicesC[indptrC[i]:indptrC[i + 1]]
        col_val = dataC[indptrC[i]:indptrC[i + 1]]
        cand_q = set()
        for k in col_idx:
            cand_q.update(c for c in w_inv[k] if c >= i)
        q = {}
        for jcol in cand_q:
            wc = w_cols[jcol]
            s = 0.0
            for k, av in zip(col_idx, col_val):
                wv = wc.get(int(k))
                if wv is not None:
                    s += av * wv
            if s != 0.0:
                q[jcol] = s

        pi = p.get(i, 0.0)
        if pi == 0.0:
            pi = 1.0  # breakdown guard (no pivoting, like the reference)
        d[i] = pi

        zi = z_cols[i]
        wi = w_cols[i]
        zi_norm = max(abs(v) for v in zi.values())
        wi_norm = max(abs(v) for v in wi.values())

        for jcol, pj in p.items():
            if jcol == i:
                continue
            alpha = pj / pi
            zc = z_cols[jcol]
            for r, zv in zi.items():
                newv = zc.get(r, 0.0) - alpha * zv
                if abs(newv) <= drop_tol * zi_norm:
                    if r in zc:
                        del zc[r]
                        z_inv[r].discard(jcol)
                else:
                    if r not in zc:
                        z_inv[r].add(jcol)
                    zc[r] = newv
        for jcol, qj in q.items():
            if jcol == i:
                continue
            alpha = qj / pi
            wc = w_cols[jcol]
            for r, wv in wi.items():
                newv = wc.get(r, 0.0) - alpha * wv
                if abs(newv) <= drop_tol * wi_norm:
                    if r in wc:
                        del wc[r]
                        w_inv[r].discard(jcol)
                else:
                    if r not in wc:
                        w_inv[r].add(jcol)
                    wc[r] = newv

    rows, cols, vals = [], [], []
    for j in range(n):
        for r, v in z_cols[j].items():
            rows.append(r); cols.append(j); vals.append(v)
    Z = CSRMatrix.from_triplets(rows, cols, vals, (n, n))
    rows, cols, vals = [], [], []
    for j in range(n):
        for r, v in w_cols[j].items():
            rows.append(j); cols.append(r); vals.append(v)  # transpose
    Wt = CSRMatrix.from_triplets(rows, cols, vals, (n, n))
    return Z, Wt, 1.0 / d


def _ainv_factor_blocked(A: CSRMatrix, drop_tol: float, max_col_nnz: int,
                         block_size: int):
    """Block-Jacobi AINV: independent biconjugation per diagonal block."""
    import scipy.sparse as sp
    from concurrent.futures import ThreadPoolExecutor

    n = A.shape[0]
    Asp = A.to_scipy().tocsr()
    starts = list(range(0, n, block_size))
    bounds = [(s, min(s + block_size, n)) for s in starts]

    def factor_block(se):
        s, e = se
        Ab = CSRMatrix.from_scipy(Asp[s:e, s:e].tocsr())
        return ainv_factor(Ab, drop_tol, max_col_nnz)

    workers = min(len(bounds), os.cpu_count() or 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        parts = list(pool.map(factor_block, bounds))

    Z = sp.block_diag([p[0].to_scipy() for p in parts], format="csr")
    Wt = sp.block_diag([p[1].to_scipy() for p in parts], format="csr")
    inv_d = np.concatenate([p[2] for p in parts])
    return CSRMatrix.from_scipy(Z), CSRMatrix.from_scipy(Wt), inv_d


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Z", "Wt", "inv_d"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class AinvPrecond:
    """M^{-1} v = Z (inv_d * (W^T v)) — two SpMVs + elementwise scale.

    Z/Wt may be any device sparse format (ELL on CPU, WELL/DIA on TPU —
    padding handled through the operator layer)."""

    Z: object
    Wt: object
    inv_d: jax.Array

    def __call__(self, v: jax.Array) -> jax.Array:
        from gmres_tpu.ops.operator import as_operator

        n = self.inv_d.shape[0]
        Zop = as_operator(self.Z, logical_shape=(n, n))
        Wtop = as_operator(self.Wt, logical_shape=(n, n))
        return Zop(self.inv_d * Wtop(v))


def ainv(A: CSRMatrix, drop_tol: float = 0.1, dtype=jnp.float32,
         fmt: str = "ell", max_col_nnz: int = 0,
         block_size: Optional[int] = None) -> AinvPrecond:
    """``fmt``: "ell" (portable; required by the distributed lift) or
    "auto" (backend-tuned: WELL/DIA on TPU).

    ``block_size``: None = auto (global AINV below 128K rows, block-Jacobi
    AINV with 64K blocks above — setup time, see ainv_factor); 0 = always
    global; >0 = explicit block size.
    """
    if block_size is None:
        block_size = 0 if A.shape[0] <= 131072 else 65536
    Z, Wt, inv_d = ainv_factor(A, drop_tol, max_col_nnz, block_size)
    if fmt == "auto":
        from gmres_tpu.ops.spmv import device_matrix

        Zd = device_matrix(Z, dtype=dtype)
        Wd = device_matrix(Wt, dtype=dtype)
    else:
        Zd = Z.to_ell(dtype=dtype)
        Wd = Wt.to_ell(dtype=dtype)
    return AinvPrecond(
        Z=Zd,
        Wt=Wd,
        inv_d=to_device(inv_d, dtype),
    )
