"""ILU(0) / ILU(k) preconditioners.

Host factorization (NumPy reference implementation; the native C++ fast path
in ``native/`` replaces it at scale), device apply via level-scheduled or
Jacobi-sweep triangular solves (trisolve.py).

Covers MyILU0 (preconditioner.cu:205-362, factorization leftILU.cu:27-337)
and MyILUK (iluk.cpp:56, fill level lfil=10 default, preconditioner.cu:1659-1677).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond.trisolve import (
    JacobiTriSolve,
    LevelTriSolve,
    tri_solve_auto,
    tri_solve_levels,
    tri_solve_sweeps,
)

__all__ = ["IluPrecond", "ilu0", "iluk", "ilu0_factor", "iluk_factor"]


def _csr_rows(A: CSRMatrix):
    for i in range(A.shape[0]):
        s, e = A.indptr[i], A.indptr[i + 1]
        yield i, A.indices[s:e], A.data[s:e]


def ilu0_factor(A: CSRMatrix) -> Tuple[CSRMatrix, CSRMatrix]:
    """ILU(0): incomplete LU on the sparsity pattern of A (IKJ ordering,
    no pivoting — same contract as leftILU.cu / rightLookingILU.h).

    Returns (L, U): L unit-lower (diagonal implicit, stored without it),
    U upper including diagonal. Zero/absent diagonals are replaced by 1
    (the tolerance of LUSolve_ignoreZero, SpMV_compute.cpp:92).
    """
    try:
        from gmres_tpu.native import ilu0_factor_native

        out = ilu0_factor_native(A)
        if out is not None:
            return out
    except ImportError:
        pass
    n = A.shape[0]
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int64)
    data = A.data.astype(np.float64).copy()
    # position lookup: row i, col j -> flat index
    colpos = [
        {int(indices[p]): p for p in range(indptr[i], indptr[i + 1])}
        for i in range(n)
    ]
    diag_pos = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        dp = colpos[i].get(i, -1)
        diag_pos[i] = dp
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            k = int(indices[p])
            if k >= i:
                break
            dpk = diag_pos[k]
            ukk = data[dpk] if dpk >= 0 else 1.0
            if ukk == 0.0:
                ukk = 1.0
            data[p] /= ukk
            lik = data[p]
            if lik == 0.0:
                continue
            row_k = colpos[k]
            for p2 in range((dpk + 1) if dpk >= 0 else indptr[k], indptr[k + 1]):
                j = int(indices[p2])
                if j <= k:
                    continue
                pij = colpos[i].get(j)
                if pij is not None:
                    data[pij] -= lik * data[p2]
    return _split_lu(n, indptr, indices, data)


def _split_lu(n, indptr, indices, data) -> Tuple[CSRMatrix, CSRMatrix]:
    Lr, Lc, Lv, Ur, Uc, Uv = [], [], [], [], [], []
    has_diag = np.zeros(n, dtype=bool)
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            j = int(indices[p])
            if j < i:
                Lr.append(i); Lc.append(j); Lv.append(data[p])
            else:
                if j == i:
                    has_diag[i] = True
                    v = data[p] if data[p] != 0.0 else 1.0
                else:
                    v = data[p]
                Ur.append(i); Uc.append(j); Uv.append(v)
    for i in np.nonzero(~has_diag)[0]:
        Ur.append(int(i)); Uc.append(int(i)); Uv.append(1.0)
    L = CSRMatrix.from_triplets(Lr, Lc, Lv, (n, n))
    U = CSRMatrix.from_triplets(Ur, Uc, Uv, (n, n))
    return L, U


def iluk_factor(A: CSRMatrix, fill_level: int = 2) -> Tuple[CSRMatrix, CSRMatrix]:
    """ILU(k): symbolic fill-level expansion then numeric factorization on
    the expanded pattern (the ilukC algorithm's contract, iluk.cpp:56)."""
    try:
        from gmres_tpu.native import iluk_factor_native

        out = iluk_factor_native(A, fill_level)
        if out is not None:
            return out
    except ImportError:
        pass
    n = A.shape[0]
    # symbolic: per-row dict col -> level
    rows_lev = []
    for i, cols, _ in _csr_rows(A):
        lev = {int(c): 0 for c in cols}
        lev[i] = 0
        # process existing lower entries in ascending column order,
        # merging fill from previously factored rows
        work = sorted(c for c in lev if c < i)
        wi = 0
        while wi < len(work):
            k = work[wi]
            wi += 1
            lev_ik = lev[k]
            if lev_ik > fill_level:
                continue
            for j, lev_kj in rows_lev[k].items():
                if j <= k:
                    continue
                newlev = lev_ik + lev_kj + 1
                if newlev <= fill_level and (j not in lev or lev[j] > newlev):
                    if j not in lev and j < i:
                        # keep 'work' sorted by inserting in order
                        import bisect

                        bisect.insort(work, j)
                    lev[j] = min(lev.get(j, newlev), newlev)
        rows_lev.append(lev)
    # build expanded pattern with A's values (0 for fill)
    rows, cols, vals = [], [], []
    for i, acols, avals in _csr_rows(A):
        aval = {int(c): v for c, v in zip(acols, avals)}
        for j in sorted(rows_lev[i]):
            rows.append(i)
            cols.append(j)
            vals.append(aval.get(j, 0.0))
    Ax = CSRMatrix.from_triplets(rows, cols, vals, (n, n))
    # re-insert explicit zeros that from_triplets may keep (scipy keeps
    # explicit zeros only if present; ensure via direct construction)
    if Ax.nnz != len(rows):
        import scipy.sparse as sp

        Ax = CSRMatrix.from_scipy(
            sp.csr_matrix((np.asarray(vals) + 0.0, (rows, cols)), shape=(n, n))
        )
    return ilu0_factor_dense_pattern(Ax)


def ilu0_factor_dense_pattern(A: CSRMatrix) -> Tuple[CSRMatrix, CSRMatrix]:
    """ILU(0) on a pattern that may contain explicit zeros (used by ILU(k))."""
    return _ilu0_core(A)


def _ilu0_core(A: CSRMatrix) -> Tuple[CSRMatrix, CSRMatrix]:
    n = A.shape[0]
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int64)
    data = A.data.astype(np.float64).copy()
    colpos = [
        {int(indices[p]): p for p in range(indptr[i], indptr[i + 1])}
        for i in range(n)
    ]
    diag_pos = np.array([colpos[i].get(i, -1) for i in range(n)], dtype=np.int64)
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            k = int(indices[p])
            if k >= i:
                break
            dpk = diag_pos[k]
            ukk = data[dpk] if dpk >= 0 else 1.0
            if ukk == 0.0:
                ukk = 1.0
            data[p] /= ukk
            lik = data[p]
            if lik == 0.0:
                continue
            for p2 in range((dpk + 1) if dpk >= 0 else indptr[k], indptr[k + 1]):
                j = int(indices[p2])
                if j <= k:
                    continue
                pij = colpos[i].get(j)
                if pij is not None:
                    data[pij] -= lik * data[p2]
    return _split_lu(n, indptr, indices, data)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lsolve", "usolve"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class IluPrecond:
    """Apply M^{-1} v = U^{-1} (L^{-1} v)."""

    lsolve: object  # LevelTriSolve | JacobiTriSolve
    usolve: object

    def __call__(self, v: jax.Array) -> jax.Array:
        return self.usolve(self.lsolve(v))


def _build(L: CSRMatrix, U: CSRMatrix, dtype, mode: str, sweeps: int) -> IluPrecond:
    if mode in ("levels", "auto"):
        # "levels" means level-scheduled; tri_solve_auto picks the dense or
        # the chunked layout by padding blowup (semantics identical, the
        # dense layout is watchdog-fatal on high-fill factors)
        ls = tri_solve_auto(L, lower=True, dtype=dtype, unit_diag=True)
        us = tri_solve_auto(U, lower=False, dtype=dtype)
    elif mode == "sweeps":
        ls = tri_solve_sweeps(L, lower=True, dtype=dtype, unit_diag=True, sweeps=sweeps)
        us = tri_solve_sweeps(U, lower=False, dtype=dtype, sweeps=sweeps)
    else:
        raise ValueError(f"unknown tri-solve mode {mode!r}")
    return IluPrecond(lsolve=ls, usolve=us)


def ilu0(A: CSRMatrix, dtype=jnp.float32, mode: str = "levels",
         sweeps: int = 8) -> IluPrecond:
    L, U = ilu0_factor(A)
    return _build(L, U, dtype, mode, sweeps)


def iluk(A: CSRMatrix, fill_level: int = 2, dtype=jnp.float32,
         mode: str = "levels", sweeps: int = 8) -> IluPrecond:
    L, U = iluk_factor(A, fill_level)
    return _build(L, U, dtype, mode, sweeps)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lsolve", "usolve", "row_gather", "col_gather"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class IlutpPrecond:
    """Threshold-ILU with partial pivoting (ILUTP): the strength class of
    the reference's ILU++ multilevel ILUCDP (MyILUPP, preconditioner.h:181-
    244; built at mna_solve_gpu_gmres.cpp:316-344 with threshold/MEM_FACTOR
    tuning). Factored on the host by SuperLU's incomplete mode
    (scipy.sparse.linalg.spilu: dual threshold drop + partial pivoting —
    the pivoting is what survives MNA saddle-point rows where level-based
    ILU(k) needs thousands of iterations; benchmarks/precond_strength.py).
    Device apply = permutation gathers + two level-scheduled (or Jacobi-
    sweep) triangular solves, exactly the MyILUPP apply shape
    (perm + tri-solves + perm, preconditioner.cu:962-1155):

        M^{-1} v = Pc (U^{-1} (L^{-1} (Pr v)))
    """

    lsolve: object
    usolve: object
    row_gather: jax.Array  # (n,) int32 — applies Pr
    col_gather: jax.Array  # (n,) int32 — applies Pc

    def __call__(self, v: jax.Array) -> jax.Array:
        z = self.lsolve(v[self.row_gather])
        return self.usolve(z)[self.col_gather]


def spilu_backoff(S, drop_tol: float = 1e-4, fill_factor: float = 10.0):
    """SuperLU incomplete factorization with threshold backoff.

    Aggressive dropping can produce an exactly singular incomplete factor
    (observed on transformed MNA at drop_tol=1e-4): retry tighter, like
    ILU++'s own threshold backoff (mna_solve_gpu_gmres.cpp:316-344 tunes
    threshold/MEM_FACTOR until the factorization succeeds)."""
    import scipy.sparse.linalg as spla

    err = None
    for k in range(3):
        try:
            return spla.spilu(S, drop_tol=drop_tol * 0.1 ** k,
                              fill_factor=fill_factor * 2 ** k)
        except RuntimeError as e:  # "Factor is exactly singular"
            err = e
    raise RuntimeError(
        f"ILUTP factorization singular down to drop_tol="
        f"{drop_tol * 0.01}: {err}")


def ilutp(A: CSRMatrix, drop_tol: float = 1e-4, fill_factor: float = 10.0,
          dtype=jnp.float32, mode: str = "levels",
          sweeps: int = 8) -> IlutpPrecond:
    """Build an ILUTP preconditioner (SuperLU spilu factorization)."""
    import numpy as np

    from gmres_tpu.ops.formats import CSRMatrix as _CSR

    S = A.to_scipy().tocsc()
    ilu = spilu_backoff(S, drop_tol, fill_factor)
    L = _CSR.from_scipy(ilu.L.tocsr())
    U = _CSR.from_scipy(ilu.U.tocsr())
    if mode in ("levels", "auto"):
        ls = tri_solve_auto(L, lower=True, dtype=dtype, unit_diag=True)
        us = tri_solve_auto(U, lower=False, dtype=dtype)
    elif mode == "sweeps":
        ls = tri_solve_sweeps(L, lower=True, dtype=dtype, unit_diag=True,
                              sweeps=sweeps)
        us = tri_solve_sweeps(U, lower=False, dtype=dtype, sweeps=sweeps)
    else:
        raise ValueError(f"unknown tri-solve mode {mode!r}")
    return IlutpPrecond(
        lsolve=ls,
        usolve=us,
        row_gather=jnp.asarray(np.argsort(ilu.perm_r), jnp.int32),
        col_gather=jnp.asarray(ilu.perm_c.astype(np.int32)),
    )
