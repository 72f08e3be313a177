"""Domain decomposition: graph partitioning + Schur-complement solve.

Parity with the reference's `-np` path (SURVEY.md §2.5): METIS node
partition (partition3.cpp:63-160; here graph-growing/RCM-block partition,
pymetis used when present), bordered-block-diagonal permutation
(partition4's pinv/q), ``dd_form`` splitting into per-part interiors
As[k], couplings E[k]/F[k] and interface At (form_dd.cpp:32), and
``dd_solve`` building S = At − Σ F_k As_k⁻¹ E_k with per-part sparse LU,
solving the interface system, then back-substituting
(solve_dd.cpp:179-300).

The Schur complement is assembled and solved **sparse**, like the
reference's column-by-column sparse S (solve_dd.cpp:179-300): part k only
touches the interface nodes on its own boundary, so its contribution is a
dense |∂k|×|∂k| block scattered into a COO accumulator — never an
(ni × ni) dense matrix. The E-column solves are batched through one
SuperLU multi-RHS call per column block instead of one `solve` per column.
Back-substitution re-solves As_k x_k = f_k − E_k x_t directly, so the
(interior × ni) AiE blocks are never stored at all.

Out-of-core (`dd_solve_ooc`, solve_dd.cpp:631 + dd_save_load.cpp:8-40)
persists the per-part *numeric LU factors* (L/U/perm as npz) and reloads
them per solve, holding at most one part's factorization in memory.

Unlike the reference (sequential over parts in-process), part solves fan
out over a thread pool. On TPU the *primary* scaling path is the
row-partitioned distributed GMRES (dist_gmres.py); DD remains for direct
solves of the ETBR frequency samples on very large grids.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import rcm_ordering
from gmres_tpu.solvers.direct import SparseLU

__all__ = [
    "partition_graph", "DDForm", "dd_form", "dd_solve", "DDSolver",
    "save_matrix", "load_matrix", "save_lu_factors", "load_lu_factors",
    "FactorSolver",
]

# column-block width for the batched As_k⁻¹ E_k solves: SuperLU's multi-RHS
# dgstrs amortizes the symbolic traversal; 256 columns of a 500K/16-part
# interior is a ~60 MB dense RHS block — one call per part on typical
# boundary sizes while staying far from memory pressure.
_SCHUR_COL_BLOCK = 256


def partition_graph(A: CSRMatrix, nparts: int) -> np.ndarray:
    """Node -> part assignment. Uses pymetis when installed (the reference's
    METIS_PartGraphRecursive), else RCM + contiguous blocks (low edge cut on
    mesh-like PG/thermal graphs)."""
    n = A.shape[0]
    if nparts <= 1:
        return np.zeros(n, dtype=np.int32)
    S = A.to_scipy()
    pattern = ((S != 0) + (S.T != 0)).tocsr()
    try:
        import pymetis  # noqa: F401

        adj = [pattern.indices[pattern.indptr[i]:pattern.indptr[i + 1]]
               for i in range(n)]
        _, membership = pymetis.part_graph(nparts, adjacency=adj)
        return np.asarray(membership, dtype=np.int32)
    except ImportError:
        pass
    perm = rcm_ordering(A)
    part = np.empty(n, dtype=np.int32)
    bounds = np.linspace(0, n, nparts + 1).astype(np.int64)
    for k in range(nparts):
        part[perm[bounds[k]:bounds[k + 1]]] = k
    return part


@dataclasses.dataclass
class DDForm:
    """Bordered-block-diagonal split of a permuted matrix."""

    As: List[CSRMatrix]     # per-part interior blocks
    E: List[sp.csr_matrix]  # interior x interface couplings
    F: List[sp.csr_matrix]  # interface x interior couplings
    At: sp.csr_matrix       # interface x interface (sparse)
    perm: np.ndarray        # new -> old index
    part_slices: List[slice]
    n_interface: int

    @property
    def n(self) -> int:
        return len(self.perm)


def dd_form(A: CSRMatrix, part: np.ndarray) -> DDForm:
    """Classify nodes into per-part interiors and the shared interface, build
    the permutation [interior_0 | interior_1 | ... | interface], and split."""
    n = A.shape[0]
    S = A.to_scipy()
    pattern = ((S != 0) + (S.T != 0)).tocsr()
    nparts = int(part.max()) + 1
    # a node is interface iff any neighbor lives in a different part
    # (vectorized: compare each nnz's row/col part ids)
    coo = pattern.tocoo()
    interface = np.zeros(n, dtype=bool)
    cross = part[coo.row] != part[coo.col]
    interface[coo.row[cross]] = True
    order = []
    slices = []
    pos = 0
    for k in range(nparts):
        idx = np.nonzero((part == k) & ~interface)[0]
        order.append(idx)
        slices.append(slice(pos, pos + len(idx)))
        pos += len(idx)
    iface_idx = np.nonzero(interface)[0]
    order.append(iface_idx)
    perm = np.concatenate(order)
    ni = len(iface_idx)
    Sp = S[perm][:, perm].tocsr()
    As, E, F = [], [], []
    for k in range(nparts):
        sl = slices[k]
        As.append(CSRMatrix.from_scipy(Sp[sl, sl]))
        E.append(Sp[sl, pos:].tocsr())
        F.append(Sp[pos:, sl].tocsr())
    At = Sp[pos:, pos:].tocsr()
    return DDForm(As=As, E=E, F=F, At=At, perm=perm, part_slices=slices,
                  n_interface=ni)


# ---------------------------------------------------------------------------
# numeric LU factor persistence (dd_save_load.cpp:8-40 role)
# ---------------------------------------------------------------------------

def save_lu_factors(path: str, lu) -> None:
    """Persist a SuperLU factorization's numeric factors (L, U, row/col
    perms) — the binary factor dump of dd_save_load.cpp:8-40."""
    L = lu.L.tocsc()
    U = lu.U.tocsc()
    np.savez(
        path,
        L_indptr=L.indptr, L_indices=L.indices, L_data=L.data,
        U_indptr=U.indptr, U_indices=U.indices, U_data=U.data,
        perm_r=lu.perm_r, perm_c=lu.perm_c, n=np.asarray(L.shape[0]),
    )


class FactorSolver:
    """Solve with reloaded numeric LU factors: x = Pc (U \\ (L \\ Pr b)).
    Mirrors SuperLU's Pr A Pc = L U convention."""

    def __init__(self, L: sp.csc_matrix, U: sp.csc_matrix,
                 perm_r: np.ndarray, perm_c: np.ndarray):
        self.L, self.U = L.tocsr(), U.tocsr()
        self.perm_r, self.perm_c = perm_r, perm_c

    def solve(self, b: np.ndarray) -> np.ndarray:
        from scipy.sparse.linalg import spsolve_triangular

        b = np.asarray(b, dtype=np.float64)
        bp = np.empty_like(b)
        bp[self.perm_r] = b                  # apply Pr (scatter)
        y = spsolve_triangular(self.L, bp, lower=True)
        z = spsolve_triangular(self.U, y, lower=False)
        return z[self.perm_c]                # apply Pc (gather)


def load_lu_factors(path: str) -> FactorSolver:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    n = int(z["n"])
    L = sp.csc_matrix((z["L_data"], z["L_indices"], z["L_indptr"]), (n, n))
    U = sp.csc_matrix((z["U_data"], z["U_indices"], z["U_indptr"]), (n, n))
    return FactorSolver(L, U, z["perm_r"], z["perm_c"])


class DDSolver:
    """Factor once, solve many right-hand sides (the reusable role of the
    reference's saved numeric factors, dd_save_load.cpp).

    Memory: the Schur complement is sparse (COO-accumulated per-part
    boundary blocks); no (interior × ni) AiE is ever formed — back-
    substitution performs a second interior solve per part instead. With
    ``out_of_core`` the per-part LU factors live on disk between solves.
    """

    def __init__(self, form: DDForm, workers: int = 0,
                 out_of_core: bool = False, workdir: Optional[str] = None):
        self.form = form
        self.workers = workers
        self.out_of_core = out_of_core
        self._workdir = workdir or (tempfile.mkdtemp(prefix="gt_dd_")
                                    if out_of_core else None)
        nparts = len(form.As)
        ni = form.n_interface

        def build_schur(k):
            """LU-factor part k and form its (sparse) Schur contribution
            F_k As_k⁻¹ E_k restricted to the part's boundary footprint."""
            lu = SparseLU(form.As[k])
            Ek, Fk = form.E[k], form.F[k]
            rows_i = np.unique(Fk.tocoo().row)        # boundary rows of S
            cols_j = np.unique(Ek.tocoo().col)        # boundary cols of S
            if rows_i.size == 0 or cols_j.size == 0:
                return lu, (np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0))
            Fi = Fk[rows_i, :]                         # (|∂k|, n_k) sparse
            blocks = []
            for j0 in range(0, cols_j.size, _SCHUR_COL_BLOCK):
                jb = cols_j[j0:j0 + _SCHUR_COL_BLOCK]
                Eb = np.asarray(Ek[:, jb].todense())   # (n_k, blk) dense
                Xb = lu._lu.solve(Eb)                  # batched multi-RHS
                blocks.append(Fi @ Xb)                 # (|∂k|, blk) dense
            C = np.concatenate(blocks, axis=1)         # (|∂k|, |∂k_cols|)
            rr = np.repeat(rows_i, cols_j.size)
            cc = np.tile(cols_j, rows_i.size)
            return lu, (rr, cc, C.ravel())

        if workers and workers > 1:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                results = list(ex.map(build_schur, range(nparts)))
        else:
            results = [build_schur(k) for k in range(nparts)]

        rr_all, cc_all, vv_all = [], [], []
        self._lu_paths: List[Optional[str]] = []
        self._lus: List[Optional[SparseLU]] = []
        for k, (lu, (rr, cc, vv)) in enumerate(results):
            rr_all.append(rr)
            cc_all.append(cc)
            vv_all.append(vv)
            if out_of_core:
                path = os.path.join(self._workdir, f"lu_{k}.npz")
                save_lu_factors(path, lu._lu)
                self._lu_paths.append(path)
                self._lus.append(None)                 # reloaded per solve
            else:
                self._lu_paths.append(None)
                self._lus.append(lu)

        if ni:
            contrib = sp.coo_matrix(
                (np.concatenate(vv_all),
                 (np.concatenate(rr_all), np.concatenate(cc_all))),
                shape=(ni, ni),
            ).tocsr()
            S = (form.At - contrib).tocsc()
            import scipy.sparse.linalg as spla

            self._schur = spla.splu(S)
        else:
            self._schur = None

    def _part_solver(self, k):
        if self._lus[k] is not None:
            return self._lus[k]
        return load_lu_factors(self._lu_paths[k])

    def solve(self, b: np.ndarray) -> np.ndarray:
        form = self.form
        bp = np.asarray(b, dtype=np.float64)[form.perm]
        pos = form.part_slices[-1].stop if form.part_slices else 0
        g = bp[pos:].copy()
        for k, sl in enumerate(form.part_slices):
            fk = bp[sl]
            if fk.size and form.F[k].nnz:
                g -= form.F[k] @ self._part_solver(k).solve(fk)
        xt = self._schur.solve(g) if self._schur is not None else g
        xp = np.empty_like(bp)
        xp[pos:] = xt
        for k, sl in enumerate(form.part_slices):
            fk = bp[sl]
            if fk.size:
                rhs = fk - (form.E[k] @ xt if form.E[k].nnz else 0.0)
                xp[sl] = self._part_solver(k).solve(rhs)
        x = np.empty_like(xp)
        x[form.perm] = xp
        return x


def dd_solve(A: CSRMatrix, b: np.ndarray, nparts: int,
             workers: int = 0, out_of_core: bool = False) -> np.ndarray:
    part = partition_graph(A, nparts)
    form = dd_form(A, part)
    return DDSolver(form, workers=workers, out_of_core=out_of_core).solve(b)


# ---------------------------------------------------------------------------
# binary save/load of CSR matrices (dd_save_load.cpp:8-40 role)
# ---------------------------------------------------------------------------

def save_matrix(path: str, A: CSRMatrix) -> None:
    np.savez(path, indptr=A.indptr, indices=A.indices, data=A.data,
             shape=np.asarray(A.shape))


def load_matrix(path: str) -> CSRMatrix:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    return CSRMatrix(z["indptr"], z["indices"], z["data"],
                     tuple(z["shape"]))
