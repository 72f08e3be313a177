"""Domain decomposition: graph partitioning + Schur-complement solve.

Parity with the reference's `-np` path (SURVEY.md §2.5): METIS node
partition (partition3.cpp:63-160; here graph-growing/RCM-block partition,
pymetis used when present), bordered-block-diagonal permutation
(partition4's pinv/q), ``dd_form`` splitting into per-part interiors
As[k], couplings E[k]/F[k] and interface At (form_dd.cpp:32), and
``dd_solve`` building S = At − Σ F_k As_k⁻¹ E_k column-by-column with
per-part sparse LU, solving the interface system, then back-substituting
(solve_dd.cpp:179-300). The out-of-core variant (dd_solve_ooc,
solve_dd.cpp:631 + dd_save_load.cpp) spills per-part blocks to disk.

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
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import rcm_ordering
from gmres_tpu.solvers.direct import SparseLU

__all__ = [
    "partition_graph", "DDForm", "dd_form", "dd_solve", "DDSolver",
    "save_matrix", "load_matrix",
]


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
    At: np.ndarray          # interface x interface (dense; small)
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
    interface = np.zeros(n, dtype=bool)
    for i in range(n):
        nbrs = pattern.indices[pattern.indptr[i]:pattern.indptr[i + 1]]
        if np.any(part[nbrs] != part[i]):
            interface[i] = True
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
    At = Sp[pos:, pos:].toarray()
    return DDForm(As=As, E=E, F=F, At=At, perm=perm, part_slices=slices,
                  n_interface=ni)


class DDSolver:
    """Factor once, solve many right-hand sides (the reusable role of the
    reference's saved numeric factors, dd_save_load.cpp)."""

    def __init__(self, form: DDForm, workers: int = 0,
                 out_of_core: bool = False, workdir: Optional[str] = None):
        self.form = form
        self.workers = workers
        self.out_of_core = out_of_core
        self._workdir = workdir or (tempfile.mkdtemp(prefix="gt_dd_")
                                    if out_of_core else None)
        nparts = len(form.As)
        ni = form.At.shape[0]

        def build_schur(k):
            lu = SparseLU(form.As[k])
            Ek = form.E[k].toarray()
            if Ek.size:
                AiE = np.column_stack([lu.solve(Ek[:, j])
                                       for j in range(Ek.shape[1])])
                contrib = form.F[k] @ AiE
            else:
                AiE = np.zeros((form.As[k].shape[0], ni))
                contrib = np.zeros_like(form.At)
            return contrib, lu, AiE

        if workers and workers > 1:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                results = list(ex.map(build_schur, range(nparts)))
        else:
            results = [build_schur(k) for k in range(nparts)]

        S = form.At.copy()
        self._lus: List[SparseLU] = []
        self._AiE: dict = {}
        for k, (contrib, lu, AiE) in enumerate(results):
            S -= contrib
            self._lus.append(lu)
            if out_of_core:
                np.save(os.path.join(self._workdir, f"AiE_{k}.npy"), AiE)
            else:
                self._AiE[k] = AiE
        import scipy.linalg as sla

        self._schur = sla.lu_factor(S) if S.size else None

    def solve(self, b: np.ndarray) -> np.ndarray:
        import scipy.linalg as sla

        form = self.form
        bp = np.asarray(b, dtype=np.float64)[form.perm]
        pos = form.part_slices[-1].stop if form.part_slices else 0
        g = bp[pos:].copy()
        interior_sol = []
        for k, sl in enumerate(form.part_slices):
            fk = bp[sl]
            yk = self._lus[k].solve(fk) if fk.size else fk
            interior_sol.append(yk)
            if fk.size and form.F[k].shape[0]:
                g -= form.F[k] @ yk
        xt = sla.lu_solve(self._schur, g) if self._schur is not None else g
        xp = np.empty_like(bp)
        xp[pos:] = xt
        for k, sl in enumerate(form.part_slices):
            if interior_sol[k].size:
                if self.out_of_core:
                    AiE = np.load(os.path.join(self._workdir, f"AiE_{k}.npy"))
                else:
                    AiE = self._AiE[k]
                corr = AiE @ xt if AiE is not None and AiE.size else 0.0
                xp[sl] = interior_sol[k] - corr
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
