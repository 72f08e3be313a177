"""Host-side graph orderings: bandwidth reduction and dependency levels.

TPU SpMV hates long-range gathers; reordering rows/cols so the column
footprint of each row tile is a narrow window is the static analogue of the
reference's runtime inspector (SpMV_inspect.cpp:38-457). Level scheduling
mirrors leftILU.cu:339-368 / gmres.cu:1033-1077 (getLevel) and drives the
level-parallel triangular solve.
"""

from __future__ import annotations

import numpy as np

from gmres_tpu.ops.formats import CSRMatrix

__all__ = ["rcm_ordering", "bandwidth", "lower_levels", "upper_levels"]


def rcm_ordering(A: CSRMatrix, symmetrize: bool = True) -> np.ndarray:
    """Reverse-Cuthill-McKee permutation (returns perm s.t. A[perm][:,perm]
    has reduced bandwidth)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    s = A.to_scipy()
    if symmetrize:
        s = s + s.T
    perm = reverse_cuthill_mckee(sp.csr_matrix(s), symmetric_mode=True)
    return np.asarray(perm, dtype=np.int64)


def bandwidth(A: CSRMatrix) -> int:
    lengths = A.row_lengths()
    rows = np.repeat(np.arange(A.shape[0]), lengths)
    if rows.size == 0:
        return 0
    return int(np.abs(A.indices.astype(np.int64) - rows).max())


def _levels_from_deps(n: int, indptr, indices, reverse: bool) -> np.ndarray:
    """level[i] = 1 + max(level[j] for j a strict dependency of row i).

    For a lower-triangular solve, row i depends on columns j < i; for upper,
    on columns j > i (processed in reverse row order).
    """
    level = np.zeros(n, dtype=np.int32)
    order = range(n - 1, -1, -1) if reverse else range(n)
    for i in order:
        deps = indices[indptr[i] : indptr[i + 1]]
        deps = deps[deps > i] if reverse else deps[deps < i]
        if deps.size:
            level[i] = level[deps].max() + 1
    return level


def lower_levels(L: CSRMatrix) -> np.ndarray:
    """Dependency level of each row for the forward solve L y = b."""
    return _levels_from_deps(L.shape[0], L.indptr, L.indices, reverse=False)


def upper_levels(U: CSRMatrix) -> np.ndarray:
    """Dependency level of each row for the backward solve U x = y."""
    return _levels_from_deps(U.shape[0], U.indptr, U.indices, reverse=True)
