"""Row partitioning for multi-chip GMRES.

Replaces the reference's METIS/Schur domain decomposition (partition3.cpp,
form_dd.cpp, solve_dd.cpp) with the TPU-native scheme: RCM reordering for
locality (bandwidth reduction — the static version of the SpMV inspector),
then balanced contiguous row blocks, one per device. Interface unknowns and
Schur complements disappear: coupling is handled by gathering the Krylov
vector, and reductions ride ICI psum.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix, EllMatrix, round_up
from gmres_tpu.ops.reorder import rcm_ordering

__all__ = ["RowPartition", "partition_rows"]


@dataclasses.dataclass(frozen=True)
class RowPartition:
    """Bookkeeping mapping the logical problem (size n, original ordering)
    to the padded, permuted, device-sharded layout (size n_padded)."""

    n: int
    n_padded: int
    ndev: int
    perm: Optional[np.ndarray]  # new_index -> old_index; None = natural

    @property
    def rows_per_dev(self) -> int:
        return self.n_padded // self.ndev

    def pad_permute(self, v: np.ndarray) -> np.ndarray:
        v = np.asarray(v)
        if self.perm is not None:
            v = v[self.perm]
        out = np.zeros((self.n_padded,) + v.shape[1:], dtype=v.dtype)
        out[: self.n] = v
        return out

    def unpad_unpermute(self, v) -> np.ndarray:
        v = np.asarray(v)[: self.n]
        if self.perm is None:
            return v
        out = np.empty_like(v)
        out[self.perm] = v
        return out


def partition_rows(
    A: CSRMatrix,
    ndev: int,
    reorder: bool = True,
    dtype=jnp.float32,
    row_align: int = 8,
) -> Tuple[RowPartition, EllMatrix, CSRMatrix]:
    """Returns (partition, padded ELL with global column ids, permuted host
    CSR for preconditioner setup). Padding rows are all-zero; the padded
    system keeps zero residual on them, so convergence is untouched."""
    n = A.shape[0]
    perm = rcm_ordering(A) if reorder else None
    Ap = A.permute(perm) if perm is not None else A
    n_padded = round_up(n, ndev * row_align)
    ell = Ap.to_ell(dtype=dtype, row_pad=1)
    # re-pad rows up to n_padded
    r, k = ell.data.shape
    if r < n_padded:
        pad = n_padded - r
        data = jnp.concatenate([ell.data, jnp.zeros((pad, k), ell.data.dtype)])
        cols = jnp.concatenate([ell.cols, jnp.zeros((pad, k), ell.cols.dtype)])
    else:
        data, cols = ell.data[:n_padded], ell.cols[:n_padded]
    ell_p = EllMatrix(data=data, cols=cols, shape=(n_padded, n_padded))
    return RowPartition(n=n, n_padded=n_padded, ndev=ndev, perm=perm), ell_p, Ap
