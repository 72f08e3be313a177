"""Sparse triangular solves on TPU.

Sequential substitution is the worst-case op for a vector machine; the
reference parallelizes it by *level scheduling* (dependency levels of
columns, leftILU.cu:339-368; getLevel, gmres.cu:1033-1077) and we take the
same idea in-graph: rows grouped by dependency level, one masked
gather-multiply-reduce per level (``lax.fori_loop`` over levels, padded to
static shapes).

An approximate alternative (``sweeps=k``) applies k Jacobi sweeps
x <- D^{-1}(b - R x) — the strict part R rides whatever SpMV format is
fastest for the backend (DIA/WELL on TPU), so each sweep is one fast SpMV
instead of a level chain; the standard trick for ILU applies on wide-vector
hardware.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import lower_levels, upper_levels

__all__ = ["LevelTriSolve", "tri_solve_levels", "JacobiTriSolve",
           "tri_solve_sweeps"]


def _strict_csr(T: CSRMatrix, lower: bool) -> CSRMatrix:
    s = T.to_scipy()
    R = sp.tril(s, k=-1) if lower else sp.triu(s, k=1)
    return CSRMatrix.from_scipy(R.tocsr())


def _diag_inv(T: CSRMatrix, unit_diag: bool) -> np.ndarray:
    if unit_diag:
        return np.ones(T.shape[0])
    d = T.diagonal()
    return 1.0 / np.where(np.abs(d) > 0, d, 1.0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ell_data", "ell_cols", "inv_diag", "level_rows"],
    meta_fields=["n", "num_levels"],
)
@dataclasses.dataclass(frozen=True)
class LevelTriSolve:
    """Level-scheduled solve of T x = b for triangular T.

    ``ell_data``/``ell_cols``: strict part of T in padded ELL (padding slots
    carry col 0 / val 0). ``level_rows``: (num_levels, width) row ids per
    level, padded with n (dropped on scatter)."""

    ell_data: jax.Array    # (R>=n, K)
    ell_cols: jax.Array    # (R>=n, K) int32
    inv_diag: jax.Array    # (n,)
    level_rows: jax.Array  # (L, W) int32
    n: int
    num_levels: int

    def __call__(self, b: jax.Array) -> jax.Array:
        n = self.n
        x = jnp.zeros(n, dtype=b.dtype)
        data = self.ell_data
        cols = self.ell_cols

        def level_step(l, x):
            rows = self.level_rows[l]                            # (W,)
            rdat = jnp.take(data, rows, axis=0, fill_value=0.0)  # (W, K)
            rcol = jnp.take(cols, rows, axis=0, fill_value=0)    # (W, K)
            acc = jnp.sum(rdat * jnp.take(x, rcol, axis=0, fill_value=0.0),
                          axis=1)
            xi = (jnp.take(b, rows, fill_value=0.0) - acc) * jnp.take(
                self.inv_diag, rows, fill_value=0.0
            )
            return x.at[rows].set(xi, mode="drop")

        return lax.fori_loop(0, self.num_levels, level_step, x)


def tri_solve_levels(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                     unit_diag: bool = False) -> LevelTriSolve:
    """Build a level-scheduled solver for triangular CSR T."""
    n = T.shape[0]
    try:
        from gmres_tpu.native import levels_native

        levels = levels_native(T, lower)
        if levels is None:
            raise ImportError
    except ImportError:
        levels = lower_levels(T) if lower else upper_levels(T)
    num_levels = int(levels.max()) + 1 if n else 1
    counts = np.bincount(levels, minlength=num_levels)
    width = int(counts.max()) if n else 1
    # fill level_rows (num_levels, width) with n-sentinel, vectorized
    order = np.argsort(levels, kind="stable")
    level_rows = np.full((num_levels, width), n, dtype=np.int32)
    offs = np.concatenate([[0], np.cumsum(counts)])
    for l in range(num_levels):
        rows_l = order[offs[l]:offs[l + 1]]
        level_rows[l, : len(rows_l)] = rows_l
    strict = _strict_csr(T, lower).to_ell(dtype=dtype, row_pad=1)
    return LevelTriSolve(
        ell_data=strict.data,
        ell_cols=strict.cols,
        inv_diag=jnp.asarray(_diag_inv(T, unit_diag), dtype=dtype),
        level_rows=jnp.asarray(level_rows),
        n=n,
        num_levels=num_levels,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["R", "inv_diag"],
    meta_fields=["sweeps"],
)
@dataclasses.dataclass(frozen=True)
class JacobiTriSolve:
    """Approximate triangular solve by ``sweeps`` Jacobi iterations:
    x <- D^{-1}(b - R x). Exact after n sweeps; a handful suffices as a
    preconditioner apply. R is any device SpMV format/operator."""

    R: object
    inv_diag: jax.Array
    sweeps: int

    def __call__(self, b: jax.Array) -> jax.Array:
        from gmres_tpu.ops.operator import as_operator

        n = self.inv_diag.shape[0]
        Rop = as_operator(self.R, logical_shape=(n, n))
        invd = self.inv_diag

        def sweep(_, x):
            return (b - Rop(x)) * invd

        return lax.fori_loop(0, self.sweeps, sweep, b * invd)


def tri_solve_sweeps(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                     unit_diag: bool = False, sweeps: int = 6,
                     fmt: str = "auto") -> JacobiTriSolve:
    strict = _strict_csr(T, lower)
    if fmt == "auto":
        from gmres_tpu.ops.spmv import device_matrix

        R = device_matrix(strict, dtype=dtype)
    else:
        R = strict.to_ell(dtype=dtype)
    return JacobiTriSolve(
        R=R,
        inv_diag=jnp.asarray(_diag_inv(T, unit_diag), dtype=dtype),
        sweeps=sweeps,
    )
