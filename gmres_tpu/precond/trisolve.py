"""Sparse triangular solves on TPU.

Sequential substitution is the worst-case op for a vector machine; the
reference parallelizes it by *level scheduling* (dependency levels of
columns, leftILU.cu:339-368; getLevel, gmres.cu:1033-1077) and we take the
same idea in-graph: rows grouped by dependency level, one masked
gather-multiply-reduce per level (``lax.fori_loop`` over levels, padded to
static shapes).

An approximate alternative (``sweeps=k``) applies k Jacobi sweeps
x <- D^{-1}(b - R x) instead — pure SpMVs, no level serialization; the
standard trick for ILU applies on wide-vector hardware.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gmres_tpu.ops.formats import CSRMatrix, round_up
from gmres_tpu.ops.reorder import lower_levels, upper_levels

__all__ = ["LevelTriSolve", "tri_solve_levels", "JacobiTriSolve"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ell_data", "ell_cols", "inv_diag", "level_rows"],
    meta_fields=["n", "num_levels"],
)
@dataclasses.dataclass(frozen=True)
class LevelTriSolve:
    """Level-scheduled solve of T x = b for triangular T.

    ``ell_data``/``ell_cols``: strict part of T in padded ELL (row-major,
    padding points at the dummy slot n). ``inv_diag``: 1/diag(T).
    ``level_rows``: (num_levels, width) row ids per level, padded with n.
    """

    ell_data: jax.Array   # (n, K)
    ell_cols: jax.Array   # (n, K) int32, padded entries -> n
    inv_diag: jax.Array   # (n,)
    level_rows: jax.Array  # (L, W) int32, padded entries -> n
    n: int
    num_levels: int

    def __call__(self, b: jax.Array) -> jax.Array:
        n = self.n
        # x extended with one dummy slot so padded gathers are no-ops.
        x = jnp.zeros(n + 1, dtype=b.dtype)
        bpad = jnp.concatenate([b, jnp.zeros((1,), b.dtype)])
        data = self.ell_data
        cols = self.ell_cols
        invd = jnp.concatenate([self.inv_diag, jnp.zeros((1,), self.inv_diag.dtype)])

        def level_step(l, x):
            rows = self.level_rows[l]                       # (W,)
            rdat = jnp.take(data, rows, axis=0, fill_value=0.0)   # (W, K)
            rcol = jnp.take(cols, rows, axis=0, fill_value=n)     # (W, K)
            acc = jnp.sum(rdat * jnp.take(x, rcol, axis=0), axis=1)
            xi = (jnp.take(bpad, rows) - acc) * jnp.take(invd, rows)
            return x.at[rows].set(xi, mode="drop")

        x = lax.fori_loop(0, self.num_levels, level_step, x)
        return x[:n]


def _strict_ell(T: CSRMatrix, lower: bool, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Pack the strict (off-diagonal) part of triangular T into ELL with
    padding column-index n."""
    n = T.shape[0]
    rows_l, cols_l, vals_l = [], [], []
    for i in range(n):
        s, e = T.indptr[i], T.indptr[i + 1]
        for p in range(s, e):
            j = T.indices[p]
            if (j < i) if lower else (j > i):
                rows_l.append(i)
                cols_l.append(j)
                vals_l.append(T.data[p])
    rows_a = np.asarray(rows_l, dtype=np.int64)
    counts = np.bincount(rows_a, minlength=n) if rows_a.size else np.zeros(n, np.int64)
    k = max(int(counts.max()) if counts.size else 1, 1)
    data = np.zeros((n, k))
    cols = np.full((n, k), n, dtype=np.int32)
    pos = np.zeros(n, dtype=np.int64)
    for r, c, v in zip(rows_l, cols_l, vals_l):
        data[r, pos[r]] = v
        cols[r, pos[r]] = c
        pos[r] += 1
    return data, cols


def tri_solve_levels(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                     unit_diag: bool = False) -> LevelTriSolve:
    """Build a level-scheduled solver for triangular CSR T."""
    n = T.shape[0]
    levels = lower_levels(T) if lower else upper_levels(T)
    num_levels = int(levels.max()) + 1 if n else 1
    width = int(np.bincount(levels).max()) if n else 1
    level_rows = np.full((num_levels, width), n, dtype=np.int32)
    fill = np.zeros(num_levels, dtype=np.int64)
    for i in range(n):
        l = levels[i]
        level_rows[l, fill[l]] = i
        fill[l] += 1
    data, cols = _strict_ell(T, lower, dtype)
    if unit_diag:
        diag = np.ones(n)
    else:
        diag = T.diagonal()
        diag = np.where(np.abs(diag) > 0, diag, 1.0)
    return LevelTriSolve(
        ell_data=jnp.asarray(data, dtype=dtype),
        ell_cols=jnp.asarray(cols),
        inv_diag=jnp.asarray(1.0 / diag, dtype=dtype),
        level_rows=jnp.asarray(level_rows),
        n=n,
        num_levels=num_levels,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ell_data", "ell_cols", "inv_diag"],
    meta_fields=["n", "sweeps"],
)
@dataclasses.dataclass(frozen=True)
class JacobiTriSolve:
    """Approximate triangular solve by ``sweeps`` Jacobi iterations:
    x <- D^{-1}(b - R x). Exact after n sweeps; a handful suffices as a
    preconditioner apply. Fully vectorized (one masked ELL SpMV per sweep)."""

    ell_data: jax.Array
    ell_cols: jax.Array   # padded entries -> n
    inv_diag: jax.Array
    n: int
    sweeps: int

    def __call__(self, b: jax.Array) -> jax.Array:
        n = self.n
        invd = self.inv_diag

        def sweep(_, x):
            xpad = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
            acc = jnp.sum(self.ell_data * jnp.take(xpad, self.ell_cols, axis=0), axis=1)
            return (b - acc) * invd

        x = b * invd
        return lax.fori_loop(0, self.sweeps, sweep, x)


def tri_solve_sweeps(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                     unit_diag: bool = False, sweeps: int = 6) -> JacobiTriSolve:
    n = T.shape[0]
    data, cols = _strict_ell(T, lower, dtype)
    if unit_diag:
        diag = np.ones(n)
    else:
        diag = T.diagonal()
        diag = np.where(np.abs(diag) > 0, diag, 1.0)
    return JacobiTriSolve(
        ell_data=jnp.asarray(data, dtype=dtype),
        ell_cols=jnp.asarray(cols),
        inv_diag=jnp.asarray(1.0 / diag, dtype=dtype),
        n=n,
        sweeps=sweeps,
    )
