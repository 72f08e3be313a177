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

from gmres_tpu.ops.formats import CSRMatrix, to_device
from gmres_tpu.ops.reorder import lower_levels, upper_levels

__all__ = ["LevelTriSolve", "tri_solve_levels", "JacobiTriSolve",
           "tri_solve_sweeps", "ChunkedTriSolve", "tri_solve_chunked",
           "tri_solve_auto"]


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
    data_fields=["sub_data", "sub_cols", "sub_parent", "fin_rows",
                 "inv_diag"],
    meta_fields=["n", "n_chunks", "chunk", "k_cap"],
)
@dataclasses.dataclass(frozen=True)
class ChunkedTriSolve:
    """Level-scheduled triangular solve with BOUNDED padding.

    :class:`LevelTriSolve` pads to (num_levels, max_level_width, max_row_nnz)
    — on high-fill factors (ILUTP at 100K+ rows, SuperLU full factors) a
    single wide row and a single wide level inflate that to ~10^7x the real
    nnz, and the resulting device program outruns the TPU watchdog (measured:
    spilu L factor of the 100K PG matrix -> 1239 levels x 21105 width x
    673 K = 1.8e13 padded slots for 1.8e6 nnz). Here instead:

    - each row splits into sub-rows of at most ``k_cap`` nonzeros (killing
      the max-row-nnz axis); sub-rows of a row share its dependency level;
    - sub-rows are laid out in level order, each level padded to a multiple
      of ``chunk`` (killing the max-level-width axis): padded slots total at
      most nnz/k_cap + n + num_levels*chunk;
    - one ``fori_loop`` over chunks: gather-multiply-reduce the chunk's
      sub-rows against the solved prefix of x, scatter-add into a per-row
      accumulator, then finalize the rows whose LAST sub-row lives in this
      chunk (every dependency of a chunk finalized in earlier chunks, since
      levels are chunk-aligned).

    The reference's level scheduling (leftILU.cu:339-368, getLevel
    gmres.cu:1033-1077) has the same dependency structure; the chunking is
    the TPU-shaped execution of it (static shapes, bounded per-step work).
    """

    sub_data: jax.Array    # (n_sub_pad, k_cap)
    sub_cols: jax.Array    # (n_sub_pad, k_cap) int32
    sub_parent: jax.Array  # (n_sub_pad,) int32, sentinel n
    fin_rows: jax.Array    # (n_chunks, chunk) int32, sentinel n
    inv_diag: jax.Array    # (n,)
    n: int
    n_chunks: int
    chunk: int
    k_cap: int

    def __call__(self, b: jax.Array) -> jax.Array:
        n, R = self.n, self.chunk
        K = self.k_cap
        x0 = jnp.zeros(n, dtype=b.dtype)
        acc0 = jnp.zeros(n, dtype=b.dtype)

        def step(c, carry):
            x, acc = carry
            d = lax.dynamic_slice(self.sub_data, (c * R, 0), (R, K))
            cl = lax.dynamic_slice(self.sub_cols, (c * R, 0), (R, K))
            pr = lax.dynamic_slice(self.sub_parent, (c * R,), (R,))
            prod = jnp.sum(
                d * jnp.take(x, cl, axis=0, fill_value=0.0), axis=1)
            acc = acc.at[pr].add(prod, mode="drop")
            rows = self.fin_rows[c]
            xi = (jnp.take(b, rows, fill_value=0.0)
                  - jnp.take(acc, rows, fill_value=0.0)) * jnp.take(
                      self.inv_diag, rows, fill_value=0.0)
            x = x.at[rows].set(xi, mode="drop")
            return (x, acc)

        x, _ = lax.fori_loop(0, self.n_chunks, step, (x0, acc0))
        return x


def tri_solve_chunked(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                      unit_diag: bool = False, k_cap: int = 8,
                      chunk: int = 1024) -> ChunkedTriSolve:
    """Build a chunked level-scheduled solver (see :class:`ChunkedTriSolve`)."""
    n = T.shape[0]
    try:
        from gmres_tpu.native import levels_native

        levels = levels_native(T, lower)
        if levels is None:
            raise ImportError
    except ImportError:
        levels = lower_levels(T) if lower else upper_levels(T)
    strict = _strict_csr(T, lower)
    indptr = strict.indptr.astype(np.int64)
    indices = strict.indices.astype(np.int64)
    data = strict.data.astype(np.float64)
    row_nnz = np.diff(indptr)
    nsub = np.maximum(-(-row_nnz // k_cap), 1)

    num_levels = int(levels.max()) + 1 if n else 1
    counts = np.bincount(levels, minlength=num_levels)
    order = np.argsort(levels, kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts)])

    # per-level sub-row spans, padded to chunk multiples
    subs_per_level = np.zeros(num_levels, np.int64)
    np.add.at(subs_per_level, levels, nsub)
    padded_per_level = -(-subs_per_level // chunk) * chunk
    level_base = np.concatenate([[0], np.cumsum(padded_per_level)])
    n_sub_pad = int(level_base[-1]) if n else chunk
    n_chunks = max(n_sub_pad // chunk, 1)

    sub_data = np.zeros((n_sub_pad, k_cap))
    sub_cols = np.zeros((n_sub_pad, k_cap), np.int32)
    sub_parent = np.full(n_sub_pad, n, np.int32)
    last_chunk = np.zeros(n, np.int64)  # chunk finalizing each row

    for l in range(num_levels):
        rows_l = order[offs[l]:offs[l + 1]]
        if rows_l.size == 0:
            continue
        ns_l = nsub[rows_l]
        starts = level_base[l] + np.cumsum(ns_l) - ns_l
        S_l = int(ns_l.sum())
        sub_parent[level_base[l]: level_base[l] + S_l] = np.repeat(
            rows_l, ns_l)
        last_chunk[rows_l] = (starts + ns_l - 1) // chunk
        tot = int(row_nnz[rows_l].sum())
        if tot:
            rep = np.repeat(np.arange(rows_l.size), row_nnz[rows_l])
            base = np.repeat(indptr[rows_l], row_nnz[rows_l])
            csum = np.cumsum(row_nnz[rows_l]) - row_nnz[rows_l]
            within = np.arange(tot) - np.repeat(csum, row_nnz[rows_l])
            src = base + within
            dst_sub = starts[rep] + within // k_cap
            dst_slot = within % k_cap
            sub_data[dst_sub, dst_slot] = data[src]
            sub_cols[dst_sub, dst_slot] = indices[src]

    # rows finalized per chunk (each row ends in exactly one chunk; at most
    # `chunk` rows can end per chunk since each holds >=1 sub-row there)
    fin_rows = np.full((n_chunks, chunk), n, np.int32)
    if n:
        ordc = np.argsort(last_chunk, kind="stable")
        cc = np.bincount(last_chunk, minlength=n_chunks)
        coffs = np.concatenate([[0], np.cumsum(cc)])
        for c in np.nonzero(cc)[0]:
            rows_c = ordc[coffs[c]:coffs[c + 1]]
            fin_rows[c, : rows_c.size] = rows_c

    return ChunkedTriSolve(
        sub_data=to_device(sub_data, dtype),
        sub_cols=jnp.asarray(sub_cols),
        sub_parent=jnp.asarray(sub_parent),
        fin_rows=jnp.asarray(fin_rows),
        inv_diag=jnp.asarray(_diag_inv(T, unit_diag), dtype=dtype),
        n=n,
        n_chunks=n_chunks,
        chunk=chunk,
        k_cap=k_cap,
    )


def tri_solve_auto(T: CSRMatrix, lower: bool, dtype=jnp.float32,
                   unit_diag: bool = False, max_blowup: float = 64.0):
    """Level-scheduled solver with automatic layout choice: the dense
    (num_levels, width, K) LevelTriSolve when its padding stays within
    ``max_blowup``x the true nnz (fewer sequential steps, fastest on
    well-behaved factors), the chunked layout otherwise (high-fill ILUTP /
    SuperLU factors, where dense padding is watchdog-fatal)."""
    n = T.shape[0]
    if n == 0:
        return tri_solve_levels(T, lower, dtype=dtype, unit_diag=unit_diag)
    try:
        from gmres_tpu.native import levels_native

        levels = levels_native(T, lower)
        if levels is None:
            raise ImportError
    except ImportError:
        levels = lower_levels(T) if lower else upper_levels(T)
    strict = _strict_csr(T, lower)
    nnz = max(strict.nnz, 1)
    num_levels = int(levels.max()) + 1
    width = int(np.bincount(levels, minlength=num_levels).max())
    K = int(np.diff(strict.indptr).max()) if strict.nnz else 1
    if num_levels * width * max(K, 1) <= max_blowup * nnz:
        return tri_solve_levels(T, lower, dtype=dtype, unit_diag=unit_diag)
    return tri_solve_chunked(T, lower, dtype=dtype, unit_diag=unit_diag)


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
