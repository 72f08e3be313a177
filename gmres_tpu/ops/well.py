"""WELL — windowed-ELL sparse format + Pallas gather kernel for *general*
sparsity on TPU.

XLA's generic gather is catastrophically slow on TPU (measured ~300x slower
than DIA for ELL SpMV), but Mosaic supports one fast gather shape: a
same-shape ``take_along_axis`` over the 128-lane dimension of a single
vreg. WELL is the format that reduces arbitrary CSR SpMV to exactly that
primitive — the static TPU realization of the reference's inspector-executor
(SpMV_inspect.cpp:38-457: group each row-block's column footprint into
column blocks staged in fast memory; executor SpMV_kernel.cu:624-1114):

- rows are tiled 128 per tile (the lane dimension);
- each tile's nonzeros are grouped by 128-aligned *column windows* — a
  window is one 128-lane row of the VMEM-resident x vector;
- each (tile, window) group is split into *chunks* of 8 slots x 128 rows:
  ``vals[s, r]`` multiplies ``x[window*128 + lcols[s, r]]`` and accumulates
  into ``y[tile*128 + r]``;
- chunks are batched ``chunks_per_step`` per grid step over a contiguous
  band of ``tiles_per_step`` output tiles.

Per chunk the kernel does: one dynamic sublane read (the window), one
lane-gather, one FMA reduction over 8 slots, one accumulate into the output
block. Memory cost ~8 B/slot with slot utilization = nnz / (128 * 8 *
ceil(K_w/8)) per group.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmres_tpu.ops.formats import CSRMatrix, round_up

__all__ = ["WellMatrix", "to_well", "well_spmv", "well_spmv_reference"]

_LANES = 128
_SLOTS = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "lcols", "widx", "lrow", "valid"],
    meta_fields=["shape", "logical_n", "tiles_per_step", "chunks_per_step"],
)
@dataclasses.dataclass(frozen=True)
class WellMatrix:
    """Chunked windowed-ELL. Shapes:
    vals/lcols: (steps, M, 8, 128); widx/lrow/valid: (steps*M,) int32."""

    vals: jax.Array
    lcols: jax.Array
    widx: jax.Array
    lrow: jax.Array
    valid: jax.Array
    shape: Tuple[int, int]   # padded square (n_pad, n_pad)
    logical_n: int
    tiles_per_step: int
    chunks_per_step: int

    @property
    def steps(self) -> int:
        return self.vals.shape[0]

    @property
    def dtype(self):
        return self.vals.dtype


def to_well(A: CSRMatrix, dtype=jnp.float32, tiles_per_step: int = 16) -> WellMatrix:
    """Pack host CSR into WELL (the 'inspection' pass). Supports rectangular
    matrices: rows pad to the tile grid, columns to the window grid."""
    n, ncols = A.shape
    n_pad = round_up(max(n, _LANES), _LANES)
    ncols_pad = round_up(max(ncols, _LANES), _LANES)
    ntiles = n_pad // _LANES
    ntiles_pad = round_up(ntiles, tiles_per_step)
    steps = ntiles_pad // tiles_per_step

    lengths = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), lengths)
    cols = A.indices.astype(np.int64)
    vals = A.data.astype(np.float64)

    tile = rows // _LANES
    lane = rows % _LANES
    window = cols // _LANES
    lcol = (cols % _LANES).astype(np.int32)

    # group key: (tile, window, lane); slot = running index within key
    order = np.lexsort((lane, window, tile))
    t_s, w_s, l_s = tile[order], window[order], lane[order]
    v_s, c_s = vals[order], lcol[order]
    key_change = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        key_change[1:] = (t_s[1:] != t_s[:-1]) | (w_s[1:] != w_s[:-1]) | (
            l_s[1:] != l_s[:-1]
        )
    # slot index within (tile, window, lane)
    idx = np.arange(len(order))
    start_of_key = np.maximum.accumulate(np.where(key_change, idx, 0))
    slot = idx - start_of_key

    # group = (tile, window); chunks per group = ceil(max_slot/8)
    grp_change = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        grp_change[1:] = (t_s[1:] != t_s[:-1]) | (w_s[1:] != w_s[:-1])
    grp_id = np.cumsum(grp_change) - 1
    ngroups = grp_id[-1] + 1 if len(order) else 0
    chunk_in_grp = slot // _SLOTS
    if len(order):
        nchunks_per_grp = np.zeros(ngroups, dtype=np.int64)
        np.maximum.at(nchunks_per_grp, grp_id, chunk_in_grp + 1)
        grp_tile = t_s[grp_change]
        grp_wind = w_s[grp_change]
    else:
        nchunks_per_grp = np.zeros(0, dtype=np.int64)
        grp_tile = np.zeros(0, dtype=np.int64)
        grp_wind = np.zeros(0, dtype=np.int64)

    # global chunk table, grouped by step (= tile // tiles_per_step)
    grp_step = grp_tile // tiles_per_step
    # chunks inherit their group's step; count chunks per step
    chunks_step = np.repeat(grp_step, nchunks_per_grp)
    chunks_tile = np.repeat(grp_tile, nchunks_per_grp)
    chunks_wind = np.repeat(grp_wind, nchunks_per_grp)
    total_chunks = len(chunks_step)
    M = int(np.bincount(chunks_step, minlength=steps).max()) if total_chunks else 1
    M = max(M, 1)

    # position of each chunk within its step
    order_c = np.argsort(chunks_step, kind="stable")
    pos_in_step = np.empty(total_chunks, dtype=np.int64)
    if total_chunks:
        cs = chunks_step[order_c]
        first = np.ones(total_chunks, dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        idxc = np.arange(total_chunks)
        start = np.maximum.accumulate(np.where(first, idxc, 0))
        pos_in_step[order_c] = idxc - start

    # chunk slot arrays
    V = np.zeros((steps, M, _SLOTS, _LANES))
    Cl = np.zeros((steps, M, _SLOTS, _LANES), dtype=np.int32)
    Wi = np.zeros(steps * M, dtype=np.int32)
    Lr = np.zeros(steps * M, dtype=np.int32)
    Va = np.zeros(steps * M, dtype=np.int32)

    # chunk index per group start (for mapping nnz -> global chunk id)
    grp_chunk_base = np.concatenate([[0], np.cumsum(nchunks_per_grp)])[:-1] \
        if ngroups else np.zeros(0, dtype=np.int64)
    if total_chunks:
        nnz_chunk = grp_chunk_base[grp_id] + chunk_in_grp  # global chunk id
        st = chunks_step[nnz_chunk]
        flat = st * M + pos_in_step[nnz_chunk]
        srow = slot % _SLOTS
        V[st, pos_in_step[nnz_chunk], srow, l_s] = v_s
        Cl[st, pos_in_step[nnz_chunk], srow, l_s] = c_s
        cflat = chunks_step * M + pos_in_step
        Wi[cflat] = chunks_wind.astype(np.int32)
        Lr[cflat] = (chunks_tile % tiles_per_step).astype(np.int32)
        Va[cflat] = 1

    return WellMatrix(
        vals=jnp.asarray(V, dtype=dtype),
        lcols=jnp.asarray(Cl),
        widx=jnp.asarray(Wi),
        lrow=jnp.asarray(Lr),
        valid=jnp.asarray(Va),
        shape=(ntiles_pad * _LANES, ncols_pad),
        logical_n=n,
        tiles_per_step=tiles_per_step,
        chunks_per_step=M,
    )


def _well_kernel(M, tiles_per_step, wi_ref, lr_ref, va_ref, x_ref, vals_ref,
                 cols_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, carry):
        @pl.when(va_ref[i * M + j] != 0)
        def _():
            win = x_ref[wi_ref[i * M + j], :]              # (128,)
            winb = jnp.broadcast_to(win[None, :], (_SLOTS, _LANES))
            g = jnp.take_along_axis(winb, cols_ref[0, j], axis=1)
            contrib = jnp.sum(vals_ref[0, j] * g, axis=0, keepdims=True)
            lr = lr_ref[i * M + j]
            out_ref[pl.ds(lr, 1), :] += contrib
        return carry

    lax.fori_loop(0, M, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def well_spmv(A: WellMatrix, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x; x length shape[1] (padded cols), output length shape[0]."""
    if x.shape[0] != A.shape[1]:
        raise ValueError(f"x length {x.shape[0]} != padded cols {A.shape[1]}")
    steps = A.steps
    M = A.chunks_per_step
    tps = A.tiles_per_step
    ntiles_pad = steps * tps
    x2d = x.reshape(A.shape[1] // _LANES, _LANES)
    kern = partial(_well_kernel, M, tps)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
                pl.BlockSpec(
                    (1, M, _SLOTS, _LANES), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, M, _SLOTS, _LANES), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tps, _LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles_pad, _LANES), x.dtype),
        interpret=interpret,
    )(A.widx, A.lrow, A.valid, x2d, A.vals, A.lcols)
    return out.reshape(ntiles_pad * _LANES)


def well_spmv_reference(A: WellMatrix, x: jax.Array) -> jax.Array:
    """Pure-jnp executor with identical semantics (CPU/debug oracle)."""
    x2d = x.reshape(A.shape[1] // _LANES, _LANES)
    steps, M = A.steps, A.chunks_per_step
    tps = A.tiles_per_step
    win = jnp.take(x2d, A.widx.reshape(steps, M), axis=0)   # (steps, M, 128)
    winb = win[:, :, None, :]                               # (steps, M, 1, 128)
    g = jnp.take_along_axis(
        jnp.broadcast_to(winb, A.lcols.shape), A.lcols, axis=3
    )
    contrib = jnp.sum(A.vals * g, axis=2)                   # (steps, M, 128)
    contrib = contrib * A.valid.reshape(steps, M, 1).astype(contrib.dtype)
    out = jnp.zeros((steps * tps, _LANES), dtype=x.dtype)
    rows = (jnp.arange(steps)[:, None] * tps + A.lrow.reshape(steps, M))
    out = out.at[rows.reshape(-1)].add(
        contrib.reshape(steps * M, _LANES), mode="drop"
    )
    return out.reshape(-1)


# dispatch registration (spmv does not import well at module level, so no
# circular import)
from gmres_tpu.ops.spmv import spmv as _spmv_dispatch  # noqa: E402


@_spmv_dispatch.register(WellMatrix)
def _well_spmv_dispatch(A, x):
    from gmres_tpu.ops.pallas_spmv import pallas_enabled

    if jax.default_backend() == "tpu" and pallas_enabled():
        return well_spmv(A, x)
    return well_spmv_reference(A, x)
