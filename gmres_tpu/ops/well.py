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
  window is one 128-lane row of the VMEM-resident x vector. A (tile,
  window, lane) cell holding k entries needs k *slot-rows* for that
  window;
- slot-rows of a tile — **from any of its windows** — pack 8 per *chunk*
  (one (8, 128) vreg). Each sublane s of a chunk carries its own window
  index ``widx[c, s]``: ``vals[s, r]`` multiplies
  ``x[widx[c, s]*128 + lcols[s, r]]`` and all 8 sublanes accumulate into
  ``y[tile*128 + r]``. Packing across windows is what keeps slot
  utilization high on banded/irregular matrices: the old per-(tile,window)
  chunking padded every window group to a multiple of 8 slot-rows, which
  collapsed to 3-18% utilization on RCM-banded PG matrices;
- chunks are batched ``chunks_per_step`` per grid step over a contiguous
  band of ``tiles_per_step`` output tiles.

Per chunk the kernel does: 8 dynamic sublane reads (the per-sublane
windows), one lane-gather, one FMA reduction over 8 slot-rows, one
accumulate into the output block. Memory cost ~8 B/slot with slot
utilization = nnz / (128 * 8 * chunks).
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
    vals/lcols: (steps, M, 8, 128); widx: (steps*M, 8) int32 (per-sublane
    window); lrow/valid: (steps*M,) int32."""

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

    nnz = len(vals)
    if nnz == 0:
        M = 1
        V = np.zeros((steps, M, _SLOTS, _LANES))
        Cl = np.zeros((steps, M, _SLOTS, _LANES), dtype=np.int32)
        Wi = np.zeros((steps * M, _SLOTS), dtype=np.int32)
        Lr = np.zeros(steps * M, dtype=np.int32)
        Va = np.zeros(steps * M, dtype=np.int32)
        return WellMatrix(
            vals=jnp.asarray(V, dtype=dtype), lcols=jnp.asarray(Cl),
            widx=jnp.asarray(Wi), lrow=jnp.asarray(Lr), valid=jnp.asarray(Va),
            shape=(ntiles_pad * _LANES, ncols_pad), logical_n=n,
            tiles_per_step=tiles_per_step, chunks_per_step=M,
        )

    # sort by (tile, window, lane); slot = running index within that key
    order = np.lexsort((lane, window, tile))
    t_s, w_s, l_s = tile[order], window[order], lane[order]
    v_s, c_s = vals[order], lcol[order]
    idx = np.arange(nnz)
    key_change = np.ones(nnz, dtype=bool)
    key_change[1:] = (t_s[1:] != t_s[:-1]) | (w_s[1:] != w_s[:-1]) | (
        l_s[1:] != l_s[:-1]
    )
    start_of_key = np.maximum.accumulate(np.where(key_change, idx, 0))
    slot = idx - start_of_key  # within (tile, window, lane)

    # groups = (tile, window); slot-rows per group = max slot + 1
    grp_change = np.ones(nnz, dtype=bool)
    grp_change[1:] = (t_s[1:] != t_s[:-1]) | (w_s[1:] != w_s[:-1])
    grp_id = np.cumsum(grp_change) - 1
    ngroups = int(grp_id[-1]) + 1
    rows_per_grp = np.zeros(ngroups, dtype=np.int64)
    np.maximum.at(rows_per_grp, grp_id, slot + 1)
    grp_tile = t_s[grp_change]
    grp_wind = w_s[grp_change]

    # global slot-row enumeration (groups expanded), ordered by tile
    grp_sr_base = np.cumsum(rows_per_grp) - rows_per_grp  # global slot-row id
    total_sr = int(rows_per_grp.sum())
    sr_grp = np.repeat(np.arange(ngroups), rows_per_grp)
    sr_tile = grp_tile[sr_grp]
    sr_wind = grp_wind[sr_grp]

    # slot-row index within its tile -> (chunk_in_tile, sublane)
    sr_idx = np.arange(total_sr)
    tile_change = np.ones(total_sr, dtype=bool)
    tile_change[1:] = sr_tile[1:] != sr_tile[:-1]
    sr_tile_start = np.maximum.accumulate(np.where(tile_change, sr_idx, 0))
    sr_in_tile = sr_idx - sr_tile_start
    sr_chunk_in_tile = sr_in_tile // _SLOTS
    sr_sub = (sr_in_tile % _SLOTS).astype(np.int32)

    # chunks per tile; chunk position within its step
    chunks_per_tile = np.zeros(ntiles_pad, dtype=np.int64)
    np.maximum.at(chunks_per_tile, sr_tile, sr_chunk_in_tile + 1)
    tile_step = np.arange(ntiles_pad) // tiles_per_step
    # exclusive cumsum of chunks_per_tile, reset at each step boundary
    csum = np.cumsum(chunks_per_tile) - chunks_per_tile
    step_base = np.zeros(steps, dtype=np.int64)
    first_tile = np.arange(0, ntiles_pad, tiles_per_step)
    step_base = csum[first_tile]
    tile_chunk_base = csum - step_base[tile_step]  # chunk offset within step
    chunks_in_step = np.add.reduceat(chunks_per_tile, first_tile)
    M = max(int(chunks_in_step.max()), 1)

    # flat chunk id for each slot-row
    sr_step = sr_tile // tiles_per_step
    sr_flat = sr_step * M + tile_chunk_base[sr_tile] + sr_chunk_in_tile

    V = np.zeros((steps, M, _SLOTS, _LANES))
    Cl = np.zeros((steps, M, _SLOTS, _LANES), dtype=np.int32)
    Wi = np.zeros((steps * M, _SLOTS), dtype=np.int32)
    Lr = np.zeros(steps * M, dtype=np.int32)
    Va = np.zeros(steps * M, dtype=np.int32)

    Wi[sr_flat, sr_sub] = sr_wind.astype(np.int32)
    Lr[sr_flat] = (sr_tile % tiles_per_step).astype(np.int32)
    Va[sr_flat] = 1

    # map each nnz to (flat chunk, sublane, lane)
    nnz_sr = grp_sr_base[grp_id] + slot          # global slot-row id
    nnz_flat = sr_flat[nnz_sr]
    nnz_sub = sr_sub[nnz_sr]
    st = nnz_flat // M
    po = nnz_flat % M
    V[st, po, nnz_sub, l_s] = v_s
    Cl[st, po, nnz_sub, l_s] = c_s

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


def _lane_gather(a, idx):
    """take_along_axis(a, idx, axis=1) with int32 indices. jnp's version
    converts indices to the default int dtype, which is int64 under x64 —
    unlowerable in Mosaic; this emits the exact lax.gather shape Mosaic
    maps to tpu.dynamic_gather, keeping indices int32."""
    return lax.gather(
        a,
        idx[..., None].astype(jnp.int32),
        lax.GatherDimensionNumbers(
            offset_dims=(),
            collapsed_slice_dims=(1,),
            start_index_map=(1,),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        ),
        slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _well_kernel(M, tiles_per_step, wi_ref, lr_ref, va_ref, x_ref, vals_ref,
                 cols_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, carry):
        # No validity branch: padding chunks carry vals == 0, window 0 and
        # lrow 0 (all in bounds), so they accumulate exact zeros — cheaper
        # than a per-chunk pl.when in Mosaic.
        win8 = jnp.concatenate(
            [x_ref[wi_ref[(i * M + j) * _SLOTS + s], :][None, :]
             for s in range(_SLOTS)],
            axis=0,
        )
        g = _lane_gather(win8, cols_ref[0, j])
        contrib = jnp.sum(vals_ref[0, j] * g, axis=0, keepdims=True)
        lr = lr_ref[i * M + j]
        out_ref[pl.ds(lr, 1), :] += contrib
        return carry

    # int32 loop bounds: under x64 a default int64 induction var mixes
    # int64 into the scalar index math, which Mosaic cannot lower (its
    # convert_element_type rule recurses to a RecursionError).
    lax.fori_loop(jnp.int32(0), jnp.int32(M), body, jnp.int32(0))


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
    )(A.widx.reshape(-1), A.lrow, A.valid, x2d, A.vals, A.lcols)
    return out.reshape(ntiles_pad * _LANES)


def well_spmv_reference(A: WellMatrix, x: jax.Array) -> jax.Array:
    """Pure-jnp executor with identical semantics (CPU/debug oracle)."""
    x2d = x.reshape(A.shape[1] // _LANES, _LANES)
    steps, M = A.steps, A.chunks_per_step
    tps = A.tiles_per_step
    # per-sublane windows: (steps, M, 8, 128)
    win = jnp.take(x2d, A.widx.reshape(steps, M, _SLOTS), axis=0)
    g = jnp.take_along_axis(win, A.lcols, axis=3)
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


def _well_pallas_enabled() -> bool:
    """WELL routes to the Pallas kernel by default on TPU (opt-OUT with
    GMRES_TPU_PALLAS=0), unlike DIA where the XLA path is competitive:
    XLA's gather fallback is ~23x slower here, slow enough that large GMRES
    programs outlive the device watchdog."""
    import os

    return os.environ.get("GMRES_TPU_PALLAS", "1") != "0"


@_spmv_dispatch.register(WellMatrix)
def _well_spmv_dispatch(A, x):
    # f64 (GMRES-IR high-precision operators) takes the XLA path: Mosaic
    # has no f64 vregs. It runs once per restart there, not per iteration.
    if (jax.default_backend() == "tpu" and _well_pallas_enabled()
            and A.vals.dtype in (jnp.float32, jnp.bfloat16)):
        return well_spmv(A, x)
    return well_spmv_reference(A, x)
