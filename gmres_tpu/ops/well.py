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

from gmres_tpu.ops.formats import CSRMatrix, round_up, to_device

__all__ = ["WellMatrix", "to_well", "well_spmv", "well_spmv_reference",
           "WellSlabMatrix", "to_well_slab", "well_slab_spmv",
           "well_slab_spmv_reference"]

_LANES = 128

# Hybrid-remainder COO bound: scatter-add segment-sum runs ~16 ns/nnz on
# v5e, so up to this many scattered entries COO beats every windowed
# layout (near-empty chunks) while staying ~1 ms.
_COO_REST_MAX = 65536
_COO_PLANES_MIN = 512     # hybrid remainders above this go to the scatter
                          # planes instead of XLA COO scatter-add
_SLOTS = 8


def _i32(*vals):
    """Index-map outputs as int32: under x64, default-int index values trace
    as i64 and Mosaic fails to legalize the scalar-prefetch transform
    (reproduced on v5e; GMRES-IR enables x64 globally, so production hits
    this). Cast every index-map return through here."""
    return tuple(jnp.int32(v) if isinstance(v, int) else v.astype(jnp.int32)
                 for v in vals)


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


def to_well(A: CSRMatrix, dtype=jnp.float32, tiles_per_step: int = 16,
            as_numpy: bool = False) -> WellMatrix:
    """Pack host CSR into WELL (the 'inspection' pass). Supports rectangular
    matrices: rows pad to the tile grid, columns to the window grid.

    ``as_numpy`` keeps every array on the host in NumPy (vals in f64):
    used by :func:`to_well_slab`, which repacks the layout before any
    device transfer — converting through jnp would silently truncate the
    f64 values to f32 whenever x64 mode is off (and warn about it)."""
    asarray = (lambda a, **kw: np.asarray(a, **kw)) if as_numpy else jnp.asarray
    if as_numpy:
        dtype = np.float64
    n, ncols = A.shape
    n_pad = round_up(max(n, _LANES), _LANES)
    ncols_pad = round_up(max(ncols, _LANES), _LANES)
    ntiles = n_pad // _LANES
    ntiles_pad = round_up(ntiles, tiles_per_step)
    steps = ntiles_pad // tiles_per_step
    if n == ncols:
        # square operators must stay square under lax loops (GMRES chains
        # y back into x): pad columns up to the row tile grid too
        ncols_pad = max(ncols_pad, ntiles_pad * _LANES)

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
            vals=asarray(V, dtype=dtype), lcols=asarray(Cl),
            widx=asarray(Wi), lrow=asarray(Lr), valid=asarray(Va),
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
        vals=asarray(V, dtype=dtype),
        lcols=asarray(Cl),
        widx=asarray(Wi),
        lrow=asarray(Lr),
        valid=asarray(Va),
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
                # x resident: whole-array block with an explicit i32 map —
                # the default map emits i64 constants under x64 (see _i32)
                pl.BlockSpec(x2d.shape, lambda i, *_: _i32(0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, M, _SLOTS, _LANES), lambda i, *_: _i32(i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, M, _SLOTS, _LANES), lambda i, *_: _i32(i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tps, _LANES), lambda i, *_: _i32(i, 0),
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



# ---------------------------------------------------------------------------
# WELL v2: x slab + MXU one-hot window select, chunk-group grid
# ---------------------------------------------------------------------------
#
# The v1 kernel spends ~400 cycles per chunk on 8 *dynamic sublane reads*
# (one per slot-row window) -- Mosaic lowers each as a dynamic vreg select,
# and they dominate the 0.7 Gnnz/s round-1 number (the useful FMA work is
# ~8 vector ops). v2 removes every dynamic read from the chunk loop:
#
# - RCM clustering means one output band's tiles reference a narrow,
#   CONTIGUOUS range of x windows: one dynamic (SLAB, 128) slice pulls the
#   whole footprint ("slab") -- the inspector-executor x-staging idea
#   (SpMV_inspect.cpp) done in one strided read.
# - A group's chunk windows are materialized at once on the MXU:
#   W = onehot(rel_widx) @ slab, a (G*8, SLAB) x (SLAB, 128) matmul.
# - The grid runs over fixed-size chunk GROUPS (G chunks), statically
#   unrolled, so every win8 = W[8j:8j+8] is a static slice; per chunk the
#   remaining work is one lane gather + FMA reduce + a one-hot merge into a
#   register accumulator. Output blocks are addressed through a scalar-
#   prefetched group->step map (groups of one step are consecutive; the
#   first zero-initializes the block) -- so skewed per-step chunk counts
#   cost no padding, unlike a global max-chunks-per-step layout.
#
# Entries outside the slab (long-range vias that defeat RCM) spill to a
# COO side list applied by XLA scatter-add -- rare by construction.

_GROUP = 96               # chunks per grid group (static unroll length)
_SLAB_CAP = 512           # max slab windows (512*128*4B = 256 KB VMEM)
_PLANE_MIN = 8            # (tile,window) groups below this entry count go
                          # to the scatter-planes section: on the RCM-banded
                          # 100K PG bench matrix, groups with <32 entries are
                          # 78% of all groups and >half of all slot-rows but
                          # only 10.5% of the nnz (measured r5) — packing
                          # them as 128-lane slot-rows is what held the v2
                          # kernel at 7.8% slot utilization
_PLANES_PER_BATCH = 16    # planes statically unrolled per grid step (the
                          # ~150 ns fixed cost per grid step amortizes
                          # over more planes; measured r5: PB 8 -> 16 cut
                          # the 100K RCM bench 53.7 -> 45.0 us)
_PLANE_SW = 32            # window span per plane: each plane's entries live
                          # in a 32-window (4096-col) bucket, so the kernel
                          # sweeps a (32, 128) slice instead of the whole
                          # slab — plane cost drops from ~(slab/8*3+10) to
                          # ~22 vector ops while plane count grows only
                          # ~1.5x (measured r5 on the 100K RCM bench matrix:
                          # 381 -> 559 planes, 21K -> 12K total plane ops)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "lcols", "widx", "lrow", "gout", "gfirst", "gwork",
                 "base", "pvals", "plcol", "pwin", "ptrow", "pout", "pfirst",
                 "pwork", "pwbase", "spill_rows", "spill_cols", "spill_vals"],
    meta_fields=["shape", "logical_n", "tiles_per_step", "group",
                 "slab", "steps", "planes_per_batch", "sw", "dense_nnz",
                 "plane_nnz"],
)
@dataclasses.dataclass(frozen=True)
class WellSlabMatrix:
    """Chunk-group slab layout (v3 kernel): dense slot-rows + scatter planes.

    Dense section — (tile,window) groups holding >= plane_min entries:
    vals/lcols: (ngroups, G, 8, 128); widx: (ngroups, G*8, 1) int32 window
    indices RELATIVE to the group's slab base; base/gout/gfirst/gwork:
    (ngroups,) int32 (slab base window, output step index, first-group-of-
    step flag, group-has-real-chunks flag); lrow: (ngroups*G,) int32
    tile-in-step of each chunk.

    Scatter-planes section — the remaining scattered entries, keyed by
    OUTPUT LANE instead of (tile,window): plane p holds up to 128 entries
    with distinct output lanes r from a single ``sw``-window bucket, each
    carrying its own in-bucket window ``pwin``, in-window column ``plcol``
    and target tile-in-step ``ptrow`` (any tile of the step). The kernel
    slices the plane's (sw, 128) bucket out of the resident x (per-plane
    scalar-prefetched base ``pwbase``), gathers ``bucket[:, plcol[r]]``
    with one broadcast lane-gather, selects each entry's window row with a
    mask sweep, and merges into the output block by an elementwise
    tile-iota compare — ~22 vector ops per up-to-128 scattered entries,
    where a slot-row would burn a full (8,128) chunk slot per ~1-8
    entries. pvals: (nbatch, PB, 128) in the matrix dtype;
    plcol/pwin/ptrow: (nbatch, PB, 128) int8 (in-window column < 128,
    in-bucket window < sw, tile-in-step < tps); pout/pfirst/pwork:
    (nbatch,) int32; pwbase: (nbatch*PB,) int32 absolute window base.

    spill_*: COO tail for entries outside the step's slab window (rare)."""

    vals: jax.Array
    lcols: jax.Array
    widx: jax.Array
    lrow: jax.Array
    gout: jax.Array
    gfirst: jax.Array
    gwork: jax.Array
    base: jax.Array
    pvals: jax.Array
    plcol: jax.Array
    pwin: jax.Array
    ptrow: jax.Array
    pout: jax.Array
    pfirst: jax.Array
    pwork: jax.Array
    pwbase: jax.Array
    spill_rows: jax.Array
    spill_cols: jax.Array
    spill_vals: jax.Array
    shape: Tuple[int, int]
    logical_n: int
    tiles_per_step: int
    group: int
    slab: int
    steps: int
    planes_per_batch: int
    sw: int
    dense_nnz: int
    plane_nnz: int

    @property
    def ngroups(self) -> int:
        return self.vals.shape[0]

    @property
    def nbatches(self) -> int:
        return self.pvals.shape[0]

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def has_dense(self) -> bool:
        return self.vals.shape[0] > 0

    @property
    def has_planes(self) -> bool:
        return self.pvals.shape[0] > 0

    @property
    def spill_nnz(self) -> int:
        return int(self.spill_vals.shape[0])


def to_well_slab(A: CSRMatrix, dtype=jnp.float32, tiles_per_step: int = 64,
                 slab_cap: int = _SLAB_CAP, max_spill_frac: float = 0.05,
                 group: int = _GROUP, plane_min: int = _PLANE_MIN,
                 planes_per_batch: int = _PLANES_PER_BATCH):
    """Pack host CSR into the v3 slab layout (dense slot-rows + scatter
    planes), or None only when the scatter planes would degenerate (heavy
    per-lane collisions, see the sanity guard) -- callers fall back to
    :func:`to_well`. ``max_spill_frac`` is kept for API compatibility and
    unused: planes carry their own per-plane window base, so entries
    outside the dense slab simply become planes (no COO spill)."""
    import scipy.sparse as sp

    n, ncols = A.shape
    n_pad = round_up(max(n, _LANES), _LANES)
    ncols_pad = round_up(max(ncols, _LANES), _LANES)
    ntiles = n_pad // _LANES
    ntiles_pad = round_up(ntiles, tiles_per_step)
    steps = ntiles_pad // tiles_per_step
    if n == ncols:
        ncols_pad = max(ncols_pad, ntiles_pad * _LANES)
    nwin = ncols_pad // _LANES
    shape = (ntiles_pad * _LANES, ncols_pad)
    G, PB = group, planes_per_batch

    lengths = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), lengths).astype(np.int64)
    cols = A.indices.astype(np.int64)
    nnz = len(cols)
    tile = rows // _LANES
    stp = tile // tiles_per_step
    lane = (rows % _LANES).astype(np.int32)
    wind = cols // _LANES
    lcol = (cols % _LANES).astype(np.int32)

    # occupancy split first: (tile, window) groups below plane_min entries
    # go to the scatter planes, the rest to 128-lane slot-rows
    key = tile * np.int64(nwin) + wind
    _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    dense0 = cnt[inv] >= plane_min

    # per-step slab base/span over the DENSE entries only (planes carry
    # their own window bases, so they never constrain the slab); dense
    # groups outside a slab_cap-wide envelope route to planes too
    BIG = np.iinfo(np.int64).max
    sbase = np.full(steps, BIG)
    whi = np.full(steps, -1)
    if dense0.any():
        np.minimum.at(sbase, stp[dense0], wind[dense0])
        np.maximum.at(whi, stp[dense0], wind[dense0])
    sbase = np.where(sbase == BIG, 0, sbase)
    span = np.maximum(whi - sbase + 1, 1)
    slab = max(min(int(-(-int(span.max()) // 8) * 8), slab_cap, nwin), 1)
    sbase = np.clip(sbase, 0, nwin - slab).astype(np.int64)
    rel = wind - sbase[stp]
    in_slab = (rel >= 0) & (rel < slab)
    dense_e = dense0 & in_slab
    plane_e = ~dense_e
    sp_rows = np.zeros(0, np.int32)
    sp_cols = np.zeros(0, np.int32)
    sp_vals = np.zeros(0, np.float64)

    # ---- dense section: pack via to_well, regroup into G-chunk groups ----
    Sd = sp.coo_matrix((A.data[dense_e], (rows[dense_e], cols[dense_e])),
                       shape=A.shape).tocsr()
    has_dense = Sd.nnz > 0
    if has_dense:
        W1 = to_well(CSRMatrix.from_scipy(Sd), tiles_per_step=tiles_per_step,
                     as_numpy=True)
        assert W1.shape == shape and W1.steps == steps, (W1.shape, shape)
        M = W1.chunks_per_step
        vals1 = np.asarray(W1.vals)            # (steps, M, 8, 128)
        lcols1 = np.asarray(W1.lcols)
        widx1 = np.asarray(W1.widx).reshape(steps, M * _SLOTS)
        valid1 = np.asarray(W1.valid).reshape(steps, M)
        lrow1 = np.asarray(W1.lrow).reshape(steps, M)
        nchunks = np.maximum(valid1.sum(axis=1).astype(np.int64), 1)
        rel1 = (widx1 - sbase[:, None]).clip(0, slab - 1).astype(np.int32)
        rel3 = rel1.reshape(steps, M, _SLOTS)

        gps = (-(-nchunks // G)).astype(np.int64)   # groups per step (>=1)
        ngroups = int(gps.sum())
        Vg = np.zeros((ngroups, G, _SLOTS, _LANES))
        Cg = np.zeros((ngroups, G, _SLOTS, _LANES), dtype=np.int8)
        Wg = np.zeros((ngroups, G * _SLOTS, 1), dtype=np.int32)
        Lg = np.zeros(ngroups * G, dtype=np.int32)
        gout = np.zeros(ngroups, dtype=np.int32)
        gfirst = np.zeros(ngroups, dtype=np.int32)
        gwork = np.zeros(ngroups, dtype=np.int32)
        gbase = np.zeros(ngroups, dtype=np.int32)
        gi = 0
        for s in range(steps):
            real = int(valid1[s].sum())
            for k in range(int(gps[s])):
                lo = k * G
                hi = min(lo + G, int(nchunks[s]))
                cnt_k = hi - lo
                Vg[gi, :cnt_k] = vals1[s, lo:hi]
                Cg[gi, :cnt_k] = lcols1[s, lo:hi]
                Wg[gi, : cnt_k * _SLOTS, 0] = rel3[s, lo:hi].reshape(-1)
                Lg[gi * G: gi * G + cnt_k] = lrow1[s, lo:hi]
                gout[gi] = s
                gfirst[gi] = 1 if k == 0 else 0
                gwork[gi] = 1 if min(hi, real) > lo else 0
                gbase[gi] = sbase[s]
                gi += 1
        assert gi == ngroups
    else:
        ngroups = 0
        Vg = np.zeros((0, G, _SLOTS, _LANES))
        Cg = np.zeros((0, G, _SLOTS, _LANES), dtype=np.int8)
        Wg = np.zeros((0, G * _SLOTS, 1), dtype=np.int32)
        Lg = np.zeros(0, dtype=np.int32)
        gout = gfirst = gwork = gbase = np.zeros(0, dtype=np.int32)

    # ---- scatter-planes section ----
    # SW is independent of the dense slab: each plane slices x at its own
    # scalar-prefetched window base, so plane buckets cover the whole
    # column space even when the dense envelope is narrow
    SW = min(_PLANE_SW, nwin)
    pm = plane_e
    has_planes = bool(pm.any())
    if has_planes:
        e_stp = stp[pm]
        e_trow = (tile[pm] % tiles_per_step).astype(np.int64)
        e_lane = lane[pm].astype(np.int64)
        e_wind = wind[pm]
        e_lcol = lcol[pm].astype(np.int64)
        e_val = A.data[pm].astype(np.float64)
        # bucket entries by SW-aligned absolute window ranges; the last
        # bucket's base clips so the (SW, 128) slice stays in bounds
        e_bkt = e_wind // SW
        e_wb = np.minimum(e_bkt * SW, nwin - SW)
        e_rw = e_wind - e_wb                      # in-bucket window, < SW
        assert int(e_rw.max(initial=0)) < SW, "bucket overflow"
        assert tiles_per_step <= 127, "ptrow is int8"
        # plane index = running count within (step, bucket, output lane);
        # planes of one (step, bucket) share one scalar window base
        key2 = (e_stp * np.int64(nwin + SW) + e_bkt) * _LANES + e_lane
        order = np.argsort(key2, kind="stable")
        k2 = key2[order]
        idx = np.arange(len(k2))
        change = np.ones(len(k2), dtype=bool)
        change[1:] = k2[1:] != k2[:-1]
        start = np.maximum.accumulate(np.where(change, idx, 0))
        mult = idx - start                 # multiplicity within (s,b,lane)
        # plane key per entry = (step, bucket, mult); enumerate planes in
        # that lexicographic order, contiguous per step. The multiplicity
        # multiplier must exceed any per-(step,bucket,lane) entry count or
        # keys alias across buckets (caught by the dense-row test at 512).
        MLT = np.int64(1) << 24
        assert int(mult.max(initial=0)) < MLT
        pk = (e_stp[order] * np.int64(nwin + SW) + e_bkt[order]) * MLT \
            + mult
        upk, inv_pk = np.unique(pk, return_inverse=True)
        plane_stp = (upk // MLT) // np.int64(nwin + SW)
        plane_wb = np.minimum(((upk // MLT) % np.int64(nwin + SW)) * SW,
                              nwin - SW)
        nplanes_step = np.zeros(steps, dtype=np.int64)
        np.add.at(nplanes_step, plane_stp, 1)
        # sanity guard: pathological per-lane collisions (many entries on
        # one output lane of one bucket — a dense ROW) degenerate planes
        # to ~1 entry each; and unbounded plane counts would blow HBM
        # (each plane is ~1.7 KB of arrays). Healthy scattered remainders
        # measure ~5-50 entries/plane at contest scale; bail to the v1
        # fallback below ~2 entries/plane or above 64K planes.
        tot_planes = int(nplanes_step.sum())
        if tot_planes > max(4096, int(pm.sum()) // 2) or tot_planes > 65536:
            return None
        bps = (-(-np.maximum(nplanes_step, 1) // PB)).astype(np.int64)
        nbatch = int(bps.sum())
        batch_base = np.cumsum(bps) - bps         # first batch of each step
        # plane slot (batch, j) in step-major order
        pl_order = np.argsort(plane_stp, kind="stable")
        slot_of_plane = np.empty(len(upk), dtype=np.int64)
        run = np.arange(len(upk)) - np.repeat(
            np.cumsum(nplanes_step) - nplanes_step, nplanes_step)
        slot_of_plane[pl_order] = (batch_base[plane_stp[pl_order]] * PB
                                   + run)
        Pv = np.zeros((nbatch, PB, _LANES))
        Pl = np.zeros((nbatch, PB, _LANES), dtype=np.int8)
        Pw = np.zeros((nbatch, PB, _LANES), dtype=np.int8)
        Pt = np.zeros((nbatch, PB, _LANES), dtype=np.int8)
        pwbase = np.zeros(nbatch * PB, dtype=np.int32)
        pwbase[slot_of_plane] = plane_wb.astype(np.int32)
        es = slot_of_plane[inv_pk]                # flat plane slot per entry
        b_of_e, j_of_e = es // PB, es % PB
        Pv[b_of_e, j_of_e, e_lane[order]] = e_val[order]
        Pl[b_of_e, j_of_e, e_lane[order]] = e_lcol[order]
        Pw[b_of_e, j_of_e, e_lane[order]] = e_rw[order]
        Pt[b_of_e, j_of_e, e_lane[order]] = e_trow[order]
        pout = np.repeat(np.arange(steps, dtype=np.int32), bps)
        pfirst = np.zeros(nbatch, dtype=np.int32)
        pfirst[batch_base] = 1
        pwork = np.zeros(nbatch, dtype=np.int32)
        pwork[np.unique(b_of_e)] = 1
    else:
        Pv = np.zeros((0, PB, _LANES))
        Pl = Pw = Pt = np.zeros((0, PB, _LANES), dtype=np.int8)
        pout = pfirst = pwork = np.zeros(0, dtype=np.int32)
        pwbase = np.zeros(0, dtype=np.int32)

    return WellSlabMatrix(
        vals=to_device(Vg, dtype),
        lcols=jnp.asarray(Cg),
        widx=jnp.asarray(Wg),
        lrow=jnp.asarray(Lg),
        gout=jnp.asarray(gout),
        gfirst=jnp.asarray(gfirst),
        gwork=jnp.asarray(gwork),
        base=jnp.asarray(gbase),
        pvals=to_device(Pv, dtype),
        plcol=jnp.asarray(Pl),
        pwin=jnp.asarray(Pw),
        ptrow=jnp.asarray(Pt),
        pout=jnp.asarray(pout),
        pfirst=jnp.asarray(pfirst),
        pwork=jnp.asarray(pwork),
        pwbase=jnp.asarray(pwbase),
        spill_rows=jnp.asarray(sp_rows),
        spill_cols=jnp.asarray(sp_cols),
        spill_vals=to_device(sp_vals, dtype),
        shape=shape,
        logical_n=n,
        tiles_per_step=tiles_per_step,
        group=G,
        slab=slab,
        steps=steps,
        planes_per_batch=PB,
        sw=SW,
        dense_nnz=int(dense_e.sum()),
        plane_nnz=int(plane_e.sum()),
    )


def _select_windows(widx_row, xslab, shape2, out_dtype):
    """W[sr] = xslab[widx_row[sr]] via one-hot matmul on the MXU.

    The selector rows are one-hot, so each output element is a SINGLE
    product — no accumulation error. For f32 x that makes a 3-term bf16
    split exact (hi/mid/lo recover all 24 mantissa bits, each pass exact
    because the 0/1 selector is exact in bf16): 3 default-precision MXU
    passes instead of Precision.HIGHEST's 6 (measured r5: 81.5 -> 72.5 us
    on the 100K RCM bench matrix at G=32). bf16 x needs a single pass."""
    dn = (((1,), (0,)), ((), ()))
    if xslab.dtype not in (jnp.float32, jnp.bfloat16):
        # f64 (interpret-mode tests; the TPU dispatch routes f64 to the
        # reference executor): multi-pass HIGHEST keeps full precision
        sel64 = (widx_row == lax.broadcasted_iota(
            jnp.int32, shape2, 1)).astype(xslab.dtype)
        return lax.dot_general(sel64, xslab, dn,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=xslab.dtype
                               ).astype(out_dtype)
    sel = (widx_row == lax.broadcasted_iota(
        jnp.int32, shape2, 1)).astype(jnp.bfloat16)
    if xslab.dtype == jnp.bfloat16:
        return lax.dot_general(
            sel, xslab, dn, preferred_element_type=jnp.float32
        ).astype(out_dtype)
    xs = xslab.astype(jnp.float32)
    hi = xs.astype(jnp.bfloat16)
    r1 = xs - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    W = (lax.dot_general(sel, hi, dn, preferred_element_type=jnp.float32)
         + lax.dot_general(sel, mid, dn, preferred_element_type=jnp.float32)
         + lax.dot_general(sel, lo, dn, preferred_element_type=jnp.float32))
    return W.astype(out_dtype)


def _well_slab_kernel(G, tps, slab, gout_ref, gfirst_ref, gwork_ref,
                      base_ref, lr_ref, x_ref, widx_ref, vals_ref, cols_ref,
                      out_ref):
    i = pl.program_id(0)

    @pl.when(gfirst_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(gwork_ref[i] == 1)
    def _work():
        xslab = x_ref[pl.ds(base_ref[i], slab), :]          # (slab, 128)
        W = _select_windows(widx_ref[0], xslab, (G * _SLOTS, slab),
                            out_ref.dtype)                  # (G*8, 128)
        # Per chunk: lane gather + FMA reduce + one-hot row merge into
        # the register accumulator (no dynamic-sublane reads or writes in
        # the loop). Padding chunks carry vals == 0 and merge exact zeros
        # -- cheaper than a branch in Mosaic. (An octet-bank variant that
        # flushed an (8,128) accumulator with one dynamic-slice RMW per
        # octet measured 5x SLOWER on v5e: per-chunk pl.when predication
        # defeats Mosaic's pipelining — keep the branch-free merge even
        # though it costs 2*tps/8 vector ops per chunk.)
        tile_iota = lax.broadcasted_iota(jnp.int32, (tps, 1), 0)
        acc = jnp.zeros((tps, _LANES), out_ref.dtype)
        for j in range(G):                                  # static unroll
            win8 = W[j * _SLOTS:(j + 1) * _SLOTS, :]
            g = _lane_gather(win8, cols_ref[0, j].astype(jnp.int32))
            contrib = jnp.sum(vals_ref[0, j] * g, axis=0, keepdims=True)
            onehot = (tile_iota == lr_ref[i * G + j]).astype(out_ref.dtype)
            acc = acc + onehot * contrib
        out_ref[:] += acc


def _planes_kernel(PB, tps, sw, pout_ref, pfirst_ref, pwork_ref, pwb_ref,
                   x_ref, win_ref, lcol_ref, trow_ref, vals_ref, out_ref):
    """Scatter-planes executor: plane j holds <=128 entries with distinct
    OUTPUT lanes from one sw-window bucket; per plane: a (sw, 128) slice of
    the resident x at the plane's scalar-prefetched window base, one
    broadcast lane-gather (g[w, r] = bucket[w, lcol[r]]), a window-select
    mask sweep (C[r] = g[win[r], r]), and an elementwise tile-iota merge —
    ~22 vector ops per up-to-128 scattered entries at sw=32."""
    i = pl.program_id(0)

    @pl.when(pfirst_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(pwork_ref[i] == 1)
    def _work():
        wiota = lax.broadcasted_iota(jnp.int32, (sw, _LANES), 0)
        tiota = lax.broadcasted_iota(jnp.int32, (tps, _LANES), 0)
        acc = jnp.zeros((tps, _LANES), out_ref.dtype)
        for j in range(PB):                                 # static unroll
            xsub = x_ref[pl.ds(pwb_ref[i * PB + j], sw), :]  # (sw, 128)
            lrow = lcol_ref[0, j].astype(jnp.int32)[None, :]
            g = _lane_gather(xsub, jnp.broadcast_to(lrow, (sw, _LANES)))
            m = win_ref[0, j].astype(jnp.int32)[None, :] == wiota
            C = jnp.sum(jnp.where(m, g, jnp.zeros_like(g)), axis=0,
                        keepdims=True)                      # (1, 128)
            contrib = vals_ref[0, j][None, :] * C
            acc = acc + jnp.where(
                trow_ref[0, j].astype(jnp.int32)[None, :] == tiota,
                contrib, jnp.zeros_like(acc))
        out_ref[:] += acc


@partial(jax.jit, static_argnames=("interpret",))
def well_slab_spmv(A: WellSlabMatrix, x: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """y = A @ x for the v3 layout: dense chunk-group kernel + scatter-
    planes kernel (each skipped when its section is empty) + XLA
    scatter-add spill tail."""
    if x.shape[0] != A.shape[1]:
        raise ValueError(f"x length {x.shape[0]} != padded cols {A.shape[1]}")
    G, tps, PB = A.group, A.tiles_per_step, A.planes_per_batch
    ntiles_pad = A.steps * tps
    x2d = x.reshape(A.shape[1] // _LANES, _LANES)
    y = None
    if A.has_dense:
        kern = partial(_well_slab_kernel, G, tps, A.slab)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(A.ngroups,),
                in_specs=[
                    # x resident (whole-array block, i32 map — see _i32)
                    pl.BlockSpec(x2d.shape, lambda i, *sc: _i32(0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, G * _SLOTS, 1), lambda i, *sc: _i32(i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, G, _SLOTS, _LANES),
                        lambda i, *sc: _i32(i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, G, _SLOTS, _LANES),
                        lambda i, *sc: _i32(i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    # groups of one step are consecutive: the block stays in
                    # VMEM across them and flushes when gout advances
                    (tps, _LANES), lambda i, gout, *sc: _i32(gout[i], 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((ntiles_pad, _LANES), x.dtype),
            interpret=interpret,
        )(A.gout, A.gfirst, A.gwork, A.base, A.lrow, x2d, A.widx, A.vals,
          A.lcols)
        y = out
    if A.has_planes:
        kern = partial(_planes_kernel, PB, tps, A.sw)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(A.nbatches,),
                in_specs=[
                    pl.BlockSpec(x2d.shape, lambda i, *sc: _i32(0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, PB, _LANES), lambda i, *sc: _i32(i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, PB, _LANES), lambda i, *sc: _i32(i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, PB, _LANES), lambda i, *sc: _i32(i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, PB, _LANES), lambda i, *sc: _i32(i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (tps, _LANES), lambda i, pout, *sc: _i32(pout[i], 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((ntiles_pad, _LANES), x.dtype),
            interpret=interpret,
        )(A.pout, A.pfirst, A.pwork, A.pwbase, x2d, A.pwin, A.plcol,
          A.ptrow, A.pvals)
        y = out if y is None else y + out
    if y is None:
        y = jnp.zeros((ntiles_pad, _LANES), x.dtype)
    # the step grid may overshoot the padded row count (steps*tps*128 >=
    # shape[0]); trim so square operators stay square under lax loops
    y = y.reshape(ntiles_pad * _LANES)[: A.shape[0]]
    if A.spill_nnz:
        contrib = A.spill_vals * jnp.take(x, A.spill_cols)
        y = y.at[A.spill_rows].add(contrib)
    return y


def well_slab_spmv_reference(A: WellSlabMatrix, x: jax.Array) -> jax.Array:
    """Pure-jnp executor with identical semantics (CPU/debug oracle)."""
    x2d = x.reshape(A.shape[1] // _LANES, _LANES)
    ng, G, tps = A.ngroups, A.group, A.tiles_per_step
    out = jnp.zeros((A.steps * tps, _LANES), dtype=x.dtype)
    if A.has_dense:
        gw = A.widx.reshape(ng, G, _SLOTS) + A.base[:, None, None]
        win = jnp.take(x2d, gw, axis=0)                     # (ng, G, 8, 128)
        g = jnp.take_along_axis(win, A.lcols.astype(jnp.int32), axis=3)
        contrib = jnp.sum(A.vals * g, axis=2)               # (ng, G, 128)
        contrib = contrib * A.gwork[:, None, None].astype(contrib.dtype)
        rows = (A.gout[:, None] * tps + A.lrow.reshape(ng, G))
        out = out.at[rows.reshape(-1)].add(
            contrib.reshape(ng * G, _LANES), mode="drop"
        )
    if A.has_planes:
        nb, PB = A.nbatches, A.planes_per_batch
        absw = (A.pwin.astype(jnp.int32)
                + A.pwbase.reshape(nb, PB)[:, :, None])     # (nb, PB, 128)
        xv = x2d[absw, A.plcol.astype(jnp.int32)]           # fancy gather
        contrib = A.pvals * xv
        contrib = contrib * A.pwork[:, None, None].astype(contrib.dtype)
        rows = (A.pout[:, None, None] * tps
                + A.ptrow.astype(jnp.int32))                # (nb, PB, 128)
        lanes = jnp.broadcast_to(
            jnp.arange(_LANES)[None, None, :], rows.shape)
        flat = rows * _LANES + lanes
        yflat = jnp.zeros(A.steps * tps * _LANES, dtype=x.dtype)
        yflat = yflat.at[flat.reshape(-1)].add(
            contrib.reshape(-1), mode="drop")
        out = out + yflat.reshape(A.steps * tps, _LANES)
    y = out.reshape(-1)[: A.shape[0]]
    if A.spill_nnz:
        contrib = A.spill_vals * jnp.take(x, A.spill_cols)
        y = y.at[A.spill_rows].add(contrib)
    return y


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


def _batchable(kernel_fn):
    """Wrap a Pallas SpMV so jax.vmap maps it SEQUENTIALLY over the batch.

    The kernels keep the whole x vector VMEM-resident; the default vmap
    lifting batches that residency and overflows scoped VMEM at scale
    (measured: the 2.1M ETBR sample sweep's 7-wide vmapped GMRES died in
    compile at 17.6 MB > 16 MB). A lax.map over the batch runs each
    sample's SpMV with the single-sample footprint — which is the only
    schedule the resident-x design admits anyway."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(A, x):
        return kernel_fn(A, x)

    @f.def_vmap
    def _rule(axis_size, in_batched, A, x):
        A_b, x_b = in_batched
        if any(jax.tree_util.tree_leaves(A_b)):
            raise NotImplementedError("batched slab operators")
        if not x_b:
            return f(A, x), False
        return lax.map(lambda xi: f(A, xi), x), True

    return f


_well_spmv_b = _batchable(well_spmv)
_well_slab_spmv_b = _batchable(well_slab_spmv)


@_spmv_dispatch.register(WellMatrix)
def _well_spmv_dispatch(A, x):
    # f64 (GMRES-IR high-precision operators) takes the XLA path: Mosaic
    # has no f64 vregs. It runs once per restart there, not per iteration.
    if (jax.default_backend() == "tpu" and _well_pallas_enabled()
            and A.vals.dtype in (jnp.float32, jnp.bfloat16)):
        return _well_spmv_b(A, x)
    return well_spmv_reference(A, x)


@_spmv_dispatch.register(WellSlabMatrix)
def _well_slab_spmv_dispatch(A, x):
    if (jax.default_backend() == "tpu" and _well_pallas_enabled()
            and A.vals.dtype in (jnp.float32, jnp.bfloat16)):
        return _well_slab_spmv_b(A, x)
    return well_slab_spmv_reference(A, x)


# ---------------------------------------------------------------------------
# Hybrid DIA + WELL: dense diagonals on the stencil fast path, scattered
# remainder (vias, pads) through the slab kernel
# ---------------------------------------------------------------------------

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dia", "rest"],
    meta_fields=["shape", "logical_n"],
)
@dataclasses.dataclass(frozen=True)
class HybridMatrix:
    """A = DIA(dense diagonals) + rest. Power-grid matrices in their natural
    node ordering are a near-perfect stencil (the grid segments) plus a few
    percent of scattered entries (via arrays, pad connections): the stencil
    part runs at shifted-multiply speed (ops/spmv.py dia_spmv, the 40 Gnnz/s
    path) and only the remainder pays gather cost. The HYB(ELL+COO) idea of
    the GPU literature, realized TPU-style. ``rest`` is a WellSlabMatrix /
    WellMatrix / DeviceCOO; both parts share one padded size."""

    dia: object
    rest: object
    shape: Tuple[int, int]
    logical_n: int

    @property
    def dtype(self):
        return self.dia.dtype


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["inner", "gather_in", "gather_out"],
    meta_fields=["shape", "logical_n"],
)
@dataclasses.dataclass(frozen=True)
class PermutedMatrix:
    """y = A @ x computed through a privately-reordered inner operator:
    ``inner`` stores P A Pᵀ, so y = Pᵀ (inner @ (P x)) — two O(n) gathers
    around whatever format the permuted sparsity fits (the slab's window
    envelope, after RCM banding). The caller's vector basis is untouched."""

    inner: object
    gather_in: jax.Array   # (n,) int32 — applies P
    gather_out: jax.Array  # (n,) int32 — applies Pᵀ
    shape: Tuple[int, int]
    logical_n: int

    @property
    def dtype(self):
        return self.inner.dtype


@_spmv_dispatch.register(PermutedMatrix)
def _permuted_spmv_dispatch(A, x):
    xp = jnp.take(x, A.gather_in, axis=0)
    pad = A.inner.shape[1] - xp.shape[0]
    if pad > 0:
        xp = jnp.concatenate([xp, jnp.zeros((pad,), xp.dtype)])
    y = _spmv_dispatch(A.inner, xp)[: A.shape[0]]
    return jnp.take(y, A.gather_out, axis=0)


def promotion_plan(diag, counts, n, nnz, min_density: float = 0.25,
                   max_diags: int = 96, promote_min=None):
    """THE hybrid promotion math, shared by :func:`to_hybrid` (which packs
    by it) and frontend/mna.py ``_hybrid_score`` (which predicts fast-path
    viability from it at ordering-selection time — ADVICE r4 #2: the two
    copies had drifted). Inputs are the distinct row-offsets and their
    entry counts; returns ``(dense_offsets, rest_nnz)`` where
    ``dense_offsets`` includes both >= min_density stencil diagonals and
    promoted sparse offsets, and ``rest_nnz`` is what remains for the
    scatter path. See :func:`to_hybrid` for the promotion economics."""
    dense = diag[counts >= min_density * n]
    if dense.size == 0 or dense.size > max_diags:
        # keep the max_diags densest if over the cap
        order = np.argsort(-counts)
        dense = diag[order[:max_diags]]
        dense = dense[counts[order[:max_diags]] >= min_density * n]
        if dense.size == 0:
            return dense, int(nnz)
    if promote_min is None:
        promote_min = max(64, n // 2048)
    room = max_diags - dense.size
    if room > 0 and np.isfinite(promote_min):
        cand = (counts >= promote_min) & ~np.isin(diag, dense)
        if np.any(cand):
            ci = np.nonzero(cand)[0]
            ci = ci[np.argsort(-counts[ci])][:room]
            rest_after = nnz - counts[np.isin(diag, dense)].sum() \
                - counts[ci].sum()
            if rest_after > _COO_REST_MAX:
                ci = ci[counts[ci] >= max(promote_min, n // 20)]
            if ci.size:
                dense = np.concatenate([dense, diag[ci]])
    rest = int(nnz - counts[np.isin(diag, dense)].sum())
    return dense, rest


def to_hybrid(A: CSRMatrix, dtype=jnp.float32, min_density: float = 0.25,
              max_diags: int = 96, min_coverage: float = 0.5,
              tiles_per_step: int = 64, promote_min=None):
    """Split CSR into dense diagonals (DIA) + remainder, or None when the
    dense diagonals cover less than ``min_coverage`` of the nnz.

    Beyond the ``min_density`` stencil diagonals, any offset carrying at
    least ``promote_min`` entries is also promoted into DIA (descending
    count, up to ``max_diags`` total): one extra diagonal costs ~6 ns/row
    of shifted-multiply (measured v5e) vs ~16 ns/nnz + a ~50 us fixed
    scatter for COO remainder entries, so even a few-percent-dense offset
    (a via array between grid layers, which is constant-offset in natural
    node order) is far cheaper ridden on the DIA path. When promotion
    empties the remainder entirely, the fixed scatter cost disappears and
    the hybrid degenerates to pure DIA. ``promote_min=None`` (default)
    resolves to ``max(64, n // 2048)`` (the measured breakeven with
    margin); pass an explicit count to tune, 0 to promote the densest
    remaining offsets unconditionally, or ``float('inf')`` to disable
    promotion. The ``min_coverage`` viability gate is evaluated AFTER
    promotion, so matrices whose stencil part alone falls just short can
    still qualify on promoted diagonals."""
    import scipy.sparse as sp

    n, nc = A.shape
    if n != nc or A.nnz == 0:
        return None
    lengths = A.row_lengths()
    rows = np.repeat(np.arange(n), lengths).astype(np.int64)
    offs = A.indices.astype(np.int64) - rows
    diag, counts = np.unique(offs, return_counts=True)
    # Promotion economics (measured v5e): a promoted diagonal costs one
    # n-length padded lane read per SpMV plus n*4B of HBM, and saves its
    # cnt entries at the COO remainder's ~16 ns/nnz — a trade that only
    # exists when the remainder actually lands on COO. If the remainder
    # stays above the COO bound even with every candidate promoted,
    # sub-percent-dense promotions are pure bandwidth/memory waste
    # (measured at 524K discovery-order: 92 promoted 0.15%-dense diagonals
    # = 194 MB of padding with the gather path still required), so
    # promotion_plan restricts those to >=5%-dense diagonals.
    dense, rest = promotion_plan(diag, counts, n, A.nnz,
                                 min_density=min_density,
                                 max_diags=max_diags,
                                 promote_min=promote_min)
    if dense.size == 0:
        return None
    cov = (A.nnz - rest) / A.nnz
    if cov < min_coverage:
        return None
    N = round_up(n, tiles_per_step * _LANES)
    on_dia = np.isin(offs, dense)
    cols = A.indices.astype(np.int64)
    Sd = sp.coo_matrix(
        (A.data[on_dia], (rows[on_dia], cols[on_dia])), shape=(n, n)
    ).tocsr()
    Sr = sp.coo_matrix(
        (A.data[~on_dia], (rows[~on_dia], cols[~on_dia])), shape=(N, N)
    ).tocsr()
    dia = CSRMatrix.from_scipy(Sd).to_dia(dtype=dtype, pad_to=N,
                                          max_diags=max_diags)
    rest_csr = CSRMatrix.from_scipy(Sr)
    # The hybrid remainder is by construction the scattered part (via
    # arrays, pad rows) — WELL chunks run near-empty on it (measured
    # 0.04 Gnnz/s at 8 nnz/chunk vs COO segment-sum's flat ~16 ns/nnz),
    # so scatter-add COO wins outright until the remainder is big enough
    # that chunk occupancy recovers. COO takes priority over the slab for
    # small remainders (not just as the slab's fallback). Large remainders
    # with a footprint too wide for the slab (real netlists: discovery-
    # order node numbering scatters one layer's couplings over 100K+
    # offsets) take a PRIVATE RCM ordering — the remainder's permutation
    # never touches the dense-diagonal part or the caller's vector basis,
    # it just bands the slab's windows; two O(n) gathers per apply.
    rest = None
    f64 = jnp.dtype(dtype) == jnp.float64
    if rest_csr.nnz <= _COO_PLANES_MIN or \
            (f64 and rest_csr.nnz <= _COO_REST_MAX):
        # only TINY remainders stay on the XLA scatter-add COO path: its
        # ~16 ns/nnz made a 4K-entry remainder cost 67 us/apply (r5
        # profile) — 13x the whole DIA part — while the scatter-planes
        # section handles the same entries in a few us. EXCEPT f64
        # operators (GMRES-IR true-residual copies): Mosaic has no f64
        # vregs, so an f64 slab dispatches to the XLA-gather reference
        # executor — far slower than COO. They run once per restart;
        # COO's linear cost is the right trade there.
        rest = rest_csr.to_device_coo(dtype=dtype)
    else:
        rest = to_well_slab(rest_csr, dtype=dtype,
                            tiles_per_step=tiles_per_step)
        if rest is None:
            from gmres_tpu.ops.reorder import rcm_ordering

            perm = rcm_ordering(rest_csr)
            Srp = Sr[perm][:, perm].tocsr()
            W = to_well_slab(CSRMatrix.from_scipy(Srp), dtype=dtype,
                             tiles_per_step=tiles_per_step)
            if W is not None:
                ip = np.empty(N, dtype=np.int64)
                ip[perm] = np.arange(N)
                rest = PermutedMatrix(
                    inner=W,
                    gather_in=jnp.asarray(perm, jnp.int32),
                    gather_out=jnp.asarray(ip, jnp.int32),
                    shape=(N, N),
                    logical_n=n,
                )
        if rest is None:
            W = to_well(rest_csr, dtype=dtype,
                        tiles_per_step=tiles_per_step)
            # v1's window table rides scalar-prefetch SMEM (~1 MB/core):
            # refuse layouts that cannot compile (measured at 2.1M) and
            # fall back to exact segment-sum CSR
            if W.steps * W.chunks_per_step * 40 <= 768 * 1024:
                rest = W
            else:
                rest = rest_csr.to_device_csr(dtype=dtype)
    assert dia.shape[0] == N and rest.shape[0] == N, (dia.shape, rest.shape)
    return HybridMatrix(dia=dia, rest=rest, shape=(N, N), logical_n=n)


@_spmv_dispatch.register(HybridMatrix)
def _hybrid_spmv_dispatch(A, x):
    return _spmv_dispatch(A.dia, x) + _spmv_dispatch(A.rest, x)
