"""Pallas TPU SpMV kernels.

``dia_spmv_pallas``: the stencil fast path. The x vector (with explicit zero
lead/tail slack so every slice is strictly in bounds — OOB dynamic slices
are undefined behavior on TPU and can fault the worker) stays resident in
VMEM; each (row-tile, diagonal) contribution is two sublane-aligned dynamic
slices + two lane rolls + a select + an FMA — no gathers, no unaligned
loads. Matrices are built padded-square via ``CSRMatrix.to_dia(pad_to=...)``
and the zero edge coefficients written by the host packer neutralize the
slack reads.

The reference's analogue is the half-warp CSR kernel + inspector staging of
x tiles in shared memory (SpMV_kernel.cu:166-251, SpMV_inspect.cpp); here
the "inspection" is the static DIA offset structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmres_tpu.ops.formats import DiaMatrix

__all__ = ["dia_spmv_pallas", "dia_pallas_supported"]

_LANES = 128
_TILES = (32768, 16384, 8192, 4096, 2048, 1024)
# Padded x must fit VMEM alongside double-buffered data tiles (~16 MB/core).
_VMEM_X_LIMIT = 2_800_000


def _shifted_window(x_ref, s0, nrows, r):
    """Rows of the (S,128) x buffer holding flat elements
    [(s0*128 + r) + k for k in range(nrows*128)]: a cross-row left-shift by
    r lanes. All slices are in bounds by construction (lead/tail slack)."""
    A = x_ref[pl.ds(s0, nrows), :]
    if r == 0:
        return A
    B = x_ref[pl.ds(s0 + 1, nrows), :]
    Ar = pltpu.roll(A, _LANES - r, axis=1)  # == roll by -r
    Br = pltpu.roll(B, _LANES - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, _LANES), 1)
    return jnp.where(lane < _LANES - r, Ar, Br)


def _dia_kernel(offsets, lead, rows_per_tile, acc_dtype, x_ref, *refs):
    *data_refs, out_ref = refs
    i = pl.program_id(0)
    acc = jnp.zeros((rows_per_tile, _LANES), dtype=acc_dtype)
    for d, off in enumerate(offsets):
        start = lead + off  # flat position of this diagonal's first read
        r = start % _LANES
        q = (start - r) // _LANES
        s0 = i * rows_per_tile + q
        sh = _shifted_window(x_ref, s0, rows_per_tile, r)
        acc = acc + data_refs[d][:].astype(acc_dtype) * sh.astype(acc_dtype)
    out_ref[:] = acc.astype(out_ref.dtype)


def _pick_tile(n_pad: int):
    for t in _TILES:
        if n_pad % t == 0:
            return t
    return None


def pallas_enabled() -> bool:
    """DIA routes to XLA by default; the Pallas kernel is opt-in
    (GMRES_TPU_PALLAS=1). Settled by a 5-run slope-timed A/B on v5e
    (MEASUREMENTS.md): XLA shifted-multiply 248.9 +/- 6.4 Gnnz/s vs this
    kernel's 166.6 +/- 1.1 — XLA fuses the 7 shifted multiplies into
    fewer HBM passes than the kernel's explicit roll loop. (Round 1's
    apparent 40-vs-16 'variance' was a timing artifact: a ~23 ms fixed
    per-dispatch tunnel cost amortized over too few chained iterations.)
    The WELL/slab kernels route Pallas-on by default instead — there XLA's
    gather fallback loses 20x+ (see ops/well.py)."""
    import os

    return os.environ.get("GMRES_TPU_PALLAS", "0") == "1"


def dia_pallas_supported(A: DiaMatrix) -> bool:
    n_pad = A.shape[0]
    return (
        pallas_enabled()
        and A.dtype == jnp.float32  # no f64 vregs in Mosaic
        and n_pad % _LANES == 0
        and _pick_tile(n_pad) is not None
        and n_pad <= _VMEM_X_LIMIT
        and int(A.data[0].shape[0]) == n_pad
    )


@partial(jax.jit, static_argnames=("interpret",))
def dia_spmv_pallas(A: DiaMatrix, x: jax.Array, interpret: bool = False):
    """y = A @ x (both length A.shape[0], the padded size)."""
    n_pad = A.shape[0]
    if x.shape[0] != n_pad:
        raise ValueError(
            f"x length {x.shape[0]} != padded size {n_pad}; build the matrix "
            "with to_dia(pad_to=...) and pad vectors once at entry"
        )
    tile = _pick_tile(n_pad)
    if tile is None:
        raise ValueError(f"n_pad={n_pad} not a multiple of 1024")
    dtype = x.dtype
    ndiag = len(A.data)
    rpt = tile // _LANES
    # explicit zero lead/tail so every (s0, s0+1) slice is strictly in
    # bounds: lead covers the most-negative offset, tail covers the
    # most-positive one plus the B-slice overhang of _shifted_window.
    maxneg = max(0, -min(A.offsets)) if A.offsets else 0
    maxpos = max(0, max(A.offsets)) if A.offsets else 0
    lead = -(-maxneg // _LANES) * _LANES
    tail = -(-maxpos // _LANES) * _LANES + _LANES
    x2d = jnp.concatenate(
        [jnp.zeros((lead,), dtype), x, jnp.zeros((tail,), dtype)]
    ).reshape(-1, _LANES)
    # per-diagonal leaves ride straight into the kernel as separate inputs:
    # the old jnp.stack(A.data) materialized a full copy of the matrix data
    # (the same bytes the SpMV then reads) on EVERY apply — inside a GMRES
    # while_loop that re-ran per iteration (ADVICE r4 #3)
    acc_dtype = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype

    def _tile_idx(i):
        return (i.astype(jnp.int32) if hasattr(i, "astype")
                else jnp.int32(i))

    kern = partial(_dia_kernel, A.offsets, lead, rpt, acc_dtype)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            # x fully resident (whole-array block, i32 map: the default
            # map emits i64 constants under x64 and Mosaic fails to
            # legalize the transform func)
            pl.BlockSpec(x2d.shape,
                         lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(
                (rpt, _LANES), lambda i: (_tile_idx(i), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(ndiag)
        ],
        out_specs=pl.BlockSpec(
            (rpt, _LANES), lambda i: (_tile_idx(i), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), dtype),
        interpret=interpret,
    )(x2d, *(d.reshape(n_pad // _LANES, _LANES) for d in A.data))
    return out.reshape(n_pad)
