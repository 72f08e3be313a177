"""Linear-operator pytrees.

jit-friendly representation of "a callable with device state": the state
travels as pytree data (so the XLA program is cached across calls with the
same structure), while the behavior (the function/type) is static metadata.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from gmres_tpu.ops.spmv import spmv as _spmv

__all__ = ["FnOp", "MatOp", "DenseOp", "ComposeOp", "IdentityOp",
           "ShiftedOp", "as_operator", "identity"]


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=["fn"])
@dataclasses.dataclass(frozen=True)
class FnOp:
    """Wrap a plain callable (no device state) as an operator pytree."""

    fn: Callable

    def __call__(self, v):
        return self.fn(v)


@partial(jax.tree_util.register_dataclass, data_fields=["A"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class MatOp:
    """y = A @ x for any gmres_tpu sparse format."""

    A: Any

    def __call__(self, v):
        return _spmv(self.A, v)


@partial(jax.tree_util.register_dataclass, data_fields=["A"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DenseOp:
    """y = A @ x with a DENSE device matrix riding the MXU.

    For small operators (coarse multigrid levels, reduced ETBR systems)
    where any sparse-format host analysis costs more seconds at build time
    than the dense stream ever costs at apply time (a 4096^2 f32 matvec
    reads 67 MB -> ~80 us at HBM roofline). The array is pytree DATA, not a
    closure constant, so jitted callers cache one program across rebuilds.

    Precision is pinned to HIGHEST: TPU f32 matmuls default to fast bf16
    MXU passes. Measured at the 2.1M flagship the default did NOT move
    iteration counts (bit-identical 50-step port waveforms either way —
    the V-cycle is a preconditioner and GMRES absorbs the rounding), but
    these matrices are small enough that f32-equivalent passes cost
    microseconds, so exactness is free — and a DenseOp used OUTSIDE a
    preconditioner (e.g. as a GMRES operator) must not silently truncate."""

    A: jax.Array  # (n, n)

    def __call__(self, v):
        return jnp.dot(self.A, v, precision=jax.lax.Precision.HIGHEST)


@partial(jax.tree_util.register_dataclass, data_fields=["A"],
         meta_fields=["rows", "cols"])
@dataclasses.dataclass(frozen=True)
class PaddedMatOp:
    """Logical (rows x cols) view of a device matrix stored padded (DIA with
    pad_to, WELL): pads x up to the stored column count, slices y back."""

    A: Any
    rows: int
    cols: int

    def __call__(self, v):
        import jax.numpy as jnp

        pad = self.A.shape[1] - self.cols
        if pad > 0:
            v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        y = _spmv(self.A, v)
        return y[: self.rows]


@partial(jax.tree_util.register_dataclass, data_fields=["outer", "inner"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ComposeOp:
    """(outer . inner)(v)."""

    outer: Any
    inner: Any

    def __call__(self, v):
        return self.outer(self.inner(v))


@partial(jax.tree_util.register_dataclass, data_fields=["G", "C", "s"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ShiftedOp:
    """y = (G + s C) x with a TRACED shift s.

    The frequency-shifted operator of the ETBR sample sweep
    ((G + f_i C) z_i = B u(f_i), etbr2.cpp:145) and of the backward-Euler
    recurrence (A = G + C/h). Because ``s`` is pytree data, a vmapped solve
    can batch over frequency samples while G/C stay unbatched device
    operands — the TPU shape of the reference's pthread-per-sample fan-out
    (etbr_thread.cpp:188-209), with no operator arrays baked into the
    program as constants."""

    G: Any
    C: Any
    s: Any

    def __call__(self, v):
        return self.G(v) + self.s * self.C(v)


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class IdentityOp:
    def __call__(self, v):
        return v


identity = IdentityOp()


def as_operator(A, logical_shape=None) -> Any:
    """Coerce a matrix / callable / operator / None into an operator pytree.

    ``logical_shape=(rows, cols)`` wraps padded device formats so callers
    keep working in logical coordinates.
    """
    if A is None:
        return identity
    if hasattr(A, "shape") and not callable(A):
        ln = getattr(A, "logical_n", None)
        if logical_shape is not None:
            r, c = logical_shape
            if (r, c) != tuple(A.shape):
                return PaddedMatOp(A, rows=int(r), cols=int(c))
        elif ln is not None and ln >= 0 and ln != A.shape[0]:
            return PaddedMatOp(A, rows=int(ln), cols=int(ln))
        return MatOp(A)
    if isinstance(A, (FnOp, MatOp, DenseOp, ComposeOp, IdentityOp,
                      PaddedMatOp, ShiftedOp)):
        return A
    if dataclasses.is_dataclass(A) and callable(A):
        # registered preconditioner pytrees (JacobiPrecond, AinvPrecond, ...)
        return A
    if callable(A):
        return FnOp(A)
    return MatOp(A)
