"""Sparse-matrix containers: host-side build formats (NumPy) and device-side
compute formats (JAX pytrees).

TPU-first redesign of the reference's format zoo (COO ``SpMatrix`` SpMV.h:31-41,
CSR/padded-CSR/BCSR generators SpMV_gen.cpp via SpMV.h:121-127, converters
formatConvert.cpp:112-425):

- Host: :class:`COOMatrix` (triplet accumulator, the analogue of
  matrix.cpp's ``pushEntry``/``mat2csdl``) and :class:`CSRMatrix` (canonical
  host format; all factorizations happen here).
- Device: :class:`EllMatrix` -- the TPU "padded CSR": every row padded to a
  fixed nnz/row so SpMV is one gather + one broadcast-multiply + row reduce
  (static shapes, no indptr walks). The reference pads rows to HALFWARP
  multiples for the same reason (genPaddedCSRFormat, SpMV.h:127).
  :class:`DiaMatrix` -- diagonal storage for stencil-structured thermal/PG
  matrices: SpMV becomes shifted elementwise multiplies, zero gathers --
  the speed-of-light layout on TPU's VPU. :class:`DeviceCOO` /
  :class:`DeviceCSR` -- segment-sum reference paths.

All device containers are registered dataclass pytrees so they pass through
``jit`` / ``vmap`` / ``shard_map`` transparently.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "COOMatrix",
    "CSRMatrix",
    "DeviceCOO",
    "DeviceCSR",
    "DiaMatrix",
    "EllMatrix",
    "round_up",
]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def to_device(x, dtype) -> jax.Array:
    """Host->device transfer with the dtype narrowing done in NumPy.

    ``jnp.asarray(x, dtype=float64)`` in a non-x64 process truncates to f32
    *and* emits a UserWarning per call site. Canonicalizing first makes the
    truncation explicit (one host-side cast) and the transfer warning-free;
    under x64 (GMRES-IR, CPU oracles) f64 passes through untouched.
    """
    cdt = jax.dtypes.canonicalize_dtype(np.dtype(dtype))
    return jnp.asarray(np.asarray(x, dtype=cdt))


# ---------------------------------------------------------------------------
# Host formats (NumPy)
# ---------------------------------------------------------------------------


class COOMatrix:
    """Triplet (COO) accumulator with duplicate summing.

    Plays the role of the reference's column-linked triplet builder
    (matrix.cpp ``matrix::pushEntry`` -> ``mat2csdl``, matrix.h:47-80): MNA
    stamping pushes (i, j, v) entries, duplicates sum on conversion.
    """

    def __init__(self, rows, cols, vals, shape: Tuple[int, int]):
        self.rows = np.asarray(rows, dtype=np.int64)
        self.cols = np.asarray(cols, dtype=np.int64)
        self.vals = np.asarray(vals, dtype=np.float64)
        if self.rows.shape != self.cols.shape or self.rows.shape != self.vals.shape:
            raise ValueError("rows/cols/vals length mismatch")
        self.shape = (int(shape[0]), int(shape[1]))

    @property
    def nnz(self) -> int:
        return int(self.rows.size)

    @classmethod
    def empty(cls, shape: Tuple[int, int]) -> "COOMatrix":
        return cls(np.zeros(0), np.zeros(0), np.zeros(0), shape)

    def to_csr(self, dtype=np.float64) -> "CSRMatrix":
        import scipy.sparse as sp

        m = sp.coo_matrix(
            (self.vals, (self.rows, self.cols)), shape=self.shape
        ).tocsr()
        m.sum_duplicates()
        m.sort_indices()
        return CSRMatrix(m.indptr, m.indices, m.data.astype(dtype), self.shape)

    def to_dense(self) -> np.ndarray:
        d = np.zeros(self.shape, dtype=np.float64)
        np.add.at(d, (self.rows, self.cols), self.vals)
        return d


class TripletBuilder:
    """Append-only triplet sink for stamping; O(1) amortized pushes."""

    def __init__(self, shape: Tuple[int, int]):
        self.shape = shape
        self._rows: list = []
        self._cols: list = []
        self._vals: list = []

    def push(self, i: int, j: int, v: float) -> None:
        self._rows.append(i)
        self._cols.append(j)
        self._vals.append(v)

    def push_many(self, i, j, v) -> None:
        self._rows.extend(np.asarray(i).tolist())
        self._cols.extend(np.asarray(j).tolist())
        self._vals.extend(np.asarray(v).tolist())

    def build(self) -> COOMatrix:
        return COOMatrix(self._rows, self._cols, self._vals, self.shape)


class CSRMatrix:
    """Canonical host CSR (row-sorted, duplicate-free).

    The hub every other format converts through, like the reference's
    ``MySpMatrix`` (SpMV.h:57-102) + the CSC->CSR converters
    (formatConvert.cpp:248-400).
    """

    def __init__(self, indptr, indices, data, shape: Tuple[int, int]):
        self.indptr = np.asarray(indptr, dtype=np.int32)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.data = np.asarray(data)
        self.shape = (int(shape[0]), int(shape[1]))
        if self.indptr.size != self.shape[0] + 1:
            raise ValueError("indptr size mismatch")

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_scipy(cls, m) -> "CSRMatrix":
        m = m.tocsr()
        m.sum_duplicates()
        m.sort_indices()
        return cls(m.indptr, m.indices, m.data, m.shape)

    @classmethod
    def from_dense(cls, d, tol: float = 0.0) -> "CSRMatrix":
        import scipy.sparse as sp

        d = np.asarray(d)
        mask = np.abs(d) > tol
        return cls.from_scipy(sp.csr_matrix(np.where(mask, d, 0.0)))

    @classmethod
    def from_triplets(cls, rows, cols, vals, shape) -> "CSRMatrix":
        return COOMatrix(rows, cols, vals, shape).to_csr()

    @classmethod
    def eye(cls, n: int, dtype=np.float64) -> "CSRMatrix":
        return cls(
            np.arange(n + 1), np.arange(n), np.ones(n, dtype=dtype), (n, n)
        )

    # -- basic ops ----------------------------------------------------------

    @property
    def nnz(self) -> int:
        return int(self.indices.size)

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype) -> "CSRMatrix":
        return CSRMatrix(self.indptr, self.indices, self.data.astype(dtype), self.shape)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (self.data, self.indices, self.indptr), shape=self.shape
        )

    def to_dense(self) -> np.ndarray:
        return self.to_scipy().toarray()

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """Host reference SpMV (the oracle role of ``computeSpMV``,
        SpMV_compute.cpp:19)."""
        return self.to_scipy() @ np.asarray(x)

    def diagonal(self) -> np.ndarray:
        return self.to_scipy().diagonal()

    def transpose(self) -> "CSRMatrix":
        return CSRMatrix.from_scipy(self.to_scipy().T.tocsr())

    def row_lengths(self) -> np.ndarray:
        return np.diff(self.indptr)

    def permute(self, perm: np.ndarray) -> "CSRMatrix":
        """Symmetric permutation A[perm][:, perm]."""
        s = self.to_scipy()
        return CSRMatrix.from_scipy(s[perm][:, perm])

    # -- device-format conversion -------------------------------------------

    def to_ell(
        self,
        dtype=jnp.float32,
        row_pad: int = 8,
        col_pad: int = 1,
        max_width: Optional[int] = None,
    ) -> "EllMatrix":
        """Pack into padded-row ELL. Rows padded to a multiple of ``row_pad``
        (TPU sublane), width to a multiple of ``col_pad``. Padding entries
        carry col=0 / val=0 so the gather stays in-bounds and contributes 0.
        """
        n, nc = self.shape
        lengths = self.row_lengths()
        k = int(lengths.max()) if lengths.size else 1
        k = max(k, 1)
        if max_width is not None and k > max_width:
            raise ValueError(f"row width {k} exceeds max_width {max_width}")
        k = round_up(k, col_pad)
        rpad = round_up(max(n, 1), row_pad)
        data = np.zeros((rpad, k), dtype=np.float64)
        cols = np.zeros((rpad, k), dtype=np.int32)
        # scatter: position of each nnz within its row
        offs = np.arange(self.nnz) - np.repeat(self.indptr[:-1], lengths)
        rows = np.repeat(np.arange(n), lengths)
        data[rows, offs] = self.data
        cols[rows, offs] = self.indices
        return EllMatrix(
            data=to_device(data, dtype),
            cols=jnp.asarray(cols),
            shape=self.shape,
        )

    def to_dia(self, dtype=jnp.float32, max_diags: int = 1024,
               pad_to: int = 1) -> "DiaMatrix":
        """Pack into DIA (per-diagonal) storage. Efficient when the matrix is
        a (possibly reordered) stencil: few distinct offsets. ``data[d, i]``
        multiplies ``x[i + offset_d]`` (row-aligned convention).

        ``pad_to`` rounds the stored size up (zero rows/cols appended); the
        Pallas kernel needs 1024-multiples so vectors can live in the padded
        space with no per-call repacking. ``logical_n`` records the true size.
        """
        n, nc = self.shape
        lengths = self.row_lengths()
        rows = np.repeat(np.arange(n), lengths)
        offsets_all = self.indices.astype(np.int64) - rows
        offsets = np.unique(offsets_all)
        if offsets.size > max_diags:
            raise ValueError(
                f"{offsets.size} diagonals > max_diags={max_diags}; use ELL"
            )
        n_pad = round_up(n, pad_to)
        data = np.zeros((offsets.size, n_pad), dtype=np.float64)
        dpos = np.searchsorted(offsets, offsets_all)
        data[dpos, rows] = self.data
        return DiaMatrix(
            data=tuple(to_device(row, dtype) for row in data),
            offsets=tuple(int(o) for o in offsets),
            shape=(n_pad, n_pad),
            logical_n=n,
        )

    def to_device_coo(self, dtype=jnp.float32) -> "DeviceCOO":
        lengths = self.row_lengths()
        rows = np.repeat(np.arange(self.shape[0]), lengths)
        return DeviceCOO(
            rows=jnp.asarray(rows, dtype=jnp.int32),
            cols=jnp.asarray(self.indices),
            vals=to_device(self.data, dtype),
            shape=self.shape,
        )

    def to_device_csr(self, dtype=jnp.float32) -> "DeviceCSR":
        return DeviceCSR(
            indptr=jnp.asarray(self.indptr),
            indices=jnp.asarray(self.indices),
            data=to_device(self.data, dtype),
            shape=self.shape,
        )


# ---------------------------------------------------------------------------
# Device formats (JAX pytrees)
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Padded-row ELL: ``data``/``cols`` are (rows_padded, K). SpMV is a
    static-shape gather + multiply + row-sum. The TPU counterpart of the
    reference's padded CSR + half-warp-per-row kernel
    (SpMV_kernel.cu:166-251)."""

    data: jax.Array  # (R, K) float
    cols: jax.Array  # (R, K) int32
    shape: Tuple[int, int]

    @property
    def nrows_padded(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "shape", "logical_n"],
)
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Diagonal storage: ``data[d][i] * x[i + offsets[d]]`` sums into
    ``y[i]``. Offsets are static metadata so the SpMV unrolls into
    ``ndiag`` shifted multiplies -- no gathers at all. ``shape`` may be
    padded square (zero-extended); ``logical_n`` is the true problem size.

    ``data`` is a TUPLE of per-diagonal (n_pad,) arrays, not one
    (ndiag, n_pad) array: a 2-D device ARGUMENT gets the default
    (8,128)-tiled row-major layout, so reading one diagonal row touches
    1/8 of every fetched tile — measured 10.7x SpMV slowdown vs the same
    data as separate contiguous 1-D operands (22.9 vs 245 Gnnz/s on the
    v5e 7-diagonal flagship; closure-constants dodged it only because XLA
    re-lays out constants)."""

    data: Tuple[jax.Array, ...]  # ndiag x (n_pad,)
    offsets: Tuple[int, ...]
    shape: Tuple[int, int]
    logical_n: int = -1

    @property
    def ndiags(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return self.data[0].dtype


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCOO:
    """Device COO for segment-sum SpMV (CPU/debug reference path)."""

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    shape: Tuple[int, int]

    @property
    def dtype(self):
        return self.vals.dtype


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["indptr", "indices", "data"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCSR:
    """Device CSR; kept for interoperability and triangular-solve packing."""

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: Tuple[int, int]

    @property
    def dtype(self):
        return self.data.dtype
