"""Direct solvers: host sparse LU (oracle / small systems) and in-graph dense
LU for reduced systems.

Covers the reference's CSparse/UMFPACK usage (mna_solve.cpp LU transient,
dc_solver.cpp:34, etbr2.cpp:156-175 sample solves) -- on TPU the production
path is iterative; sparse LU stays on the host exactly where the reference
keeps it on the CPU, and dense reduced systems (q x q, q~20-30) factor
in-graph with jnp.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix

__all__ = ["SparseLU", "DenseLU", "DeviceSparseLU"]


class SparseLU:
    """Host sparse LU via SuperLU (scipy.sparse.linalg.splu). Factor once,
    solve many — the ``cs_dl_lu`` + lsolve/usolve pattern of mna_solve.cpp."""

    def __init__(self, A: CSRMatrix):
        import scipy.sparse.linalg as spla

        self.shape = A.shape
        self._lu = spla.splu(A.to_scipy().tocsc())

    def solve(self, b: np.ndarray) -> np.ndarray:
        return self._lu.solve(np.asarray(b, dtype=np.float64))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lsolve", "usolve", "row_gather", "col_gather"],
    meta_fields=["shape", "fill_nnz"],
)
@dataclasses.dataclass(frozen=True)
class DeviceSparseLU:
    """Device-resident sparse LU apply: factor on the host (SuperLU), run
    every solve on the TPU as permutation gathers + two level-scheduled
    triangular solves (precond/trisolve.py LevelTriSolve).

    This is the TPU realization of the reference's GPU direct-LU transient
    (wrapperGPUforPG.cu:17: CSparse LU factored on CPU, per-step sparse
    triangular solves on device via cuSPARSE csrsv + permute kernels) —
    level scheduling replaces the per-row dependency chain exactly as
    leftILU.cu:339-368 does for ILU factors. Exact solve (up to dtype):
    SuperLU gives Pr A Pc = L U, so
        x = Pc (U⁻¹ (L⁻¹ (Pr b))).
    A registered pytree: pass it as a jit/scan argument (models/transient.py
    ``transient_direct(device=True)``), never a closure constant.
    """

    lsolve: object           # LevelTriSolve for L (unit diag)
    usolve: object           # LevelTriSolve for U
    row_gather: jax.Array    # (n,) int32 — applies Pr
    col_gather: jax.Array    # (n,) int32 — applies Pc
    shape: tuple
    fill_nnz: int

    @classmethod
    def build(cls, A: CSRMatrix, dtype=jnp.float32) -> "DeviceSparseLU":
        import scipy.sparse.linalg as spla

        from gmres_tpu.precond.trisolve import tri_solve_auto

        lu = spla.splu(A.to_scipy().tocsc())
        L = CSRMatrix.from_scipy(lu.L.tocsr())
        U = CSRMatrix.from_scipy(lu.U.tocsr())
        return cls(
            # tri_solve_auto: SuperLU FULL factors at >=100K nodes have
            # skewed level widths and wide rows — the dense level layout's
            # padding is watchdog-fatal there; the chunked layout bounds it
            lsolve=tri_solve_auto(L, lower=True, dtype=dtype,
                                  unit_diag=True),
            usolve=tri_solve_auto(U, lower=False, dtype=dtype),
            # bp[perm_r] = b  <=>  bp = b[argsort(perm_r)] (device gather)
            row_gather=jnp.asarray(np.argsort(lu.perm_r), jnp.int32),
            col_gather=jnp.asarray(lu.perm_c.astype(np.int32)),
            shape=A.shape,
            fill_nnz=int(lu.L.nnz + lu.U.nnz),
        )

    def __call__(self, b: jax.Array) -> jax.Array:
        z = self.lsolve(b[self.row_gather])
        return self.usolve(z)[self.col_gather]

    def solve(self, b: jax.Array) -> jax.Array:
        return self(b)

    @property
    def seq_steps(self) -> int:
        """Sequential dependency steps per apply (levels of the dense
        layout, chunks of the chunked one, summed over L and U). Each step
        costs ~50-100 us of XLA gather/scatter overhead on v5e, so this is
        the per-apply cost model the device/host crossover routes on:
        measured SuperLU FULL factors of a 100K PG matrix give 5438 levels
        -> ~13K chunks -> ~1 s/apply, vs ~10 ms for the host substitution
        (MEASUREMENTS r3). Toy/banded systems stay in the hundreds."""
        total = 0
        for s in (self.lsolve, self.usolve):
            total += getattr(s, "n_chunks", None) or getattr(
                s, "num_levels", 0)
        return total


class DenseLU:
    """In-graph dense LU with partial pivoting; the TPU analogue of the
    reference's reduced-system path (IT++ lu() + cublasStrsv,
    cudaTranSim.cu:350-390). Factor once at trace time, per-step solves are
    two triangular solves on device."""

    def __init__(self, A: jax.Array):
        self.lu, self.piv = jax.scipy.linalg.lu_factor(A)

    def solve(self, b: jax.Array) -> jax.Array:
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), b)
