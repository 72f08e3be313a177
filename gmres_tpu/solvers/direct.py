"""Direct solvers: host sparse LU (oracle / small systems) and in-graph dense
LU for reduced systems.

Covers the reference's CSparse/UMFPACK usage (mna_solve.cpp LU transient,
dc_solver.cpp:34, etbr2.cpp:156-175 sample solves) -- on TPU the production
path is iterative; sparse LU stays on the host exactly where the reference
keeps it on the CPU, and dense reduced systems (q x q, q~20-30) factor
in-graph with jnp.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix

__all__ = ["SparseLU", "DenseLU"]


class SparseLU:
    """Host sparse LU via SuperLU (scipy.sparse.linalg.splu). Factor once,
    solve many — the ``cs_dl_lu`` + lsolve/usolve pattern of mna_solve.cpp."""

    def __init__(self, A: CSRMatrix):
        import scipy.sparse.linalg as spla

        self.shape = A.shape
        self._lu = spla.splu(A.to_scipy().tocsc())

    def solve(self, b: np.ndarray) -> np.ndarray:
        return self._lu.solve(np.asarray(b, dtype=np.float64))


class DenseLU:
    """In-graph dense LU with partial pivoting; the TPU analogue of the
    reference's reduced-system path (IT++ lu() + cublasStrsv,
    cudaTranSim.cu:350-390). Factor once at trace time, per-step solves are
    two triangular solves on device."""

    def __init__(self, A: jax.Array):
        self.lu, self.piv = jax.scipy.linalg.lu_factor(A)

    def solve(self, b: jax.Array) -> jax.Array:
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), b)
