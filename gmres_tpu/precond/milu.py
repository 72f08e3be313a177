"""MILU — equilibrated + reordered split-ILU preconditioning.

The TPU-framework equivalent of the reference's ILU++ multilevel ILUCDP
wrapper (MyILUPP/MyILUPPfloat, preconditioner.h:181-318): ILU++ exports
left/right triangular factors plus row/col permutations and scalings, and
the split GMRES applies rhs/left/right/starting-value transforms around the
Krylov loop (GMRESilu, gmres.cu:2069-2252; hooks declared at
preconditioner.h:47-84). Here the same structure is explicit:

    A'' = P (Dr A Dc) P^T          (Ruiz equilibration + RCM reordering)
    solve A'' z = P Dr b  with ILU(k)-preconditioned GMRES,
    x = Dc P^T z.

The factorization quality approaches ILU++'s multilevel pivoting on the
matrices this framework targets (diagonally-dominant MNA/thermal systems)
while every device-side apply remains trivially vectorizable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import rcm_ordering
from gmres_tpu.precond.ilu import iluk_factor, _build as _build_ilu
from gmres_tpu.solvers.gmres import GmresResult, gmres

__all__ = ["ruiz_equilibrate", "MiluSolver"]


def ruiz_equilibrate(A: CSRMatrix, iters: int = 4):
    """Symmetric Ruiz scaling: returns (dr, dc) with Dr A Dc ~ unit rows/cols
    in the inf-norm (the role of ILU++'s left/right scalings)."""
    S = A.to_scipy().tocsr().astype(np.float64)
    n, m = S.shape
    dr = np.ones(n)
    dc = np.ones(m)
    cur = S.copy()
    for _ in range(iters):
        rn = np.asarray(abs(cur).max(axis=1).todense()).ravel()
        rn = np.where(rn > 0, rn, 1.0)
        r = 1.0 / np.sqrt(rn)
        cur = cur.multiply(r[:, None]).tocsr()
        dr *= r
        cn = np.asarray(abs(cur).max(axis=0).todense()).ravel()
        cn = np.where(cn > 0, cn, 1.0)
        c = 1.0 / np.sqrt(cn)
        cur = cur.multiply(c[None, :]).tocsr()
        dc *= c
    return dr, dc


@dataclasses.dataclass
class MiluSolver:
    """Reusable transformed-system solver (gmresInterfacePG role,
    gmres_interface_pg.h:5-73): factor once, solve many RHS on device."""

    A: CSRMatrix
    fill_level: int = 1
    ruiz_iters: int = 4
    reorder: bool = True
    dtype: object = jnp.float32
    restart: int = 32
    tol: float = 1e-7
    maxiter: int = 10000
    trisolve: str = "levels"

    def __post_init__(self):
        A = self.A
        n = A.shape[0]
        self.dr, self.dc = ruiz_equilibrate(A, self.ruiz_iters)
        S = A.to_scipy().astype(np.float64)
        S = S.multiply(self.dr[:, None]).tocsr().multiply(self.dc[None, :]).tocsr()
        Aeq = CSRMatrix.from_scipy(S.tocsr())
        self.perm = rcm_ordering(Aeq) if self.reorder else np.arange(n)
        App = Aeq.permute(self.perm)
        L, U = iluk_factor(App, self.fill_level)
        self.M = _build_ilu(L, U, self.dtype, self.trisolve, sweeps=8)
        self.A_dev = App.to_ell(dtype=self.dtype)
        self._inv_perm = np.empty(n, dtype=np.int64)
        self._inv_perm[self.perm] = np.arange(n)

    # --- split hooks (preconditioner.h:47-84 naming) --------------------

    def transform_rhs(self, b: np.ndarray) -> np.ndarray:
        return (self.dr * np.asarray(b, np.float64))[self.perm]

    def untransform_solution(self, z: np.ndarray) -> np.ndarray:
        return self.dc * np.asarray(z, np.float64)[self._inv_perm]

    def initial_guess(self, x0: np.ndarray) -> np.ndarray:
        return (np.asarray(x0, np.float64) / self.dc)[self.perm]

    # --------------------------------------------------------------------

    def solve(self, b, x0: Optional[np.ndarray] = None) -> GmresResult:
        bt = jnp.asarray(self.transform_rhs(b), dtype=self.dtype)
        z0 = (jnp.asarray(self.initial_guess(x0), dtype=self.dtype)
              if x0 is not None else None)
        res = gmres(self.A_dev, bt, z0, restart=self.restart, tol=self.tol,
                    maxiter=self.maxiter, M_left=self.M)
        x = self.untransform_solution(np.asarray(res.x, np.float64))
        return GmresResult(x=x, residual=res.residual,
                           iterations=res.iterations, restarts=res.restarts,
                           converged=res.converged)
