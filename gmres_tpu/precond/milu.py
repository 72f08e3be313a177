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
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import rcm_ordering
from gmres_tpu.precond.ilu import iluk_factor, _build as _build_ilu
from gmres_tpu.solvers.gmres import GmresResult, gmres

__all__ = ["ruiz_equilibrate", "MiluSolver", "SystemTransform",
           "should_transform", "TransformedLeft", "TransformedRight"]


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
class SystemTransform:
    """Ruiz equilibration + RCM reordering of a whole linear system.

    The similarity form the split-ILU++ hooks implement
    (preconditioner.h:47-84): with z = P (x / dc),

        (P Dr A Dc P^T) z = P Dr b,    x = Dc P^T z.

    Transforming A, B, C/h *once* keeps the backward-Euler recurrence
    A x = B u + (C/h) x_prev structurally identical in z-space, so the
    whole transient scan runs on the transformed system and only port
    values are mapped back. Equilibration rescues preconditioners that
    choke on MNA saddle-point rows (V-source branch rows have zero
    diagonals: AINV stalls at ~1e-5 untransformed, converges to 1e-7
    transformed), and RCM clusters the column footprint for the WELL
    SpMV windows."""

    dr: np.ndarray
    dc: np.ndarray
    perm: np.ndarray
    inv_perm: np.ndarray

    @classmethod
    def build(cls, A: CSRMatrix, ruiz_iters: int = 4,
              reorder: bool = True) -> "SystemTransform":
        n = A.shape[0]
        dr, dc = ruiz_equilibrate(A, ruiz_iters)
        if reorder:
            S = A.to_scipy().astype(np.float64)
            S = S.multiply(dr[:, None]).tocsr().multiply(dc[None, :]).tocsr()
            perm = rcm_ordering(CSRMatrix.from_scipy(S))
        else:
            perm = np.arange(n)
        inv_perm = np.empty(n, dtype=np.int64)
        inv_perm[perm] = np.arange(n)
        return cls(dr=dr, dc=dc, perm=perm, inv_perm=inv_perm)

    def mat(self, M: CSRMatrix) -> CSRMatrix:
        """P Dr M Dc P^T — for A and C/h (anything multiplying x)."""
        S = M.to_scipy().astype(np.float64)
        S = S.multiply(self.dr[:, None]).tocsr().multiply(self.dc[None, :])
        return CSRMatrix.from_scipy(S.tocsr()[self.perm][:, self.perm].tocsr())

    def rows(self, B: CSRMatrix) -> CSRMatrix:
        """P Dr B — for source-incidence operators (u is untouched)."""
        S = B.to_scipy().astype(np.float64).multiply(self.dr[:, None])
        return CSRMatrix.from_scipy(S.tocsr()[self.perm].tocsr())

    def vec_to(self, x) -> np.ndarray:
        """x -> z = P (x / dc)."""
        return (np.asarray(x, np.float64) / self.dc)[self.perm]

    def vec_from(self, z) -> np.ndarray:
        """z -> x = Dc P^T z."""
        return self.dc * np.asarray(z, np.float64)[self.inv_perm]

    def rhs_to(self, b) -> np.ndarray:
        """b -> P Dr b."""
        return (self.dr * np.asarray(b, np.float64))[self.perm]

    def port_gather(self, ports: np.ndarray) -> np.ndarray:
        """Indices into z that correspond to x[ports]..."""
        return self.inv_perm[np.asarray(ports)]

    def port_scale(self, ports: np.ndarray) -> np.ndarray:
        """...and the scale to recover x[ports] = port_scale * z[gather]."""
        return self.dc[np.asarray(ports)]

    def left_hook(self, M=None, dtype=jnp.float32) -> "TransformedLeft":
        """M_left for natural-order GMRES: v -> M^{-1}(P Dr v)."""
        return TransformedLeft(
            M=M,
            gather=jnp.asarray(self.perm, jnp.int32),
            scale=jnp.asarray(self.dr, dtype),
        )

    def right_hook(self, dtype=jnp.float32) -> "TransformedRight":
        """M_right for natural-order GMRES: v -> Dc P^T v."""
        return TransformedRight(
            gather=jnp.asarray(self.inv_perm, jnp.int32),
            scale=jnp.asarray(self.dc, dtype),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["M", "gather", "scale"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TransformedLeft:
    """Left hook folding the SystemTransform into the preconditioner apply:
    v -> M^{-1}(P Dr v). Together with :class:`TransformedRight` as the
    right hook, GMRES on the natural-order A is algebraically identical to
    GMRES on the transformed system A'' = P Dr A Dc P^T (same Krylov
    coefficients, same iteration counts) — but the A-SpMV keeps its natural
    layout and rides the hybrid DIA fast path instead of the RCM-shredded
    gather path. This is how the reference's MyILUPP applies its perm+scale
    inside the preconditioner without ever permuting A
    (preconditioner.cu:962-1155)."""

    M: object           # preconditioner built on the transformed matrix
    gather: jax.Array   # (n,) int32 — row permutation P
    scale: jax.Array    # (n,) — Ruiz row scaling dr

    def __call__(self, v: jax.Array) -> jax.Array:
        w = (self.scale * v)[self.gather]
        return self.M(w) if self.M is not None else w


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gather", "scale"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TransformedRight:
    """Right hook v -> Dc P^T v (see :class:`TransformedLeft`)."""

    gather: jax.Array   # (n,) int32 — inverse permutation P^T
    scale: jax.Array    # (n,) — Ruiz column scaling dc

    def __call__(self, v: jax.Array) -> jax.Array:
        return self.scale * v[self.gather]


def should_transform(A: CSRMatrix, max_diags: int = 96) -> bool:
    """Transform when the matrix would miss the DIA fast path anyway
    (diagonal count above the routing threshold) or has structurally zero
    diagonal entries (MNA branch rows) that break unpivoted factorizations.
    Well-scaled stencil systems (thermal) return False and keep their DIA
    layout untouched."""
    if np.any(A.diagonal() == 0.0):
        return True
    rows = np.repeat(np.arange(A.shape[0]), A.row_lengths())
    ndiags = np.unique(A.indices.astype(np.int64) - rows).size
    return ndiags > max_diags


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
    # "iluk": level-based fill (fast setup, strong on grounded PG matrices:
    # beats the SuperLU-ILUTP stand-in there, benchmarks/precond_strength).
    # "ilutp": threshold + partial pivoting (the ILU++/ILUCDP strength
    # class; near-direct on saddle-point MNA where iluk needs 20x+ the
    # iterations). drop_tol/fill_factor apply to ilutp only.
    factor: str = "iluk"
    drop_tol: float = 1e-4
    fill_factor: float = 10.0

    def __post_init__(self):
        from gmres_tpu.ops.spmv import device_matrix, stencil_matrix

        A = self.A
        self.tr = SystemTransform.build(A, self.ruiz_iters, self.reorder)
        App = self.tr.mat(A)
        if self.factor == "ilutp":
            from gmres_tpu.precond.ilu import ilutp

            self.M = ilutp(App, drop_tol=self.drop_tol,
                           fill_factor=self.fill_factor, dtype=self.dtype,
                           mode=self.trisolve)
        elif self.factor == "iluk":
            L, U = iluk_factor(App, self.fill_level)
            self.M = _build_ilu(L, U, self.dtype, self.trisolve, sweeps=8)
        else:
            raise ValueError(f"unknown factor {self.factor!r}")
        # The transform orders the FACTORIZATION; the operator keeps its
        # natural layout whenever that layout rides the DIA/hybrid fast path
        # (the RCM permutation shreds natural stencil diagonals into
        # thousands of scattered ones — the slow gather path). The perm +
        # scalings then live inside the GMRES hooks (TransformedLeft/Right),
        # which is algebraically the same iteration.
        A_nat = stencil_matrix(A, dtype=self.dtype)
        self.decoupled = A_nat is not None
        self.A_dev = A_nat if self.decoupled else device_matrix(
            App, dtype=self.dtype)
        self._logical_n = A.shape[0]

    # --- split hooks (preconditioner.h:47-84 naming) --------------------

    def transform_rhs(self, b: np.ndarray) -> np.ndarray:
        return self.tr.rhs_to(b)

    def untransform_solution(self, z: np.ndarray) -> np.ndarray:
        return self.tr.vec_from(z)

    def initial_guess(self, x0: np.ndarray) -> np.ndarray:
        return self.tr.vec_to(x0)

    # --------------------------------------------------------------------

    def solve(self, b, x0: Optional[np.ndarray] = None) -> GmresResult:
        from gmres_tpu.ops.operator import as_operator

        n = self._logical_n
        Aop = as_operator(self.A_dev, logical_shape=(n, n))
        if self.decoupled:
            bt = jnp.asarray(b, dtype=self.dtype)
            x0d = (jnp.asarray(x0, dtype=self.dtype)
                   if x0 is not None else None)
            res = gmres(Aop, bt, x0d, restart=self.restart, tol=self.tol,
                        maxiter=self.maxiter,
                        M_left=self.tr.left_hook(self.M, self.dtype),
                        M_right=self.tr.right_hook(self.dtype))
            x = np.asarray(res.x, np.float64)
        else:
            bt = jnp.asarray(self.transform_rhs(b), dtype=self.dtype)
            z0 = (jnp.asarray(self.initial_guess(x0), dtype=self.dtype)
                  if x0 is not None else None)
            res = gmres(Aop, bt, z0, restart=self.restart, tol=self.tol,
                        maxiter=self.maxiter, M_left=self.M)
            x = self.untransform_solution(np.asarray(res.x, np.float64))
        return GmresResult(x=x, residual=res.residual,
                           iterations=res.iterations, restarts=res.restarts,
                           converged=res.converged)
