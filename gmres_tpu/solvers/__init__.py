"""Iterative + direct solvers (L4 of SURVEY.md)."""

from gmres_tpu.solvers.gmres import GmresResult, gmres, gmres_batched, gmres_solver
from gmres_tpu.solvers.direct import SparseLU, DenseLU

__all__ = ["GmresResult", "gmres", "gmres_batched", "gmres_solver",
           "SparseLU", "DenseLU"]
