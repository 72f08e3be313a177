"""Typed configuration for the solver stack.

Replaces the reference's three config mechanisms (CLI flags in
etbr_cmd_short.cpp:91-167, compile-time #defines in config.h:13-75, and solver
constants in defs.h:11-12) with one typed dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """GMRES(m) + preconditioning configuration.

    Defaults mirror the reference's defs.h:11-12 (restart=32, max_iter=60000,
    tol=1e-6); the PG tool overrides to tol=1e-7, maxiter=1e4
    (gmres_interface_pg.cu:7,66-67).
    """

    restart: int = 32
    tol: float = 1e-6
    maxiter: int = 60000
    # Storage dtype for the Krylov basis / matrix ("-single" / "-double"
    # equivalent). TPU iterates in f32; f64 is for CPU oracles.
    dtype: Any = jnp.float32
    # Accumulation dtype for dots/norms (upcast knob for bf16 storage).
    dot_dtype: Optional[Any] = None
    # Preconditioner selector: none | jacobi | ilu0 | iluk | ainv | milu
    precond: str = "ainv"

    @property
    def pg_defaults(self) -> "SolverConfig":
        return dataclasses.replace(self, tol=1e-7, maxiter=10000)


@dataclasses.dataclass
class SolverStats:
    """Converged-state telemetry (reference prints these per run:
    gmres_interface_pg.cu:533-535, gmres.cu:1155)."""

    iterations: int = 0
    restarts: int = 0
    final_residual: float = 0.0
    converged: bool = False
    setup_time_s: float = 0.0
    solve_time_s: float = 0.0
