"""DC operating point: solve G x = B u(0).

Covers dc_solver.cpp:34 (UMFPACK direct) and the GPU-GMRES DC solve
(mna_solve_gpu_gmres.cpp:529-538) with one parameterized function.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from gmres_tpu.frontend.mna import MnaSystem
from gmres_tpu.precond import make_preconditioner
from gmres_tpu.solvers.direct import SparseLU
from gmres_tpu.solvers.gmres import gmres

__all__ = ["dc_solve"]


def dc_solve(
    mna: MnaSystem,
    method: str = "direct",
    precond: str = "auto",
    dtype=jnp.float64,
    tol: float = 1e-10,
    restart: int = 50,
    maxiter: int = 20000,
    dispatch_iters: int = 2000,
) -> np.ndarray:
    """Returns the DC state vector x (node voltages + branch currents).

    Default GMRES tolerance is 1e-10 (the DC state seeds the whole
    transient; callers on ill-conditioned transformed systems may pass a
    looser tol explicitly)."""
    rhs = mna.dc_rhs()
    if method == "direct":
        return SparseLU(mna.G).solve(rhs)
    if method == "gmres":
        from gmres_tpu.ops.spmv import device_operator
        from gmres_tpu.precond import resolve_precond
        from gmres_tpu.precond.milu import SystemTransform, should_transform

        G, b = mna.G, rhs
        precond = resolve_precond(precond, G)
        tr = None
        if precond != "saddle" and should_transform(G):
            # equilibrate + reorder: MNA branch rows have zero diagonals
            # that stall unpivoted preconditioners (see SystemTransform).
            # The saddle preconditioner eliminates those rows exactly and
            # needs neither.
            tr = SystemTransform.build(G)
            G, b = tr.mat(G), tr.rhs_to(b)
        M = make_preconditioner(precond, G, dtype=dtype, fmt="auto")
        Gop = device_operator(G, dtype=dtype)
        bd = jnp.asarray(b, dtype=dtype)
        # Bounded dispatches: one XLA program running for multiple minutes
        # kills the tunneled TPU worker (watchdog — see MEASUREMENTS.md
        # "Device watchdog"). A cold-start DC solve at 2.1M rows in f64 can
        # legitimately need thousands of iterations (~10 ms each), so the
        # iteration budget is spent in warm-restarted chunks; each chunk is
        # a single device program, the host only sees the converged flag.
        chunk = max(restart, min(int(dispatch_iters), maxiter))
        x0g = None
        res = None
        spent = 0
        while spent < maxiter:
            res = gmres(Gop, bd, x0=x0g, restart=restart, tol=tol,
                        maxiter=min(chunk, maxiter - spent), M_left=M)
            it = int(res.iterations)
            spent += max(it, 1)
            if bool(res.converged):
                break
            if it < chunk:
                # the solver gave up before its budget (stall guard /
                # breakdown) — another warm restart would re-stall
                break
            x0g = res.x
        if not bool(res.converged):
            raise RuntimeError(
                f"DC GMRES failed to converge: residual={float(res.residual)}"
            )
        x = np.asarray(res.x, dtype=np.float64)
        return tr.vec_from(x) if tr is not None else x
    raise ValueError(f"unknown dc method {method!r}")
