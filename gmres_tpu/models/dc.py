"""DC operating point: solve G x = B u(0).

Covers dc_solver.cpp:34 (UMFPACK direct) and the GPU-GMRES DC solve
(mna_solve_gpu_gmres.cpp:529-538) with one parameterized function.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from gmres_tpu.frontend.mna import MnaSystem
from gmres_tpu.ops.formats import to_device
from gmres_tpu.precond import make_preconditioner
from gmres_tpu.solvers.direct import SparseLU
from gmres_tpu.solvers.gmres import gmres

__all__ = ["dc_solve"]


def dc_solve(
    mna: MnaSystem,
    method: str = "direct",
    precond: str = "auto",
    dtype=jnp.float64,
    tol: Optional[float] = None,
    restart: int = 50,
    maxiter: int = 20000,
    dispatch_iters: int = 2000,
    verbose: bool = False,
) -> np.ndarray:
    """Returns the DC state vector x (node voltages + branch currents).

    The GMRES tolerance default is precision-aware (the DC state seeds the
    whole transient, so it should be as tight as the arithmetic honestly
    allows): 1e-10 when f64 state is available — natively, or via GMRES-IR
    when ``dtype`` is f32 in an x64 process (f64 true residuals + one f64
    SpMV per restart around an f32 Arnoldi inner loop) — and 2e-6 (just
    above the measured f32 stall floor on PG systems, BENCH_r03) when the
    process has no f64 at all. Callers may pass ``tol`` explicitly."""
    import jax

    rhs = mna.dc_rhs()
    if method == "direct":
        return SparseLU(mna.G).solve(rhs)
    if method == "gmres":
        from gmres_tpu.ops.spmv import device_operator
        from gmres_tpu.precond import resolve_precond
        from gmres_tpu.precond.milu import SystemTransform, should_transform

        x64 = bool(jax.config.jax_enable_x64)
        eff = jax.dtypes.canonicalize_dtype(np.dtype(dtype))
        use_ir = x64 and eff == np.float32
        if tol is None:
            tol = 1e-10 if (use_ir or eff == np.float64) else 2e-6
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
        G_hi = device_operator(G, dtype=jnp.float64) if use_ir else None
        bd = to_device(b, jnp.float64 if use_ir else dtype)
        res = _chunked_gmres(Gop, bd, M, restart=restart, tol=tol,
                             maxiter=maxiter, dispatch_iters=dispatch_iters,
                             A_hi=G_hi,
                             work_dtype=jnp.float32 if use_ir else None,
                             verbose=verbose)
        if not bool(res.converged):
            raise RuntimeError(
                f"DC GMRES failed to converge: residual={float(res.residual)}"
            )
        x = np.asarray(res.x, dtype=np.float64)
        return tr.vec_from(x) if tr is not None else x
    raise ValueError(f"unknown dc method {method!r}")


def _chunked_gmres(Aop, bd, M, *, restart, tol, maxiter, dispatch_iters,
                   chunk_budget_s: float = 20.0, A_hi=None, work_dtype=None,
                   x0=None, verbose=False):
    """Warm-restarted GMRES in watchdog-safe dispatch chunks.

    One XLA program running for multiple minutes kills the tunneled TPU
    worker (MEASUREMENTS.md "Device watchdog"); a cold-start DC at 2.1M rows
    can need thousands of iterations at 3-40 ms each. So the iteration
    budget is spent across dispatches whose size is set by measured WALL
    TIME, not a fixed count: after each warm chunk the next chunk's maxiter
    is ``chunk_budget_s / measured-per-iteration-cost`` (the first chunk
    stays at ``dispatch_iters`` and its timing is ignored — it carries the
    compile). A stall is detected from the residual trajectory directly
    (progress < 0.1%/chunk, the solver's own stall-guard factor), not
    inferred from iteration counts, which misses stalls that land exactly on
    the chunk boundary.
    ``maxiter`` is a jit STATIC argname of the solver, so every distinct
    chunk size compiles a fresh XLA program. The adaptive size is therefore
    QUANTIZED to a power of two (the whole run touches a handful of
    programs instead of one per chunk), and a dispatch that carried a
    compile (first time a size is seen) never feeds the per-iteration
    timing — on the remote TPU backend compile time lands inside ``wall``
    and would shrink the next chunk, compounding the recompiles on exactly
    the long solves this targets (ADVICE r4 #1).
    """
    import time

    def _quant(c):
        # round down to a power of two, floored at restart
        c = max(int(c), restart, 1)
        return max(restart, 1 << (c.bit_length() - 1))

    chunk = _quant(min(int(dispatch_iters), maxiter))
    x0g = x0
    res = None
    spent = 0
    prev_res = float("inf")
    seen_sizes = set()
    while spent < maxiter:
        eff = min(chunk, maxiter - spent)
        cold = eff not in seen_sizes
        seen_sizes.add(eff)
        t0 = time.perf_counter()
        res = gmres(Aop, bd, x0=x0g, restart=restart, tol=tol,
                    maxiter=eff, M_left=M,
                    A_hi=A_hi, work_dtype=work_dtype)
        it = int(res.iterations)
        wall = time.perf_counter() - t0
        spent += max(it, 1)
        r = float(res.residual)
        if verbose:
            print(f"*   dc chunk: {it} iters, {wall:.1f} s, rel res {r:.3e}",
                  flush=True)
        if bool(res.converged):
            break
        if it < eff or r > 0.999 * prev_res:
            # gave up early (stall guard / breakdown), or a whole chunk of
            # warm restarts moved the residual by <0.1% — re-dispatching
            # would re-stall
            break
        prev_res = r
        if not cold and it > 0:
            chunk = _quant(min(chunk_budget_s / (wall / it),
                               maxiter - spent))
        x0g = res.x
    return res
