"""Restarted GMRES(m) — one implementation, fully in-graph.

The reference carries ~14 hand-specialized CUDA/C++ GMRES variants
(gmres.cu:221-2827: {CPU,GPU} x {none,diag,ILU0,AINV,class-based,split-ILU++}
x {alloc,transient}). Here precision, preconditioning, and batching are
*parameters* of a single function:

- Arnoldi with **CGS2** (classical Gram-Schmidt, twice): each step is two
  (m+1, n) @ (n,) matmuls instead of the reference's j sequential
  ``cublasSdot``/``Saxpy`` pairs (gmres.cu:2356-2359) -- the MXU-friendly
  reformulation; numerically as robust as modified GS.
- Givens rotations, Hessenberg updates, and the final triangular solve run
  **inside the same XLA program** (``lax.while_loop``), eliminating the
  reference's per-iteration host round-trip for the least-squares update
  (gmres.cu:2365-2370; the TVLSI paper keeps H on the host, §IV.A).
- Restart loop = outer ``lax.while_loop``; convergence-dependent trip counts
  never leave the device.
- Works under ``jax.vmap`` (batched multi-RHS solves, used by the ETBR
  frequency sweep) and under ``shard_map`` (dots become ``psum`` --
  parallel/dist_gmres.py).

Defaults restart=32, tol=1e-6, maxiter=60000 mirror defs.h:11-12.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from gmres_tpu.ops.operator import as_operator

__all__ = ["GmresResult", "gmres", "gmres_solver"]


class GmresResult(NamedTuple):
    x: jax.Array
    residual: jax.Array      # final TRUE relative residual ||b-Ax||/||b||
                             # (measured at the last restart-cycle start —
                             # never the preconditioned/implicit norm)
    iterations: jax.Array    # total inner Arnoldi steps
    restarts: jax.Array      # completed restart cycles
    converged: jax.Array     # bool
    # per-restart-cycle absolute TRUE residual trace (NaN-padded), when the
    # caller asked for telemetry (gmres.cu:1155's residual stream analogue)
    history: Optional[jax.Array] = None


def _identity(v):
    return v


def _psum(x, axis):
    return lax.psum(x, axis) if axis is not None else x


def _pany(flag, sync_axes):
    """ANY-reduce a bool over the given mesh axes (no-op when None/empty).

    Used to make loop trip counts *mesh-uniform*: every device keeps
    iterating while any shard anywhere still needs to, so collectives inside
    the loop body execute the same number of times on every participant.
    Without this, batch shards that converge in fewer restart cycles stop
    issuing the halo ``ppermute``/``psum`` while others continue, and XLA's
    collective rendezvous (which spans all mesh devices) deadlocks — the
    round-1 multichip failure."""
    if not sync_axes:
        return flag
    return lax.pmax(flag.astype(jnp.int32), sync_axes) > 0


def _norm(v, dot_dtype, axis=None):
    vv = v.astype(dot_dtype) if dot_dtype is not None else v
    return jnp.sqrt(_psum(jnp.sum(vv * vv), axis)).astype(v.dtype)


def _givens(a, b, eps):
    """Rotation (c, s) zeroing b against a: [c s; -s c] @ [a; b] = [r; 0]."""
    denom = jnp.sqrt(a * a + b * b)
    safe = denom > eps
    c = jnp.where(safe, a / jnp.where(safe, denom, 1.0), 1.0)
    s = jnp.where(safe, b / jnp.where(safe, denom, 1.0), 0.0)
    return c, s


@partial(
    jax.jit,
    static_argnames=("restart", "maxiter", "dot_dtype", "axis",
                     "track_history", "work_dtype", "sync_axes"),
)
def _gmres_impl(b, x0, tol, A, M_left, M_right, *, restart, maxiter, dot_dtype,
                axis=None, track_history=False, A_hi=None, work_dtype=None,
                sync_axes=None):
    """Core GMRES(m). When ``axis`` names a mesh axis (inside shard_map),
    vectors are row-sharded and every reduction becomes a psum over that axis
    (the distributed-MGS design of SURVEY.md §2.7 P5).

    ``sync_axes``: mesh axes over which loop *trip counts* must be uniform —
    required whenever independent solves (e.g. batch shards) share one SPMD
    program containing collectives. Continuation flags are pmax-reduced over
    these axes; shards that are locally done keep executing the loop bodies
    (so their collectives stay in lockstep) with all state updates masked.

    ``A_hi``: optional high-precision (f64) operator enabling mixed-precision
    iterative refinement (GMRES-IR): the solution and the per-restart true
    residual are kept in f64 while the Arnoldi inner loop runs in the working
    dtype. One f64 SpMV per restart buys residuals far below the f32 floor
    (~1e-6 relative on PG systems) that plain f32 GMRES stalls at.
    ``work_dtype``: inner-loop dtype; defaults to b's dtype (pass f32 with an
    f64 b to refine against a high-precision right-hand side).
    """
    dtype = jnp.dtype(work_dtype) if work_dtype is not None else b.dtype
    n = b.shape[0]
    m = restart
    eps = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)

    op = lambda v: M_left(A(M_right(v)))

    hi = jnp.promote_types(dtype, jnp.float64) if A_hi is not None else dtype
    b_hi = b.astype(hi) if A_hi is not None else b
    b = b.astype(dtype)

    # Convergence is declared on the UNPRECONDITIONED residual ||b - Ax||,
    # measured at restart-cycle starts. The implicit (Givens) residual lives
    # in the left-preconditioned norm — on ill-conditioned factors (ILUTP on
    # saddle-point MNA) that norm collapses by the factors' inverse norms
    # and "converges" while the true residual is O(1) (measured: warm
    # transient steps exiting at 0 iterations with 4e-4 port errors at
    # tol=1e-8). The reference declares on the same preconditioned norm
    # (gmres.cu:2396) and inherits the hazard; here the cycle-start true
    # residual (one extra norm of the r_pre already computed) gates `done`,
    # and the inner loop targets the scale-free REDUCTION FACTOR the true
    # residual still needs.
    bnorm = _norm(b, dot_dtype, axis)
    bnorm = jnp.where(bnorm > 0, bnorm, jnp.asarray(1.0, dtype))
    tol_abs = jnp.asarray(tol, dtype) * bnorm

    # Krylov rows padded to the projection block size so the blocked loops
    # below use static-shape slices with a *dynamic* trip count: at step j
    # only ceil((j+1)/B) row blocks of V are read, not all m+1 — early
    # Arnoldi steps (the common case for warm-started transient solves)
    # touch a fraction of the basis.
    BLK = 8
    m_pad = -(-(m + 1) // BLK) * BLK

    def cgs2(V, w, j, step):
        """Orthogonalize w against rows 0..j of V (classical GS, twice).
        Returns (w_orth, h) with h the (m_pad,) coefficient column. The
        block-loop bound uses ``step`` (mesh-uniform) so the psums inside run
        the same number of times on every shard; rows beyond this shard's own
        ``j`` are masked out."""
        nb = (step + 1 + BLK - 1) // BLK  # traced trip count, mesh-uniform

        def one_pass(w):
            w0 = w.astype(dot_dtype) if dot_dtype else w

            def body(bk, carry):
                w_acc, h_acc = carry
                blk = lax.dynamic_slice(V, (bk * BLK, 0), (BLK, n))
                hb = blk @ w0
                hb = _psum(hb, axis)
                rowids = bk * BLK + jnp.arange(BLK)
                hb = jnp.where(rowids <= j, hb.astype(dtype), 0.0)
                w_acc = w_acc - hb @ blk
                h_acc = lax.dynamic_update_slice(h_acc, hb, (bk * BLK,))
                return (w_acc, h_acc)

            return lax.fori_loop(
                0, nb, body, (w, jnp.zeros(m_pad, dtype))
            )

        w, h1 = one_pass(w)
        w, h2 = one_pass(w)
        return w, h1 + h2

    def arnoldi_cycle(x):
        if A_hi is not None:
            r_hi = b_hi - A_hi(x)
            beta_true = _norm(r_hi, jnp.float64, axis).astype(dtype)
            r_pre = r_hi.astype(dtype)
        else:
            r_pre = b - A(x)
            beta_true = _norm(r_pre, dot_dtype, axis)
        r = M_left(r_pre)
        beta = _norm(r, dot_dtype, axis)
        already = beta_true <= tol_abs
        # inner target: shrink the implicit (preconditioned) residual by the
        # factor the TRUE residual still needs; the next cycle re-verifies
        # against the true norm, so an optimistic preconditioned norm costs
        # at most one extra cycle, never a false convergence
        factor = jnp.minimum(tol_abs / jnp.maximum(beta_true, eps),
                             jnp.asarray(1.0, dtype))
        inner_tol = beta * factor

        V0 = jnp.zeros((m_pad, n), dtype)
        V0 = V0.at[0].set(jnp.where(beta > eps, r / jnp.where(beta > eps, beta, 1.0), 0.0))
        R0 = jnp.eye(m, dtype=dtype)          # rotated Hessenberg (upper tri)
        g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        cs0 = jnp.ones(m, dtype)
        sn0 = jnp.zeros(m, dtype)

        # ``step`` counts *global* loop trips and advances unconditionally;
        # ``j`` is this shard's own Arnoldi position and freezes once the
        # shard goes inactive. A shard that is still active has been active
        # every step, so j == step for it — semantics are unchanged — while
        # inactive shards keep executing the (collective-bearing) body with
        # their state updates masked out. ``go`` is the pany-reduced
        # continue flag so the while_loop trip count is mesh-uniform.
        def cond(st):
            return st[-1]

        def body(st):
            step, j, V, R, g, cs, sn, res, active, go = st
            w = op(V[j])
            w, h = cgs2(V, w, j, step)
            hnext = _norm(w, dot_dtype, axis)
            ok = hnext > eps
            vrow = jnp.where(ok, w / jnp.where(ok, hnext, 1.0), 0.0)
            V = V.at[j + 1].set(jnp.where(active, vrow, V[j + 1]))

            # Apply the j stored rotations to the new column. Unused slots
            # hold identity rotations, so the scan runs unmasked.
            def rot(i, h):
                hi, hi1 = h[i], h[i + 1]
                return h.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                )

            h = lax.fori_loop(0, j, rot, h)
            c, s = _givens(h[j], hnext, eps)
            rjj = c * h[j] + s * hnext
            h = h.at[j].set(rjj)
            cs_n = cs.at[j].set(c)
            sn_n = sn.at[j].set(s)
            gj = g[j]
            g_n = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            R_n = R.at[:, j].set(h[:m])
            res_n = jnp.abs(g_n[j + 1])

            R = jnp.where(active, R_n, R)
            g = jnp.where(active, g_n, g)
            cs = jnp.where(active, cs_n, cs)
            sn = jnp.where(active, sn_n, sn)
            res = jnp.where(active, res_n, res)
            j = jnp.where(active, j + 1, j)
            active = active & ok & (res_n > inner_tol)
            go = _pany(active & (j < m), sync_axes)
            return (step + 1, j, V, R, g, cs, sn, res, active, go)

        active0 = ~already
        init = (jnp.asarray(0), jnp.asarray(0), V0, R0, g0, cs0, sn0, beta,
                active0, _pany(active0, sync_axes) if m > 0 else jnp.asarray(False))
        _, j, V, R, g, cs, sn, res, _, _ = lax.while_loop(cond, body, init)

        # Solve R y = g on the full m-by-m system; identity diagonal +
        # zero rhs entries beyond step j make the padding inert.
        colmask = jnp.arange(m) < j
        gm = jnp.where(colmask, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, gm, lower=False)
        y = jnp.where(colmask, y, 0.0)
        dx = M_right(y @ V[:m])
        return x + dx.astype(x.dtype), res, j, beta_true

    max_cycles = min(-(-maxiter // max(restart, 1)) + 1, 8192)
    # Stall guard: when the true residual at the start of a cycle makes
    # essentially no progress on the previous cycle's (< 0.1% reduction),
    # twice in a row, the solve has hit its precision floor (e.g. tol below
    # the f32-achievable residual) — stop instead of burning to maxiter.
    # converged stays False. The threshold must stay close to 1: slow tail
    # convergence at a few percent per cycle is still convergence.
    stall_factor = jnp.asarray(0.999, dtype)

    def outer_cond(st):
        return st[-1]

    def outer_body(st):
        x, res, iters, cycles, done, stall, prev, hist, go = st
        act = ~done  # this shard still solving; lockstep shards run masked
        x_n, res_n, j, beta = arnoldi_cycle(x)   # beta = cycle-entry TRUE
        if track_history:
            hist_n = hist.at[jnp.minimum(cycles, max_cycles - 1)].set(beta)
            hist = jnp.where(act, hist_n, hist)
        stall_n = jnp.where(beta > stall_factor * prev, stall + 1, 0)
        # Only the true residual measured at a cycle start may declare
        # convergence (the implicit Givens residual is optimistic in the
        # preconditioned norm / at the f32 floor). A converged solve thus
        # ends with one j==0 confirmation cycle (a single SpMV + M apply).
        done_n = beta <= tol_abs
        # A cycle that takes zero steps cannot make progress: stop.
        done_n = done_n | (j == 0) | (stall_n >= 2)
        x = jnp.where(act, x_n, x)
        res = jnp.where(act, res_n, res)
        iters = jnp.where(act, iters + j, iters)
        cycles = jnp.where(act, cycles + 1, cycles)
        stall = jnp.where(act, stall_n, stall)
        prev = jnp.where(act, beta, prev)
        done = jnp.where(act, done_n, done)
        go = _pany((~done) & (iters < maxiter), sync_axes)
        return (x, res, iters, cycles, done, stall, prev, hist, go)

    x0 = x0.astype(hi)
    if A_hi is not None:
        res0 = _norm(b_hi - A_hi(x0), jnp.float64, axis).astype(dtype)
    else:
        res0 = _norm(b - A(x0), dot_dtype, axis)
    hist0 = (jnp.full((max_cycles,), jnp.nan, dtype)
             if track_history else jnp.zeros((0,), dtype))
    done0 = res0 <= tol_abs
    st = (x0, res0, jnp.asarray(0), jnp.asarray(0), done0,
          jnp.asarray(0), jnp.asarray(jnp.inf, dtype), hist0,
          _pany((~done0) & (0 < maxiter), sync_axes))
    x, res, iters, cycles, done, stall, prev, hist, _ = lax.while_loop(
        outer_cond, outer_body, st
    )
    # Report against the true residual: prev carries the last cycle-start
    # unpreconditioned norm; zero completed cycles means res0 already met
    # tol — use it.
    res_out = jnp.where(cycles > 0, prev, res0).astype(dtype)
    return GmresResult(
        x=x,
        residual=res_out / bnorm,
        iterations=iters,
        restarts=cycles,
        converged=res_out <= tol_abs,
        history=hist if track_history else None,
    )


def gmres(
    A,
    b,
    x0: Optional[jax.Array] = None,
    *,
    restart: int = 32,
    tol: float = 1e-6,
    maxiter: int = 60000,
    M_left: Optional[Callable] = None,
    M_right: Optional[Callable] = None,
    dot_dtype=None,
    track_history: bool = False,
    A_hi=None,
    work_dtype=None,
) -> GmresResult:
    """Solve ``A x = b`` with restarted, preconditioned GMRES(m).

    Args:
      A: device sparse matrix (any ``gmres_tpu.ops`` format) or matvec closure.
      b: right-hand side, shape (n,).
      x0: initial guess (zeros if None).
      restart: Krylov dimension m per cycle.
      tol: relative tolerance on the TRUE residual ||b - Ax|| / ||b||
        (checked at restart-cycle starts; the preconditioned norm is only
        an inner-loop steering signal, so ill-conditioned left
        preconditioners cannot fake convergence).
      maxiter: cap on total inner iterations.
      M_left / M_right: preconditioner applications v -> M^{-1} v. Right
        preconditioning uses the correction form x += M_right(V y), so only
        inverse applications are ever needed (two-sided/split supported by
        passing both, as the reference's GMRESilu does, gmres.cu:2069-2252).
      dot_dtype: accumulation dtype for dots/norms (e.g. jnp.float32 when
        storage is bf16).
      A_hi: optional f64 copy of A enabling mixed-precision iterative
        refinement (GMRES-IR): x and the per-restart true residual stay in
        f64 while the inner Arnoldi loop runs in ``work_dtype``. Requires
        x64 mode; the returned x is f64. Pass b in f64 (and work_dtype=f32)
        to refine against the unrounded right-hand side.
      work_dtype: inner-loop dtype; defaults to b's dtype.
    """
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _gmres_impl(
        b,
        x0,
        tol,
        as_operator(A),
        as_operator(M_left),
        as_operator(M_right),
        restart=int(restart),
        maxiter=int(maxiter),
        dot_dtype=dot_dtype,
        track_history=track_history,
        A_hi=as_operator(A_hi) if A_hi is not None else None,
        work_dtype=work_dtype,
    )


def gmres_batched(A, B, X0=None, **kw):
    """Solve A x_i = b_i for a batch of right-hand sides B (nrhs, n) with one
    vmapped solver program — the multi-RHS axis the reference fans out over
    pthreads (etbr_thread.cpp) runs data-parallel on the VPU/MXU here."""
    B = jnp.asarray(B)
    if X0 is None:
        X0 = jnp.zeros_like(B)

    def one(b, x0):
        return gmres(A, b, x0, **kw)

    return jax.vmap(one)(B, jnp.asarray(X0))


@dataclasses.dataclass
class gmres_solver:
    """Reusable solver object bound to one matrix + preconditioner, for time
    loops (the role of ``gmresInterfacePGfloat``/``GMRES_GPU_Data``,
    gmres_interface_pg.h:5-73, gmres.h:82-112 — here "reuse" just means the
    jitted XLA program and device-resident operands are cached)."""

    A: object
    M_left: Optional[Callable] = None
    M_right: Optional[Callable] = None
    restart: int = 32
    tol: float = 1e-6
    maxiter: int = 10000
    dot_dtype: Optional[object] = None

    def solve(self, b, x0=None) -> GmresResult:
        return gmres(
            self.A,
            b,
            x0,
            restart=self.restart,
            tol=self.tol,
            maxiter=self.maxiter,
            M_left=self.M_left,
            M_right=self.M_right,
            dot_dtype=self.dot_dtype,
        )
