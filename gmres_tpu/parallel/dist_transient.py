"""Row-sharded full-MNA/thermal transient: the distributed engine.

Closes the gap between DistGmresSolver (a standalone solve object) and a
user-visible workload: the whole backward-Euler recurrence

    A x_{k+1} = B u_k + (C/h) x_k

runs inside ONE ``shard_map``-wrapped ``lax.scan`` over a "rows" device
mesh — state, Krylov basis, and both rhs SpMVs stay row-sharded on their
devices across all steps; only the input waveform table (steps, nsrc) is
replicated and only per-step port values (psum-reduced scalars) leave the
mesh. This is the engine the reference dispatches to for ``-np``
(etbr_cmd_short.cpp:364 -> etbr_wrapper.cpp:189-261), rebuilt on the
framework's own scaling axis (SURVEY §2.7 P4/P5: row partition + ICI
collectives instead of METIS/Schur).

Reached from the CLI as ``pg ckt.sp -gmres -np N`` (cli/pg.py) and
exercised by the driver's multichip dryrun (__graft_entry__.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmres_tpu.ops.formats import CSRMatrix, EllMatrix
from gmres_tpu.ops.operator import identity
from gmres_tpu.parallel.dist_gmres import DistGmresSolver
from gmres_tpu.parallel.mesh import row_specs
from gmres_tpu.solvers.gmres import _gmres_impl

__all__ = ["ReplicatedColsOp", "DistTransientResult", "dist_transient_gmres"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ell"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ReplicatedColsOp:
    """y_local = B_localrows @ u for a REPLICATED operand u (the per-step
    source vector): rows are sharded over the mesh, columns index the small
    replicated u — pure local compute, no collectives."""

    ell: EllMatrix

    def __call__(self, u: jax.Array) -> jax.Array:
        return jnp.sum(self.ell.data * jnp.take(u, self.ell.cols, axis=0),
                       axis=1)


class DistTransientResult(NamedTuple):
    times: np.ndarray         # (steps,)
    port_values: np.ndarray   # (steps, nports)
    iterations: np.ndarray    # (steps,)
    residuals: np.ndarray     # (steps,)
    converged: bool
    comm: str                 # A-SpMV comm class (HaloShardedOp / ...)
    stats: Optional[dict] = None  # setup-phase wall-clock split


def _row_ell(S, perm, n_padded, dtype):
    """Permute rows of a host CSR by ``perm``, pad to n_padded rows, return
    ELL with GLOBAL column indices (columns untouched)."""
    Ssp = S.to_scipy().tocsr()
    if perm is not None:
        Ssp = Ssp[perm]
    E = CSRMatrix.from_scipy(Ssp.tocsr()).to_ell(dtype=dtype, row_pad=1)
    r, k = E.data.shape
    if r < n_padded:
        pad = n_padded - r
        data = jnp.concatenate([E.data, jnp.zeros((pad, k), E.data.dtype)])
        cols = jnp.concatenate([E.cols, jnp.zeros((pad, k), E.cols.dtype)])
    else:
        data, cols = E.data[:n_padded], E.cols[:n_padded]
    return EllMatrix(data=data, cols=cols, shape=(n_padded, Ssp.shape[1]))


def dist_transient_gmres(
    mna,
    mesh: Mesh,
    tstep: Optional[float] = None,
    tstop: Optional[float] = None,
    x0: Optional[np.ndarray] = None,
    *,
    precond: str = "jacobi",
    dtype=jnp.float32,
    tol: float = 1e-6,
    restart: int = 32,
    maxiter: int = 2000,
    axis: str = "rows",
    comm: str = "halo",
    dc_method: str = "direct",
    equilibrate: bool = True,
    chunk_steps: int = 256,
    refine: bool = False,
) -> DistTransientResult:
    """Run the full-MNA transient row-sharded over ``mesh``.

    The A = G + C/h operator, the C/h recurrence operator, and the Krylov
    state are partitioned with one shared RowPartition (RCM + balanced
    blocks); per-step solves warm-start from the sharded previous state.
    ``precond``: jacobi | ainv (shard-aligned block AINV, comm-free apply) |
    ilu0/iluk (block-Jacobi ILU) | ilutp/ilupp (block-Jacobi ILUTP: per-
    shard pivoting spilu, MyILUPP's distributed counterpart) |
    saddle/auto (constraint-Schur). Ports are extracted per step with one tiny
    psum. Raises ValueError on netlists without a ``.tran`` directive.

    ``equilibrate``: Ruiz-scale the whole recurrence first (Dr A Dc, Dr Ch
    Dc, Dr B; x' = x/dc). A pure diagonal scaling commutes with row
    sharding (no permutation, so the partition/halo machinery is
    untouched) and rescues the block preconditioners on MNA saddle-point
    rows, exactly as SystemTransform does for the single-chip engine.
    Host-side f64 rebuild cost is reported in ``stats["equilibrate_s"]``.

    ``dc_method``: "gmres" seeds the transient from a device GMRES DC solve
    (the reference's GPU engine likewise solves DC on-device before the
    time loop, mna_solve_gpu_gmres.cpp:529-538); "direct" = host sparse LU,
    whose fill dominates setup at multi-million nodes (measured 669 s at
    2.1M, MEASUREMENTS r3).

    ``chunk_steps``: dispatch the scan in segments of this many steps
    (0 = one program over all steps). Bounds per-dispatch device time —
    long transients in one XLA program trip the TPU runtime watchdog; the
    single-chip engine chunks for the same reason (models/thermal.py).

    ``refine``: mixed-precision iterative refinement (GMRES-IR) on the
    mesh — sharded f64 state/rhs and one f64 true-residual SpMV per
    restart (row-local work + the same psum as every other dot) around
    the ``dtype`` Arnoldi inner loop. The distributed lift of the
    single-chip default (VERDICT r4 #4); requires x64 mode.
    """
    from gmres_tpu.models.dc import dc_solve
    from gmres_tpu.models.transient import _prep

    import time as _time

    stats = {}
    h, stop, U, times, A, Ch = _prep(mna, tstep, tstop)
    t0 = _time.perf_counter()
    x_host = dc_solve(mna, method=dc_method) if x0 is None else np.asarray(x0)
    stats["dc_s"] = _time.perf_counter() - t0
    ports = mna.ports if mna.ports.size else np.arange(
        min(mna.num_nodes, 16))

    B = mna.B
    dc_scale = None
    if equilibrate:
        from gmres_tpu.precond.milu import ruiz_equilibrate

        t0 = _time.perf_counter()
        dr, dc_scale = ruiz_equilibrate(A)
        scale = lambda S, c=True: CSRMatrix.from_scipy(
            (S.to_scipy().astype(np.float64).multiply(dr[:, None])
             .multiply(dc_scale[None, :] if c else 1.0)).tocsr())
        A = scale(A)
        Ch = scale(Ch)
        B = CSRMatrix.from_scipy(
            B.to_scipy().astype(np.float64).multiply(dr[:, None]).tocsr())
        x_host = np.asarray(x_host, np.float64) / dc_scale
        stats["equilibrate_s"] = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    base = DistGmresSolver(A, mesh, precond=precond, dtype=dtype,
                           restart=restart, tol=tol, maxiter=maxiter,
                           axis=axis, comm=comm)
    part = base.part
    # C/h shares A's sparsity envelope -> same halo machinery; columns are
    # state indices, so permute BOTH rows and cols by the partition order.
    from gmres_tpu.parallel.dist_gmres import RowShardedOp, build_halo_op

    Chp = Ch.permute(part.perm) if part.perm is not None else Ch
    ell_ch = _row_ell(Chp, None, part.n_padded, dtype)
    # global-cols ELL over the padded square layout
    ell_ch = EllMatrix(data=ell_ch.data, cols=ell_ch.cols,
                       shape=(part.n_padded, part.n_padded))
    Chop = None
    if comm == "halo":
        Chop = build_halo_op(ell_ch, part, axis)
    if Chop is None:
        Chop = RowShardedOp(ell_ch, axis)
    Bop = ReplicatedColsOp(ell=_row_ell(B, part.perm, part.n_padded, dtype))

    hi_ops = None
    if refine:
        import jax as _jax

        if not _jax.config.jax_enable_x64:
            raise RuntimeError(
                "dist_transient_gmres(refine=True) requires x64 mode; "
                "call jax.config.update('jax_enable_x64', True) at startup")
        Apm = A.permute(part.perm) if part.perm is not None else A
        ell_a64 = _row_ell(Apm, None, part.n_padded, jnp.float64)
        ell_a64 = EllMatrix(data=ell_a64.data, cols=ell_a64.cols,
                            shape=(part.n_padded, part.n_padded))
        A_hi = (build_halo_op(ell_a64, part, axis) if comm == "halo"
                else None) or RowShardedOp(ell_a64, axis)
        ell_c64 = _row_ell(Chp, None, part.n_padded, jnp.float64)
        ell_c64 = EllMatrix(data=ell_c64.data, cols=ell_c64.cols,
                            shape=(part.n_padded, part.n_padded))
        Ch_hi = (build_halo_op(ell_c64, part, axis) if comm == "halo"
                 else None) or RowShardedOp(ell_c64, axis)
        B_hi = ReplicatedColsOp(
            ell=_row_ell(B, part.perm, part.n_padded, jnp.float64))
        hi_ops = (A_hi, B_hi, Ch_hi)

    # ports in permuted coordinates; extraction via masked local gather +
    # psum (each port lives on exactly one shard)
    if part.perm is not None:
        inv = np.empty(part.n, dtype=np.int64)
        inv[part.perm] = np.arange(part.n)
        ports_p = inv[np.asarray(ports)]
    else:
        ports_p = np.asarray(ports)
    rpd = part.rows_per_dev
    ports_arr = jnp.asarray(ports_p, jnp.int32)

    stats["solver_setup_s"] = _time.perf_counter() - t0
    hi = jnp.float64 if hi_ops is not None else dtype
    Ud = jnp.asarray(U, dtype=hi)
    if hi_ops is None:
        x0d = base.device_rhs(x_host)
    else:
        xp = part.pad_permute(np.asarray(x_host, np.float64))
        x0d = jax.device_put(jnp.asarray(xp, jnp.float64),
                             NamedSharding(mesh, P(axis)))
    tol_d = jnp.asarray(tol, dtype)

    vec_spec = P(axis)
    rep = P()
    in_specs = (rep, vec_spec, rep, rep,
                row_specs(base.Aop, axis), row_specs(base.Ml, axis),
                row_specs(Chop, axis), row_specs(Bop, axis),
                row_specs(hi_ops, axis))
    out_specs = (vec_spec, rep, rep, rep, rep)

    def body(U_r, x_l, tol_, ports_r, Aop, Ml, Chl, Bl, Hi):
        me = lax.axis_index(axis)

        def step(x, u_t):
            if hi_ops is not None:
                A_hi, B_hi, Ch_hi = Hi
                rhs = B_hi(u_t) + Ch_hi(x)
                res = _gmres_impl(
                    rhs, x, tol_, Aop, Ml, identity,
                    restart=restart, maxiter=maxiter, dot_dtype=None,
                    axis=axis, A_hi=A_hi, work_dtype=dtype,
                )
            else:
                rhs = Bl(u_t) + Chl(x)
                res = _gmres_impl(
                    rhs, x, tol_, Aop, Ml, identity,
                    restart=restart, maxiter=maxiter, dot_dtype=None,
                    axis=axis,
                )
            mine = (ports_r // rpd) == me
            loc = jnp.where(mine, ports_r % rpd, 0)
            pv = jnp.where(mine, res.x[loc], 0.0)
            pv = lax.psum(pv, axis)
            return res.x, (pv, res.iterations, res.residual, res.converged)

        x_f, (PV, it, rs, cv) = lax.scan(step, x_l, U_r)
        return x_f, PV, it, rs, cv

    runner = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))
    # Chunked dispatch: the final sharded state is the carry between
    # segments; the tail segment is padded so only one program compiles
    # (same pattern as the single-chip chunking, models/thermal.py).
    nsteps = Ud.shape[0]
    t0 = _time.perf_counter()
    if chunk_steps and nsteps > chunk_steps:
        cs = int(chunk_steps)
        outs = []
        xc = x0d
        for k0 in range(0, nsteps, cs):
            seg = Ud[k0: k0 + cs]
            real = seg.shape[0]
            if real < cs:
                seg = jnp.concatenate(
                    [seg, jnp.repeat(seg[-1:], cs - real, axis=0)], axis=0)
            xc, PVc, itc, rsc, cvc = runner(seg, xc, tol_d, ports_arr,
                                            base.Aop, base.Ml, Chop, Bop,
                                            hi_ops)
            outs.append((PVc[:real], itc[:real], rsc[:real], cvc[:real]))
        PV = jnp.concatenate([o[0] for o in outs], axis=0)
        it = jnp.concatenate([o[1] for o in outs], axis=0)
        rs = jnp.concatenate([o[2] for o in outs], axis=0)
        cv = jnp.concatenate([o[3] for o in outs], axis=0)
    else:
        _, PV, it, rs, cv = runner(Ud, x0d, tol_d, ports_arr,
                                   base.Aop, base.Ml, Chop, Bop, hi_ops)
    stats["transient_s"] = _time.perf_counter() - t0
    PV = np.asarray(PV, np.float64)
    if dc_scale is not None:
        PV = PV * dc_scale[np.asarray(ports)][None, :]
    return DistTransientResult(
        times=times,
        port_values=PV,
        iterations=np.asarray(it),
        residuals=np.asarray(rs),
        converged=bool(np.asarray(cv).all()),
        comm=base.comm,
        stats=stats,
    )
