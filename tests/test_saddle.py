"""Constraint-Schur preconditioner (precond/saddle.py): exact elimination
of zero-diagonal MNA branch rows over AINV on the grounded block — the
auto choice for saddle-point systems (no trisolves, no reordering)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.spmv import device_operator
from gmres_tpu.precond import make_preconditioner
from gmres_tpu.precond.saddle import SaddlePrecond, branch_rows, saddle
from gmres_tpu.solvers.gmres import gmres

from test_decouple import pg_mna_with_vsrc


def test_branch_row_detection():
    A = pg_mna_with_vsrc(nx=10, nv=3)
    J = branch_rows(A)
    assert J.size == 3 and (J >= 100).all()


def test_exact_elimination_with_exact_inner_solver():
    """With Mg = Agg^-1 exactly, the preconditioner IS A^-1: GMRES must
    converge in one iteration."""
    import scipy.sparse.linalg as spla

    A = pg_mna_with_vsrc(nx=8, nv=2)
    M = saddle(A, drop_tol=0.0, dtype=jnp.float64, block_size=0)
    # drop_tol=0 AINV is exact on small systems
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    z = np.asarray(M(jnp.asarray(b)))
    z_ref = spla.spsolve(A.to_scipy().tocsr(), b)
    np.testing.assert_allclose(z, z_ref, rtol=1e-8, atol=1e-10)


def test_gmres_converges_on_saddle_mna():
    A = pg_mna_with_vsrc(nx=24, nv=6)
    b = np.random.default_rng(1).standard_normal(A.shape[0])
    M = make_preconditioner("saddle", A, dtype=jnp.float64)
    assert isinstance(M, SaddlePrecond)
    r = gmres(device_operator(A, dtype=jnp.float64), jnp.asarray(b),
              restart=32, tol=1e-9, maxiter=3000, M_left=M)
    assert bool(r.converged)
    tru = np.linalg.norm(b - A.to_scipy() @ np.asarray(r.x)) / \
        np.linalg.norm(b)
    assert tru < 1e-8


def test_falls_back_to_ainv_on_grounded_system():
    from gmres_tpu.precond.ainv import AinvPrecond

    from conftest import poisson2d

    M = saddle(poisson2d(10), dtype=jnp.float64)
    assert isinstance(M, AinvPrecond)


def test_flagship_transient_with_saddle_matches_oracle(tmp_path):
    from gmres_tpu.frontend.fixtures import write_pg_netlist
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.transient import transient_direct, transient_gmres

    net = tmp_path / "pg.sp"
    write_pg_netlist(net, nx=16, layers=2, pad_pitch=8,
                     tstep=1e-10, tstop=5e-10)
    mna = load_netlist(str(net))
    res = transient_gmres(mna, tol=1e-8, dtype=jnp.float64)  # auto->saddle
    assert res.stats["converged"]
    ref = transient_direct(mna)
    np.testing.assert_allclose(res.port_values, ref.port_values,
                               rtol=1e-5, atol=1e-9)
