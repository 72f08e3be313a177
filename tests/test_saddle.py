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


def test_contiguous_layout_uses_slices():
    """Natural MNA layout (branch rows = tail block) must take the
    slice-based apply: an explicit n-length gather costs ~12 ms at 2.1M on
    v5e even with identity indices (probe_saddle_parts r4), so the index
    arrays must be None and the apply must still match the gather-based
    general path."""
    import scipy.sparse as sp

    from gmres_tpu.precond.saddle import SaddlePrecond, saddle

    rng = np.random.default_rng(3)
    n, nj = 200, 4
    G = sp.random(n - nj, n - nj, 0.05, format="csr", random_state=3)
    G = G + G.T + sp.diags(np.abs(G).sum(axis=1).A1 + 1.0)
    A = sp.bmat([[G, sp.random(n - nj, nj, 0.3, random_state=4)],
                 [sp.random(nj, n - nj, 0.3, random_state=5), None]],
                format="csr")
    Acsr = CSRMatrix.from_scipy(A)
    M = saddle(Acsr, reorder=False)
    assert M.g_gather is None and M.g_scatter is None, "slices not used"
    # equality against a forced-gather clone of the same state
    gi = jnp.arange(n - nj, dtype=jnp.int32)
    ji = jnp.arange(n - nj, n, dtype=jnp.int32)
    sc = jnp.arange(n, dtype=jnp.int32)
    Mg_ = SaddlePrecond(Mg=M.Mg, Agj=M.Agj, Ajg=M.Ajg, MgAgj=M.MgAgj,
                        S_inv=M.S_inv, g_gather=gi, j_gather=ji,
                        g_scatter=sc, n=M.n, ng=M.ng)
    v = jnp.asarray(rng.standard_normal(n), jnp.float64)
    np.testing.assert_allclose(np.asarray(M(v)), np.asarray(Mg_(v)),
                               rtol=1e-12)


def test_mg_proxy_schur_solves_like_exact():
    """The two-level proxy Schur (saddle MG branch) must keep the solve in
    the same iteration class as the exact host-cycle Schur (measured at
    2.1M: 38 vs 10 iters, both orders below AINV's 1245). Built here at
    test scale by comparing against a saddle whose S comes from dense
    exact Mg columns."""
    import scipy.sparse.linalg as spla

    from gmres_tpu.frontend.fixtures import write_pg_netlist
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.transient import _prep
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond.mg import MgPrecond
    from gmres_tpu.precond.saddle import saddle
    from gmres_tpu.solvers.gmres import gmres
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "pg.sp")
        write_pg_netlist(p, nx=24, layers=2, pad_pitch=12,
                         tstep=1e-10, tstop=3e-10)
        mna = load_netlist(p)
    _, _, _, _, A, _ = _prep(mna, None, None)
    M = saddle(A, mg_min_n=64)
    assert isinstance(M.Mg, MgPrecond)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(A.shape[0])
    res = gmres(device_operator(A, dtype=jnp.float64),
                jnp.asarray(b, jnp.float64), M_left=M, tol=1e-8,
                restart=32, maxiter=3000)
    assert bool(res.converged), float(res.residual)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-6, err
    # iteration class sanity: far from the AINV-stall regime
    assert int(res.iterations) < 200, int(res.iterations)
