"""Preconditioner correctness + effectiveness (they must cut iteration counts,
the oracle the reference uses in its §V comparisons)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond import ainv, ilu0, iluk, jacobi, make_preconditioner
from gmres_tpu.precond.ainv import ainv_factor
from gmres_tpu.precond.ilu import ilu0_factor, iluk_factor
from gmres_tpu.precond.trisolve import tri_solve_levels, tri_solve_sweeps
from gmres_tpu.solvers.gmres import gmres

from conftest import poisson2d, random_sparse


def _iters(A, M=None, tol=1e-8, restart=30, side="left"):
    n = A.shape[0]
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    kw = {"M_left": M} if side == "left" else {"M_right": M}
    res = gmres(A.to_ell(dtype=jnp.float64), b, restart=restart, tol=tol,
                maxiter=5000, **kw)
    assert bool(res.converged), f"diverged: residual={float(res.residual)}"
    return int(res.iterations)


def test_ilu0_factor_exact_on_full_pattern():
    # On a dense-pattern matrix ILU(0) == exact LU.
    rng = np.random.default_rng(0)
    D = rng.standard_normal((12, 12)) + 12 * np.eye(12)
    A = CSRMatrix.from_dense(D)
    L, U = ilu0_factor(A)
    Ld = L.to_dense() + np.eye(12)
    Ud = U.to_dense()
    assert np.allclose(Ld @ Ud, D, atol=1e-10)


def test_ilu0_trisolve_roundtrip():
    A = poisson2d(9)
    L, U = ilu0_factor(A)
    n = A.shape[0]
    v = np.random.default_rng(1).standard_normal(n)
    ls = tri_solve_levels(L, lower=True, dtype=jnp.float64, unit_diag=True)
    us = tri_solve_levels(U, lower=False, dtype=jnp.float64)
    y = np.asarray(ls(jnp.asarray(v)))
    # check against scipy triangular solve
    Ld = L.to_dense() + np.eye(n)
    y_ref = np.linalg.solve(Ld, v)
    assert np.allclose(y, y_ref, atol=1e-10)
    x = np.asarray(us(jnp.asarray(y)))
    x_ref = np.linalg.solve(U.to_dense(), y_ref)
    assert np.allclose(x, x_ref, atol=1e-8)


def test_sweeps_trisolve_approximates():
    A = poisson2d(8)
    L, U = ilu0_factor(A)
    n = A.shape[0]
    v = np.random.default_rng(2).standard_normal(n)
    ls = tri_solve_sweeps(L, lower=True, dtype=jnp.float64, unit_diag=True,
                          sweeps=n)  # exact after n sweeps
    Ld = L.to_dense() + np.eye(n)
    assert np.allclose(np.asarray(ls(jnp.asarray(v))), np.linalg.solve(Ld, v),
                       atol=1e-8)


@pytest.mark.parametrize("maker,name", [
    (lambda: poisson2d(12), "poisson"),
    (lambda: random_sparse(150, 0.04, seed=7, diag_boost=3.0), "random"),
])
def test_preconditioners_reduce_iterations(maker, name):
    A = maker()
    base = _iters(A)
    it_jac = _iters(A, jacobi(A, dtype=jnp.float64))
    it_ilu = _iters(A, ilu0(A, dtype=jnp.float64))
    it_ainv = _iters(A, ainv(A, drop_tol=0.05, dtype=jnp.float64))
    assert it_ilu < base
    assert it_ainv < base
    assert it_jac <= base + 5


def test_iluk_beats_ilu0_on_poisson():
    A = poisson2d(14)
    it0 = _iters(A, ilu0(A, dtype=jnp.float64))
    it2 = _iters(A, iluk(A, fill_level=3, dtype=jnp.float64))
    assert it2 <= it0


def test_right_preconditioning():
    A = random_sparse(100, 0.05, seed=11, diag_boost=4.0)
    M = ilu0(A, dtype=jnp.float64)
    it = _iters(A, M, side="right")
    assert it < _iters(A)


def test_ainv_factor_quality():
    # Z D^{-1} W^T should approximate A^{-1}: use it as a direct solver step
    # and check the residual shrinks a lot.
    A = poisson2d(8)
    Z, Wt, inv_d = ainv_factor(A, drop_tol=0.0)  # no dropping => exact inverse
    n = A.shape[0]
    Minv = Z.to_dense() @ np.diag(inv_d) @ Wt.to_dense()
    err = np.linalg.norm(Minv @ A.to_dense() - np.eye(n)) / n
    assert err < 1e-10


def test_ainv_blocked_quality():
    # Block-Jacobi AINV (independent per-block biconjugation) must still be
    # an effective preconditioner: fewer iterations than unpreconditioned,
    # within ~2x the iteration count of global AINV on a banded problem.
    A = poisson2d(16)  # 256 rows, bandwidth 16
    it_plain = _iters(A)
    M_global = ainv(A, drop_tol=0.05, dtype=jnp.float64, block_size=0)
    M_block = ainv(A, drop_tol=0.05, dtype=jnp.float64, block_size=64)
    it_g = _iters(A, M_global)
    it_b = _iters(A, M_block)
    assert it_b < it_plain
    assert it_b <= 2 * it_g
    # blocked factors are block-diagonal: no entry couples across a block edge
    Z, Wt, inv_d = ainv_factor(A, drop_tol=0.05, block_size=64)
    Zs = Z.to_scipy().tocoo()
    assert np.all((Zs.row // 64) == (Zs.col // 64))


def test_make_preconditioner_factory():
    A = poisson2d(6)
    assert make_preconditioner("none", A) is None
    for name in ["jacobi", "ilu0", "ainv"]:
        M = make_preconditioner(name, A, dtype=jnp.float64)
        v = jnp.ones(A.shape[0], dtype=jnp.float64)
        out = M(v)
        assert out.shape == v.shape


def test_ilutp_saddle_point():
    """ILUTP (threshold + pivoting, the ILU++ strength class) must handle
    MNA saddle-point rows that level-based ILU(k) struggles with
    (VERDICT r1 #5; strength data in benchmarks/precond_strength.py)."""
    import scipy.sparse as sp

    from gmres_tpu.precond import make_preconditioner
    from gmres_tpu.precond.milu import SystemTransform

    rng = np.random.default_rng(3)
    G = poisson2d(12).to_scipy() + 0.01 * sp.eye(144)
    nodes = rng.choice(144, 6, replace=False)
    Bv = sp.coo_matrix((np.ones(6), (nodes, np.arange(6))), shape=(144, 6))
    A = sp.bmat([[G, Bv], [Bv.T, sp.csr_matrix((6, 6))]], format="csr")
    Ac = CSRMatrix.from_scipy(A)
    tr = SystemTransform.build(Ac)
    App = tr.mat(Ac)
    M = make_preconditioner("ilutp", App, dtype=jnp.float64,
                            drop_tol=1e-5, fill_factor=20.0)
    b = tr.rhs_to(rng.standard_normal(150))
    res = gmres(App.to_ell(dtype=jnp.float64), jnp.asarray(b),
                restart=30, tol=1e-10, maxiter=500, M_left=M)
    assert bool(res.converged)
    assert int(res.iterations) < 40  # near-direct strength


def test_ilutp_matches_scipy_apply():
    """Device ILUTP apply == scipy spilu.solve on the same factors."""
    import scipy.sparse.linalg as spla

    from gmres_tpu.precond.ilu import ilutp

    A = random_sparse(80, 0.08, seed=9, diag_boost=4.0)
    M = ilutp(A, drop_tol=1e-6, fill_factor=30.0, dtype=jnp.float64)
    ref = spla.spilu(A.to_scipy().tocsc(), drop_tol=1e-6, fill_factor=30.0)
    v = np.random.default_rng(1).standard_normal(80)
    got = np.asarray(M(jnp.asarray(v)))
    assert np.allclose(got, ref.solve(v), atol=1e-10)


def test_auto_policy_amortized_cost_model():
    """'-precond auto' decision table (VERDICT r4 next #3): the policy
    must encode AMORTIZATION, not iteration counts alone — the r4 policy
    sent the 524K thermal transient to MG and lost 6-12x end-to-end to
    AINV. Pinned decisions:
      - warm transient at thermal scale (hundreds-thousands of steps):
        AINV (cheap applies beat O(1) contraction; the gcb512k case)
      - extremely long transients: MG (setup amortizes)
      - one-shot at scale: AINV on total time (BENCH_r04: MG's 33.7 s
        setup strictly dominates its 0.04 s solve; VERDICT r4 weak #7)
      - saddle-point MNA: saddle, regardless of steps
    """
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.precond import resolve_precond

    nx = 32  # 32768 rows: grid-structured, at the scale gate
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nx)
    A = CSRMatrix.from_scipy(
        (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(T, I), I) + 0.05 * sp.eye(nx ** 3)).tocsr())
    assert resolve_precond("auto", A, steps=100) == "ainv"
    # after the r5 exact-format level ops halved the MG build, the
    # amortization crossover at 32K rows moved from ~50K warm steps to
    # ~220 — 1000-step runs now rightly take mg
    assert resolve_precond("auto", A, steps=1000) == "mg"
    assert resolve_precond("auto", A, steps=50000) == "mg"
    assert resolve_precond("auto", A) == "ainv"          # one-shot
    assert resolve_precond("auto", A, steps=1) == "ainv"
    # the MEASURED gate case (thermal512k_auto_r5.log): 524K-row grid,
    # 64-step transient -> ainv beat mg 12.5 s vs 113-227 s end-to-end;
    # the policy must keep resolving it to ainv whatever the constants
    nx5 = 80  # 512000 rows
    e5 = np.ones(nx5)
    T5 = sp.diags([-e5[:-1], 2 * e5, -e5[:-1]], [-1, 0, 1])
    I5 = sp.eye(nx5)
    A5 = CSRMatrix.from_scipy(
        (sp.kron(sp.kron(I5, I5), T5) + sp.kron(sp.kron(I5, T5), I5)
         + sp.kron(sp.kron(T5, I5), I5) + 0.05 * sp.eye(nx5 ** 3)).tocsr())
    assert resolve_precond("auto", A5, steps=64) == "ainv"
    # explicit names pass through untouched
    assert resolve_precond("mg", A, steps=10) == "mg"
