"""MILU (equilibrated + reordered split ILU) — the ILU++ wrapper parity."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond.milu import MiluSolver, ruiz_equilibrate
from gmres_tpu.solvers.gmres import gmres

from conftest import poisson2d, random_sparse


def _badly_scaled(n=150, seed=7, decades=3):
    """Diagonally dominant but with ~2*decades orders of row/col scaling."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.05, random_state=rng, format="csr")
    A = A + 4 * sp.eye(n)
    s = 10.0 ** rng.uniform(-decades, decades, n)
    return CSRMatrix.from_scipy(sp.diags(s) @ A @ sp.diags(1.0 / s))


def test_ruiz_normalizes():
    A = _badly_scaled()
    dr, dc = ruiz_equilibrate(A)
    S = A.to_scipy().multiply(dr[:, None]).tocsr().multiply(dc[None, :])
    rn = np.asarray(abs(S).max(axis=1).todense()).ravel()
    assert rn.max() / rn.min() < 10.0


def test_milu_solves_badly_scaled():
    A = _badly_scaled()
    n = A.shape[0]
    x_true = np.random.default_rng(0).standard_normal(n)
    b = A.matvec(x_true)
    s = MiluSolver(A, fill_level=1, dtype=jnp.float64, tol=1e-12,
                   restart=40, maxiter=5000)
    res = s.solve(b)
    assert bool(res.converged)
    # judge by the true residual in the original space (solution error is
    # amplified by the deliberate scaling/conditioning)
    r = b - A.matvec(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
    assert np.linalg.norm(res.x - x_true) / np.linalg.norm(x_true) < 1e-4


def test_milu_beats_plain_ilu_on_scaled():
    from gmres_tpu.precond import ilu0

    A = _badly_scaled(seed=9)
    n = A.shape[0]
    b = np.random.default_rng(1).standard_normal(n)
    s = MiluSolver(A, fill_level=0, dtype=jnp.float64, tol=1e-8,
                   restart=30, maxiter=4000)
    res_m = s.solve(b)
    assert bool(res_m.converged)
    res_p = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=30,
                  tol=1e-8, maxiter=4000, M_left=ilu0(A, dtype=jnp.float64))
    if bool(res_p.converged):
        assert int(res_m.iterations) <= int(res_p.iterations) + 5


def test_milu_warm_start_and_reuse():
    A = poisson2d(10)
    s = MiluSolver(A, fill_level=1, dtype=jnp.float64, tol=1e-10,
                   restart=30, maxiter=3000)
    b = np.random.default_rng(2).standard_normal(A.shape[0])
    r1 = s.solve(b)
    r2 = s.solve(b, x0=r1.x)
    assert bool(r1.converged) and bool(r2.converged)
    assert int(r2.iterations) <= 1
    assert np.allclose(r1.x, r2.x, atol=1e-8)
