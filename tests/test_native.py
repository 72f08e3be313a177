"""Native C++ host library vs the NumPy reference implementations."""

import numpy as np
import pytest
import scipy.sparse as sp

from gmres_tpu.native import (
    ainv_factor_native,
    ilu0_factor_native,
    iluk_factor_native,
    levels_native,
    load_library,
    rcm_native,
)
from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.reorder import bandwidth, lower_levels, upper_levels

from conftest import poisson2d, random_sparse

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)


def _numpy_ilu0(A):
    # run the pure-python path by making the native import fail
    from gmres_tpu.precond import ilu as ilu_mod

    n = A.shape[0]
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int64)
    data = A.data.astype(np.float64).copy()
    return ilu_mod._ilu0_core(A)


@pytest.mark.parametrize("maker", [lambda: poisson2d(10),
                                   lambda: random_sparse(150, 0.05, seed=1)])
def test_ilu0_matches_numpy(maker):
    A = maker()
    Ln, Un = ilu0_factor_native(A)
    Lr, Ur = _numpy_ilu0(A)
    assert np.allclose(Ln.to_dense(), Lr.to_dense(), atol=1e-12)
    assert np.allclose(Un.to_dense(), Ur.to_dense(), atol=1e-12)


def test_ilu0_exact_on_dense_pattern():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((15, 15)) + 15 * np.eye(15)
    A = CSRMatrix.from_dense(D)
    L, U = ilu0_factor_native(A)
    assert np.allclose((L.to_dense() + np.eye(15)) @ U.to_dense(), D,
                       atol=1e-10)


def test_iluk_improves_with_level():
    from gmres_tpu.solvers.gmres import gmres
    import jax.numpy as jnp
    from gmres_tpu.precond.trisolve import tri_solve_levels
    from gmres_tpu.precond.ilu import IluPrecond

    A = poisson2d(12)
    b = np.random.default_rng(0).standard_normal(A.shape[0])

    def iters(L, U):
        M = IluPrecond(
            lsolve=tri_solve_levels(L, lower=True, dtype=jnp.float64,
                                    unit_diag=True),
            usolve=tri_solve_levels(U, lower=False, dtype=jnp.float64),
        )
        r = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=30,
                  tol=1e-8, maxiter=3000, M_left=M)
        assert bool(r.converged)
        return int(r.iterations)

    it0 = iters(*iluk_factor_native(A, 0))
    it3 = iters(*iluk_factor_native(A, 3))
    assert it3 <= it0


def test_iluk_level0_equals_ilu0():
    A = random_sparse(80, 0.08, seed=3)
    L0, U0 = ilu0_factor_native(A)
    Lk, Uk = iluk_factor_native(A, 0)
    assert np.allclose(L0.to_dense(), Lk.to_dense(), atol=1e-12)
    assert np.allclose(U0.to_dense(), Uk.to_dense(), atol=1e-12)


def test_ainv_exact_no_dropping():
    A = poisson2d(7)
    n = A.shape[0]
    Z, Wt, invd = ainv_factor_native(A, 0.0)
    Minv = Z.to_dense() @ np.diag(invd) @ Wt.to_dense()
    assert np.linalg.norm(Minv @ A.to_dense() - np.eye(n)) / n < 1e-10


def test_ainv_preconditions():
    import jax.numpy as jnp
    from gmres_tpu.precond.ainv import AinvPrecond
    from gmres_tpu.solvers.gmres import gmres
    from gmres_tpu.ops.spmv import ell_spmv

    A = random_sparse(120, 0.05, seed=5, diag_boost=3.0)
    Z, Wt, invd = ainv_factor_native(A, 0.1)
    M = AinvPrecond(Z=Z.to_ell(dtype=jnp.float64),
                    Wt=Wt.to_ell(dtype=jnp.float64),
                    inv_d=jnp.asarray(invd))
    b = np.random.default_rng(0).standard_normal(120)
    r_pre = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=30,
                  tol=1e-8, maxiter=3000, M_left=M)
    r_no = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=30,
                 tol=1e-8, maxiter=3000)
    assert bool(r_pre.converged)
    assert int(r_pre.iterations) < int(r_no.iterations)


def test_rcm_reduces_bandwidth():
    A = poisson2d(16)
    p = np.random.default_rng(2).permutation(A.shape[0])
    Ap = A.permute(p)
    perm = rcm_native(Ap)
    assert sorted(perm) == list(range(A.shape[0]))
    assert bandwidth(Ap.permute(perm)) < bandwidth(Ap)


def test_levels_match_numpy():
    A = random_sparse(70, 0.08, seed=4)
    L = CSRMatrix.from_scipy(sp.tril(A.to_scipy(), format="csr"))
    U = CSRMatrix.from_scipy(sp.triu(A.to_scipy(), format="csr"))
    assert np.array_equal(levels_native(L, True), lower_levels(L))
    assert np.array_equal(levels_native(U, False), upper_levels(U))
