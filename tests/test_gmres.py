"""GMRES correctness vs SciPy (the reference's CPU-vs-GPU cross-check role,
src_thermal/main.cu:460-527)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmres_tpu.solvers.gmres import gmres, gmres_solver

from conftest import poisson2d, random_sparse


def _true_relres(A, x, b):
    r = b - A.matvec(np.asarray(x))
    return np.linalg.norm(r) / np.linalg.norm(b)


def test_unpreconditioned_poisson():
    A = poisson2d(10)
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    E = A.to_ell(dtype=jnp.float64)
    res = gmres(E, jnp.asarray(b), restart=30, tol=1e-8, maxiter=5000)
    assert bool(res.converged)
    assert _true_relres(A, res.x, b) < 1e-7
    assert int(res.iterations) > 0


def test_matches_scipy_solution():
    A = random_sparse(80, 0.06, seed=5)
    b = np.random.default_rng(1).standard_normal(80)
    x_ref = np.linalg.solve(A.to_dense(), b)
    res = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=40,
                tol=1e-12, maxiter=2000)
    assert np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_restart_smaller_than_needed():
    A = poisson2d(12)
    n = A.shape[0]
    b = np.ones(n)
    res = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=8,
                tol=1e-6, maxiter=20000)
    assert bool(res.converged)
    assert int(res.restarts) > 1
    assert _true_relres(A, res.x, b) < 1e-5


def test_initial_guess_exact():
    A = poisson2d(6)
    n = A.shape[0]
    x_true = np.random.default_rng(2).standard_normal(n)
    b = A.matvec(x_true)
    res = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b),
                x0=jnp.asarray(x_true), tol=1e-10)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_zero_rhs():
    A = poisson2d(5)
    res = gmres(A.to_ell(dtype=jnp.float64), jnp.zeros(25), tol=1e-8)
    assert bool(res.converged)
    assert float(jnp.linalg.norm(res.x)) == 0.0


def test_float32_path():
    A = poisson2d(8)
    b = np.random.default_rng(3).standard_normal(64).astype(np.float32)
    res = gmres(A.to_ell(dtype=jnp.float32), jnp.asarray(b), restart=30,
                tol=1e-5, maxiter=5000)
    assert bool(res.converged)
    assert _true_relres(A, res.x, b) < 1e-4


def test_vmap_batched_solve():
    A = poisson2d(7)
    n = A.shape[0]
    E = A.to_ell(dtype=jnp.float64)
    B = np.random.default_rng(4).standard_normal((4, n))
    sol = jax.vmap(lambda b: gmres(E, b, restart=30, tol=1e-8, maxiter=2000).x)(
        jnp.asarray(B)
    )
    for i in range(4):
        assert _true_relres(A, sol[i], B[i]) < 1e-6


def test_solver_object_reuse():
    A = random_sparse(60, 0.08, seed=9)
    s = gmres_solver(A.to_ell(dtype=jnp.float64), restart=30, tol=1e-9,
                     maxiter=2000)
    for seed in range(3):
        b = np.random.default_rng(seed).standard_normal(60)
        r = s.solve(jnp.asarray(b))
        assert bool(r.converged)
        assert _true_relres(A, r.x, b) < 1e-7


def test_jit_wrapped():
    A = poisson2d(6)
    E = A.to_ell(dtype=jnp.float64)
    b = jnp.ones(36, dtype=jnp.float64)

    @jax.jit
    def solve(b):
        return gmres(E, b, restart=20, tol=1e-8, maxiter=1000).x

    x = solve(b)
    assert _true_relres(A, x, np.ones(36)) < 1e-6


def test_residual_history():
    A = poisson2d(10)
    b = np.ones(A.shape[0])
    res = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=10,
                tol=1e-8, maxiter=2000, track_history=True)
    assert bool(res.converged)
    h = np.asarray(res.history)
    k = int(res.restarts)
    assert np.isfinite(h[:k]).all() and np.isnan(h[k:]).all()
    # monotone-ish decrease: final recorded residual is the smallest
    assert h[k - 1] == np.nanmin(h[:k])


def test_gmres_ir_beats_f32_floor():
    # Mixed-precision iterative refinement: f32 inner loop + f64 true
    # residuals must converge to 1e-11 relative, far below what plain f32
    # GMRES can reach (~1e-6).
    import jax.numpy as jnp
    import numpy as np
    from conftest import poisson2d
    from gmres_tpu.solvers.gmres import gmres

    A = poisson2d(24)
    n = A.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    A32 = A.to_ell(dtype=jnp.float32)
    A64 = A.to_ell(dtype=jnp.float64)
    b32 = jnp.asarray(b, jnp.float32)

    plain = gmres(A32, b32, restart=30, tol=1e-11, maxiter=5000)
    r = b - A.to_scipy() @ np.asarray(plain.x, np.float64)
    rel_plain = np.linalg.norm(r) / np.linalg.norm(b)

    # b stays f64 so refinement targets the unrounded rhs; inner loop f32
    ir = gmres(A32, jnp.asarray(b), restart=30, tol=1e-11, maxiter=5000,
               A_hi=A64, work_dtype=jnp.float32)
    assert ir.x.dtype == jnp.float64
    r = b - A.to_scipy() @ np.asarray(ir.x)
    rel_ir = np.linalg.norm(r) / np.linalg.norm(b)
    assert rel_ir < 1e-11, rel_ir
    assert rel_plain > 1e-8  # the floor plain f32 is stuck at
    assert bool(ir.converged)
