"""Distributed GMRES on the virtual 8-device CPU mesh: correctness vs the
single-chip path and vs SciPy (SURVEY.md §4's multi-host oracle: same
solution on 1 chip vs N chips)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmres_tpu.parallel import DistGmresSolver, make_mesh, partition_rows
from gmres_tpu.parallel.dist_gmres import RowShardedOp
from gmres_tpu.precond import ainv, jacobi
from gmres_tpu.solvers.gmres import gmres

from conftest import poisson2d, random_sparse


def test_partition_roundtrip():
    A = poisson2d(9)
    part, ell, Ap = partition_rows(A, ndev=4)
    v = np.random.default_rng(0).standard_normal(A.shape[0])
    assert np.allclose(part.unpad_unpermute(part.pad_permute(v)), v)
    assert part.n_padded % 4 == 0


def test_partitioned_spmv_matches():
    A = random_sparse(70, 0.08, seed=2)
    part, ell, Ap = partition_rows(A, ndev=4, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(70)
    xp = part.pad_permute(x)
    from gmres_tpu.ops.spmv import ell_spmv

    y = part.unpad_unpermute(np.asarray(ell_spmv(ell, jnp.asarray(xp))))
    assert np.allclose(y, A.matvec(x), atol=1e-10)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_dist_solve_matches_scipy(ndev):
    A = poisson2d(10)
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    x_ref = np.linalg.solve(A.to_dense(), b)
    mesh = make_mesh(n_rows=ndev, n_batch=1)
    s = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                        restart=30, tol=1e-10, maxiter=5000)
    res = s.solve(b)
    assert bool(res.converged)
    assert np.linalg.norm(res.x - x_ref) / np.linalg.norm(x_ref) < 1e-7


def test_dist_ainv_precond():
    A = random_sparse(90, 0.06, seed=4, diag_boost=3.0)
    b = np.random.default_rng(1).standard_normal(90)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond="ainv", dtype=jnp.float64,
                        restart=30, tol=1e-9, maxiter=3000)
    res = s.solve(b)
    assert bool(res.converged)
    r = b - A.matvec(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_dist_matches_single_chip_iterations():
    """Row-sharding must not change the math: iteration counts agree with the
    single-device solver on the same (permuted) system."""
    A = poisson2d(8)
    n = A.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond=None, reorder=False,
                        dtype=jnp.float64, restart=25, tol=1e-8, maxiter=2000)
    res_d = s.solve(b)
    res_1 = gmres(A.to_ell(dtype=jnp.float64), jnp.asarray(b), restart=25,
                  tol=1e-8, maxiter=2000)
    assert bool(res_d.converged) and bool(res_1.converged)
    assert abs(int(res_d.iterations) - int(res_1.iterations)) <= 1


def test_batched_distributed_solve():
    A = poisson2d(9)
    n = A.shape[0]
    mesh = make_mesh(n_rows=4, n_batch=2)
    s = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                        restart=30, tol=1e-10, maxiter=3000)
    rng = np.random.default_rng(5)
    B = rng.standard_normal((5, n))  # pads to 6 = multiple of batch axis
    res = s.solve_batch(B)
    assert res.x.shape == (5, n)
    for i in range(5):
        r = B[i] - A.matvec(res.x[i])
        assert np.linalg.norm(r) / np.linalg.norm(B[i]) < 1e-8


def test_batched_unequal_cycle_counts():
    """Round-1 multichip deadlock regression (VERDICT Weak #1): batch shards
    that converge in *different* numbers of restart cycles must not desync
    the mesh collectives. RHS are engineered: a zero vector (0 cycles), an
    easy near-nullspace-free vector, and a hard random one (many cycles at
    restart=8) — each lands on its own batch group over two solve calls."""
    A = poisson2d(10)
    n = A.shape[0]
    rng = np.random.default_rng(9)
    # exact eigenvector of the 2-D Dirichlet Laplacian (constant diagonal,
    # so Jacobi preserves it): Krylov space has dimension 1 → one cycle.
    s1 = np.sin(np.pi * np.arange(1, 11) / 11)
    easy = np.outer(s1, s1).ravel()
    hard = rng.standard_normal(n)           # needs many restart cycles
    zero = np.zeros(n)
    mesh = make_mesh(n_rows=4, n_batch=2)
    s = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                        restart=8, tol=1e-10, maxiter=4000, comm="halo")
    assert s.comm == "HaloShardedOp"        # the op whose ppermute deadlocked
    # zero paired with hard: one batch group finishes at cycle 0, the other
    # keeps issuing halo ppermutes — the exact round-1 failure shape.
    res = s.solve_batch(np.stack([zero, hard, easy, hard]))
    restarts = np.asarray(res.restarts)
    assert restarts[0] == 0
    assert restarts[1] > restarts[2] > 0    # genuinely different trip counts
    assert np.allclose(res.x[0], 0.0)
    for i, b in [(1, hard), (2, easy), (3, hard)]:
        r = b - A.matvec(res.x[i])
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
    # converged results must be unaffected by lockstep masking
    assert bool(np.all(res.converged))


def test_gmres_batched_helper():
    from gmres_tpu.solvers.gmres import gmres_batched

    A = poisson2d(8)
    n = A.shape[0]
    B = np.random.default_rng(6).standard_normal((4, n))
    res = gmres_batched(A.to_ell(dtype=jnp.float64), jnp.asarray(B),
                        restart=30, tol=1e-9, maxiter=2000)
    assert bool(res.converged.all())
    for i in range(4):
        r = B[i] - A.matvec(np.asarray(res.x[i]))
        assert np.linalg.norm(r) / np.linalg.norm(B[i]) < 1e-7


def test_halo_matches_all_gather():
    A = poisson2d(12)
    n = A.shape[0]
    b = np.random.default_rng(7).standard_normal(n)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s_h = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                          restart=30, tol=1e-10, maxiter=4000, comm="halo")
    s_g = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                          restart=30, tol=1e-10, maxiter=4000,
                          comm="all_gather")
    assert s_h.comm == "HaloShardedOp"
    assert s_g.comm == "RowShardedOp"
    r_h = s_h.solve(b)
    r_g = s_g.solve(b)
    assert bool(r_h.converged) and bool(r_g.converged)
    assert int(r_h.iterations) == int(r_g.iterations)
    assert np.allclose(r_h.x, r_g.x, atol=1e-9)
    x_ref = np.linalg.solve(A.to_dense(), b)
    assert np.linalg.norm(r_h.x - x_ref) / np.linalg.norm(x_ref) < 1e-7


def test_halo_fallback_when_band_too_wide():
    # random matrix without reordering: footprint spans everything
    A = random_sparse(64, 0.2, seed=8)
    mesh = make_mesh(n_rows=8, n_batch=1)
    s = DistGmresSolver(A, mesh, precond=None, reorder=False,
                        dtype=jnp.float64, comm="halo", tol=1e-8,
                        maxiter=2000, restart=30)
    assert s.comm == "RowShardedOp"  # fell back
    b = np.random.default_rng(0).standard_normal(64)
    r = s.solve(b)
    assert bool(r.converged)


def test_block_aligned_ainv_is_comm_free():
    """DistGmresSolver('ainv') aligns block-Jacobi AINV blocks with the row
    shards, so the preconditioner apply needs zero collectives."""
    from gmres_tpu.parallel.dist_gmres import (DistAinvPrecond,
                                               LocalShardedOp)

    A = poisson2d(16)  # 256 rows -> 64/shard
    b = np.random.default_rng(4).standard_normal(256)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond="ainv", dtype=jnp.float64,
                        restart=30, tol=1e-9, maxiter=3000)
    assert isinstance(s.Ml, DistAinvPrecond)
    assert isinstance(s.Ml.Z, LocalShardedOp)
    assert isinstance(s.Ml.Wt, LocalShardedOp)
    res = s.solve(b)
    assert bool(res.converged)
    r = b - A.matvec(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


@pytest.mark.parametrize("name", ["ilu0", "iluk"])
def test_dist_block_ilu(name):
    """Block-Jacobi ILU: per-shard diagonal-block factorization with a
    comm-free level-scheduled apply; must converge and beat Jacobi."""
    A = poisson2d(16)
    n = A.shape[0]
    b = np.random.default_rng(6).standard_normal(n)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond=name, dtype=jnp.float64,
                        restart=30, tol=1e-9, maxiter=3000)
    from gmres_tpu.parallel.dist_gmres import DistBlockIluPrecond

    assert isinstance(s.Ml, DistBlockIluPrecond)
    res = s.solve(b)
    assert bool(res.converged)
    r = b - A.matvec(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    s_j = DistGmresSolver(A, mesh, precond="jacobi", dtype=jnp.float64,
                          restart=30, tol=1e-9, maxiter=3000)
    res_j = s_j.solve(b)
    assert int(res.iterations) < int(res_j.iterations)
