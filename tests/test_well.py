"""WELL (windowed-ELL) format: packing, reference executor, and the Pallas
kernel in interpreter mode, all vs the SciPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.ops.well import to_well, well_spmv, well_spmv_reference

from conftest import poisson2d, random_sparse


def _pad_x(x, n_pad):
    out = np.zeros(n_pad, dtype=x.dtype)
    out[: len(x)] = x
    return out


@pytest.mark.parametrize("maker", [
    lambda: poisson2d(9),
    lambda: poisson2d(16, 5),
    lambda: random_sparse(300, 0.02, seed=1),
    lambda: random_sparse(130, 0.15, seed=2),
])
def test_reference_executor_matches_scipy(maker):
    A = maker()
    W = to_well(A, dtype=jnp.float64)
    n = A.shape[0]
    x = np.random.default_rng(0).standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, xp))[:n]
    ref = A.matvec(x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


@pytest.mark.parametrize("tps", [4, 16])
def test_pallas_kernel_interpret(tps):
    A = random_sparse(260, 0.03, seed=3)
    W = to_well(A, dtype=jnp.float64, tiles_per_step=tps)
    n = A.shape[0]
    x = np.random.default_rng(1).standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv(W, xp, interpret=True))[:n]
    ref = A.matvec(x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


def test_empty_rows_and_wide_rows():
    import scipy.sparse as sp
    from gmres_tpu.ops.formats import CSRMatrix

    rng = np.random.default_rng(4)
    n = 200
    # some empty rows, one very dense row spanning many windows
    rows = np.concatenate([rng.integers(0, n, 500), np.full(150, 77)])
    cols = np.concatenate([rng.integers(0, n, 500), rng.choice(n, 150, False)])
    vals = rng.standard_normal(len(rows))
    A = CSRMatrix.from_scipy(
        sp.csr_matrix((vals, (rows, cols)), shape=(n, n)))
    W = to_well(A, dtype=jnp.float64)
    x = rng.standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, xp))[:n]
    assert np.allclose(y, A.matvec(x), atol=1e-12)
    y2 = np.asarray(well_spmv(W, xp, interpret=True))[:n]
    assert np.allclose(y2, A.matvec(x), atol=1e-12)


def test_slot_utilization_reasonable_on_stencil():
    A = poisson2d(20)
    W = to_well(A, dtype=jnp.float32)
    slots = np.prod(W.vals.shape)
    util = A.nnz / slots
    # 5-point stencil after natural ordering: 3 windows/tile, ~2 slots used
    assert util > 0.05


def test_rectangular_tall():
    import scipy.sparse as sp
    from gmres_tpu.ops.formats import CSRMatrix

    rng = np.random.default_rng(5)
    n, m = 300, 40
    k = 200
    A = CSRMatrix.from_scipy(sp.csr_matrix(
        (rng.standard_normal(k),
         (rng.integers(0, n, k), rng.integers(0, m, k))), shape=(n, m)))
    W = to_well(A, dtype=jnp.float64)
    u = rng.standard_normal(m)
    up = jnp.asarray(_pad_x(u, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, up))[:n]
    assert np.allclose(y, A.matvec(u), atol=1e-12)
    y2 = np.asarray(well_spmv(W, up, interpret=True))[:n]
    assert np.allclose(y2, A.matvec(u), atol=1e-12)


def test_spmv_dispatch_well():
    from gmres_tpu.ops.spmv import spmv

    A = random_sparse(200, 0.04, seed=6)
    W = to_well(A, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(200)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(spmv(W, xp))[:200]
    assert np.allclose(y, A.matvec(x), atol=1e-12)
