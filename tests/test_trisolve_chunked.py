"""ChunkedTriSolve (precond/trisolve.py): the bounded-padding level solve
that makes high-fill factors (ILUTP, SuperLU full LU) device-viable. Must be
EXACT (same dependency schedule as LevelTriSolve, different layout)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond.trisolve import (
    tri_solve_auto, tri_solve_chunked, tri_solve_levels, ChunkedTriSolve,
    LevelTriSolve,
)


def random_lower(n, density, seed, unit=False, wide_row=0):
    rng = np.random.default_rng(seed)
    L = sp.tril(sp.random(n, n, density=density, random_state=rng), k=-1)
    L = L.tolil()
    if wide_row:
        # one pathological wide row (the ELL-K blowup trigger)
        r = n - 2
        cols = rng.choice(r, size=min(wide_row, r), replace=False)
        for c in cols:
            L[r, c] = rng.standard_normal()
    L = L.tocsr()
    d = np.ones(n) if unit else rng.uniform(1.0, 2.0, n)
    return CSRMatrix.from_scipy((L + sp.diags(d)).tocsr())


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("chunk,k_cap", [(64, 4), (256, 8)])
def test_chunked_matches_scipy(lower, chunk, k_cap):
    n = 700
    T = random_lower(n, 0.01, seed=1, wide_row=80)
    if not lower:
        T = CSRMatrix.from_scipy(T.to_scipy().T.tocsr())
    b = np.random.default_rng(2).standard_normal(n)
    x_ref = sp.linalg.spsolve_triangular(
        T.to_scipy().tocsr(), b, lower=lower)
    s = tri_solve_chunked(T, lower=lower, dtype=jnp.float64,
                          k_cap=k_cap, chunk=chunk)
    x = np.asarray(s(jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_chunked_unit_diag_matches_levels():
    n = 400
    T = random_lower(n, 0.02, seed=3, unit=True)
    b = np.random.default_rng(4).standard_normal(n)
    lv = tri_solve_levels(T, lower=True, dtype=jnp.float64, unit_diag=True)
    ch = tri_solve_chunked(T, lower=True, dtype=jnp.float64, unit_diag=True)
    np.testing.assert_allclose(np.asarray(ch(jnp.asarray(b))),
                               np.asarray(lv(jnp.asarray(b))),
                               rtol=1e-12, atol=1e-13)


def test_auto_routes_by_blowup():
    # benign banded factor -> dense level layout
    n = 256
    band = sp.diags([np.ones(n - 1), np.ones(n)], [-1, 0]).tocsr()
    T = CSRMatrix.from_scipy(band)
    assert isinstance(tri_solve_auto(T, lower=True), LevelTriSolve)
    # pathological: one wide row + skewed levels -> chunked layout
    Tp = random_lower(2000, 0.002, seed=5, wide_row=1500)
    assert isinstance(tri_solve_auto(Tp, lower=True), ChunkedTriSolve)
    # both must agree with scipy
    b = np.random.default_rng(6).standard_normal(2000)
    x = np.asarray(tri_solve_auto(Tp, lower=True, dtype=jnp.float64)(
        jnp.asarray(b)))
    x_ref = sp.linalg.spsolve_triangular(Tp.to_scipy().tocsr(), b,
                                         lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-11)


def test_empty_and_diag_only():
    n = 50
    T = CSRMatrix.from_scipy(sp.diags(np.full(n, 2.0)).tocsr())
    b = np.arange(n, dtype=np.float64)
    s = tri_solve_chunked(T, lower=True, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(s(jnp.asarray(b))), b / 2.0)
