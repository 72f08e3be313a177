"""Format round-trips and SpMV correctness vs the SciPy oracle.

Mirrors the reference's GPU-vs-CPU SpMV verification (src_thermal/main.cu:263-279:
relative L2 error < 1e-6, PASS/FAIL)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.ops.formats import COOMatrix, CSRMatrix
from gmres_tpu.ops.reorder import bandwidth, lower_levels, rcm_ordering, upper_levels
from gmres_tpu.ops.spmv import spmv

from conftest import poisson2d, random_sparse


def _relerr(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("maker", [lambda: poisson2d(7, 9),
                                   lambda: random_sparse(123, 0.05)])
@pytest.mark.parametrize("fmt", ["ell", "coo", "csr", "dia"])
def test_spmv_matches_scipy(maker, fmt):
    A = maker()
    n = A.shape[0]
    x = np.random.default_rng(0).standard_normal(n)
    y_ref = A.matvec(x)
    dev = {
        "ell": lambda: A.to_ell(dtype=jnp.float64),
        "coo": lambda: A.to_device_coo(dtype=jnp.float64),
        "csr": lambda: A.to_device_csr(dtype=jnp.float64),
        "dia": lambda: A.to_dia(dtype=jnp.float64, max_diags=4096),
    }[fmt]()
    y = spmv(dev, jnp.asarray(x))
    assert _relerr(y, y_ref) < 1e-12


def test_coo_duplicate_sum():
    A = COOMatrix([0, 0, 1], [0, 0, 1], [1.0, 2.0, 5.0], (2, 2)).to_csr()
    d = A.to_dense()
    assert d[0, 0] == 3.0 and d[1, 1] == 5.0 and A.nnz == 2


def test_ell_padding_alignment():
    A = random_sparse(50, 0.1)
    E = A.to_ell(row_pad=8, col_pad=4)
    assert E.nrows_padded % 8 == 0
    assert E.width % 4 == 0


def test_dense_roundtrip():
    A = random_sparse(40, 0.1)
    B = CSRMatrix.from_dense(A.to_dense())
    assert _relerr(B.to_dense(), A.to_dense()) == 0


def test_rcm_reduces_bandwidth():
    # random permutation of a banded matrix: RCM should recover a small band
    A = poisson2d(16)
    rng = np.random.default_rng(1)
    p = rng.permutation(A.shape[0])
    Ap = A.permute(p)
    perm = rcm_ordering(Ap)
    assert bandwidth(Ap.permute(perm)) < bandwidth(Ap)


def test_levels_are_valid_schedule():
    A = random_sparse(60, 0.08, seed=3)
    import scipy.sparse as sp

    L = CSRMatrix.from_scipy(sp.tril(A.to_scipy(), format="csr"))
    U = CSRMatrix.from_scipy(sp.triu(A.to_scipy(), format="csr"))
    lv = lower_levels(L)
    for i in range(L.shape[0]):
        cols = L.indices[L.indptr[i]:L.indptr[i + 1]]
        for j in cols[cols < i]:
            assert lv[j] < lv[i]
    uv = upper_levels(U)
    for i in range(U.shape[0]):
        cols = U.indices[U.indptr[i]:U.indptr[i + 1]]
        for j in cols[cols > i]:
            assert uv[j] < uv[i]


def test_vmap_spmv():
    import jax

    A = poisson2d(6)
    E = A.to_ell(dtype=jnp.float64)
    X = np.random.default_rng(0).standard_normal((5, A.shape[0]))
    Y = jax.vmap(lambda x: spmv(E, x))(jnp.asarray(X))
    Y_ref = np.stack([A.matvec(x) for x in X])
    assert _relerr(Y, Y_ref) < 1e-12
