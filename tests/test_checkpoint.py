"""Checkpoint/resume: interrupted transient must finish identically."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from gmres_tpu.models.thermal import thermal_transient
from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond import ilu0
from gmres_tpu.utils.checkpoint import (
    load_state, save_state, thermal_transient_checkpointed,
)

from conftest import poisson2d


def _system(nx=7, steps=20, h=1e-3, seed=0):
    rng = np.random.default_rng(seed)
    n = nx * nx
    G = poisson2d(nx).to_scipy() * 1e-2 + sp.eye(n) * 1e-3
    C = sp.diags(rng.uniform(1e-6, 1e-5, n))
    A = CSRMatrix.from_scipy((G + C / h).tocsr())
    Ch = CSRMatrix.from_scipy(sp.csr_matrix(C / h))
    m = 4
    cols = rng.choice(n, m, replace=False)
    B = CSRMatrix.from_scipy(
        sp.csr_matrix((np.ones(m), (cols, np.arange(m))), shape=(n, m)))
    U = rng.uniform(0, 1e-3, (steps, m))
    return A, B, Ch, U


def test_save_load_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_state(p, 7, np.arange(5.0), {"X": np.ones((3, 5))})
    step, x, outs = load_state(p)
    assert step == 7
    assert np.allclose(x, np.arange(5.0))
    assert outs["X"].shape == (3, 5)
    assert load_state(str(tmp_path / "missing.npz")) is None


def test_checkpointed_matches_uninterrupted(tmp_path):
    A, B, Ch, U = _system()
    M = ilu0(A, dtype=jnp.float64)
    kw = dict(restart=30, tol=1e-10, maxiter=2000, M_left=M,
              dtype=jnp.float64)
    ref = thermal_transient(A.to_ell(dtype=jnp.float64),
                            B.to_ell(dtype=jnp.float64),
                            Ch.to_ell(dtype=jnp.float64), U, **kw)
    ck = str(tmp_path / "ck.npz")
    got = thermal_transient_checkpointed(
        A.to_ell(dtype=jnp.float64), B.to_ell(dtype=jnp.float64),
        Ch.to_ell(dtype=jnp.float64), U,
        checkpoint_path=ck, chunk_steps=7, **kw)
    assert np.allclose(np.asarray(ref.X), got.X, atol=1e-12)


def test_resume_after_interruption(tmp_path):
    A, B, Ch, U = _system(steps=18)
    M = ilu0(A, dtype=jnp.float64)
    kw = dict(restart=30, tol=1e-10, maxiter=2000, M_left=M,
              dtype=jnp.float64)
    ck = str(tmp_path / "ck.npz")
    # phase 1: run only the first 12 steps (simulate dying mid-run)
    thermal_transient_checkpointed(
        A.to_ell(dtype=jnp.float64), B.to_ell(dtype=jnp.float64),
        Ch.to_ell(dtype=jnp.float64), U[:12],
        checkpoint_path=ck, chunk_steps=6, **kw)
    step, _, _ = load_state(ck)
    assert step == 12
    # phase 2: resume against the full schedule — completes remaining 6
    got = thermal_transient_checkpointed(
        A.to_ell(dtype=jnp.float64), B.to_ell(dtype=jnp.float64),
        Ch.to_ell(dtype=jnp.float64), U,
        checkpoint_path=ck, chunk_steps=6, **kw)
    ref = thermal_transient(A.to_ell(dtype=jnp.float64),
                            B.to_ell(dtype=jnp.float64),
                            Ch.to_ell(dtype=jnp.float64), U, **kw)
    assert got.X.shape == ref.X.shape
    assert np.allclose(np.asarray(ref.X), got.X, atol=1e-12)
