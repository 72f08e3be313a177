"""End-to-end thermal transient: GCB I/O round-trip + backward-Euler vs a
SciPy direct-solve oracle (the engine cross-check discipline of SURVEY.md §4)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from gmres_tpu.frontend.gcb import (
    GCBSystem, read_gcb, read_mtx, write_mtx, read_uvec, write_uvec,
)
from gmres_tpu.models.thermal import thermal_transient
from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond import ainv, ilu0

from conftest import poisson2d


def _make_system(nx=8, steps=12, num_inputs=5, h=1e-3, seed=0):
    rng = np.random.default_rng(seed)
    G = poisson2d(nx).to_scipy() * 1e-2 + sp.eye(nx * nx) * 1e-3
    n = nx * nx
    C = sp.diags(rng.uniform(1e-6, 1e-5, n))
    A = (G + C / h).tocsr()
    cols = rng.choice(n, size=num_inputs, replace=False)
    B = sp.csr_matrix(
        (np.ones(num_inputs), (cols, np.arange(num_inputs))), shape=(n, num_inputs)
    )
    U = rng.uniform(0.0, 1e-3, (num_inputs, steps))
    return GCBSystem(
        A=CSRMatrix.from_scipy(A),
        B=CSRMatrix.from_scipy(B),
        C=CSRMatrix.from_scipy(sp.csr_matrix(C)),
        U=U,
        t_step=h,
    )


def _oracle(sys_, x0=None):
    lu = spla.splu(sys_.A.to_scipy().tocsc())
    Ch = sys_.C_over_h().to_scipy()
    Bs = sys_.B.to_scipy()
    x = np.zeros(sys_.n) if x0 is None else x0.copy()
    out = []
    for k in range(sys_.num_steps):
        x = lu.solve(Bs @ sys_.U[:, k] + Ch @ x)
        out.append(x.copy())
    return np.stack(out)


def test_gcb_roundtrip(tmp_path):
    sys_ = _make_system()
    write_mtx(str(tmp_path / "A.mtx"), sys_.A)
    write_mtx(str(tmp_path / "B.mtx"), sys_.B)
    write_mtx(str(tmp_path / "C.mtx"), sys_.C)
    write_uvec(str(tmp_path / "u_vec.mtx"), sys_.U)
    (tmp_path / "t_step.mtx").write_text(f" {sys_.t_step:.7e}\n")
    back = read_gcb(str(tmp_path))
    assert np.allclose(back.A.to_dense(), sys_.A.to_dense(), rtol=1e-6)
    assert np.allclose(back.U, sys_.U, rtol=1e-6)
    assert np.isclose(back.t_step, sys_.t_step)


def test_transient_matches_direct_oracle():
    sys_ = _make_system()
    X_ref = _oracle(sys_)
    M = ilu0(sys_.A, dtype=jnp.float64)
    res = thermal_transient(
        sys_.A.to_ell(dtype=jnp.float64),
        sys_.B.to_ell(dtype=jnp.float64),
        sys_.C_over_h().to_ell(dtype=jnp.float64),
        sys_.U.T,
        restart=30, tol=1e-10, maxiter=3000, M_left=M, dtype=jnp.float64,
    )
    assert bool(res.converged.all())
    err = np.abs(np.asarray(res.X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 1e-6


def test_transient_float32_close():
    # "-single" path: f32 must track f64 closely (TVLSI §V: <=0.1C of double)
    sys_ = _make_system(seed=3)
    X_ref = _oracle(sys_)
    M = ainv(sys_.A, drop_tol=0.05, dtype=jnp.float32)
    res = thermal_transient(
        sys_.A.to_ell(dtype=jnp.float32),
        sys_.B.to_ell(dtype=jnp.float32),
        sys_.C_over_h().to_ell(dtype=jnp.float32),
        sys_.U.T,
        restart=30, tol=1e-6, maxiter=3000, M_left=M, dtype=jnp.float32,
    )
    err = np.abs(np.asarray(res.X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 1e-3


def test_transient_ports_only():
    sys_ = _make_system()
    ports = np.array([0, 7, 33], dtype=np.int32)
    M = ilu0(sys_.A, dtype=jnp.float64)
    res = thermal_transient(
        sys_.A.to_ell(dtype=jnp.float64),
        sys_.B.to_ell(dtype=jnp.float64),
        sys_.C_over_h().to_ell(dtype=jnp.float64),
        sys_.U.T,
        restart=30, tol=1e-10, maxiter=3000, M_left=M, dtype=jnp.float64,
        ports=ports,
    )
    X_ref = _oracle(sys_)
    assert res.X.shape == (sys_.num_steps, 3)
    assert np.allclose(np.asarray(res.X), X_ref[:, ports], atol=1e-8)


def test_transient_chunked_matches_single_dispatch():
    # chunk_steps segments carry the state exactly: identical trajectory,
    # iteration counts and per-step residuals vs the one-program path —
    # including a padded tail chunk (12 steps, chunks of 5 -> pad 3) and
    # port slicing.
    sys_ = _make_system(seed=5)
    M = ilu0(sys_.A, dtype=jnp.float64)
    ops = (sys_.A.to_ell(dtype=jnp.float64),
           sys_.B.to_ell(dtype=jnp.float64),
           sys_.C_over_h().to_ell(dtype=jnp.float64))
    kw = dict(restart=30, tol=1e-10, maxiter=3000, M_left=M,
              dtype=jnp.float64)
    ref = thermal_transient(*ops, sys_.U.T, **kw)
    seen = []
    res = thermal_transient(*ops, sys_.U.T, chunk_steps=5,
                            on_chunk=lambda done, x, r: seen.append(done),
                            **kw)
    assert seen == [5, 10, 12]
    assert np.array_equal(np.asarray(res.X), np.asarray(ref.X))
    assert np.array_equal(np.asarray(res.iterations),
                          np.asarray(ref.iterations))
    assert np.array_equal(np.asarray(res.converged), np.asarray(ref.converged))

    ports = np.array([1, 40], dtype=np.int32)
    ref_p = thermal_transient(*ops, sys_.U.T, ports=ports, **kw)
    res_p = thermal_transient(*ops, sys_.U.T, ports=ports, chunk_steps=5, **kw)
    assert np.array_equal(np.asarray(res_p.X), np.asarray(ref_p.X))
