"""Geometric multigrid preconditioner (precond/mg.py).

The reference has no multigrid (preconditioner.h hierarchy tops out at
ILU/AINV); mg.py is the TPU-native escalation for grid-structured
operators. Oracles: device reshape transfers must equal the host P/Pᵀ the
coarse operators were built with; GMRES iteration counts must beat Jacobi
by a wide margin; the saddle wrapper with an MG core must match the
direct-LU transient."""

import numpy as np
import pytest

import jax.numpy as jnp
import scipy.sparse as sp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.precond.mg import (MgPrecond, _prolong_scipy, infer_grid,
                                  mg)


def _poisson3d(nx, ny=None, nz=None, shift=0.01):
    ny = ny or nx
    nz = nz or nx

    def lap1(m):
        e = np.ones(m)
        return sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])

    Ix, Iy, Iz = (sp.eye(m) for m in (nx, ny, nz))
    A = (sp.kron(sp.kron(Iz, Iy), lap1(nx))
         + sp.kron(sp.kron(Iz, lap1(ny)), Ix)
         + sp.kron(sp.kron(lap1(nz), Iy), Ix)
         + shift * sp.eye(nx * ny * nz))
    return A.tocsr()


def test_infer_grid():
    A = CSRMatrix.from_scipy(_poisson3d(8, 10, 12))
    # kron order (Iz, Iy, lap(x)) makes x the fastest axis
    assert infer_grid(A) == (12, 10, 8)
    # unstructured: no grid
    rng = np.random.default_rng(0)
    R = sp.random(512, 512, density=0.02, random_state=rng) \
        + 4 * sp.eye(512)
    assert infer_grid(CSRMatrix.from_scipy(R.tocsr())) is None


def test_transfers_match_host_P():
    A = CSRMatrix.from_scipy(_poisson3d(12, 12, 6))
    M = mg(A, n_coarse=64, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    n = A.shape[0]
    P = _prolong_scipy(M.dims[0], M.factors[0], n)
    r = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(M._restrict(0, jnp.asarray(r))), P.T @ r, rtol=1e-12)
    xc = rng.standard_normal(P.shape[1])
    np.testing.assert_allclose(
        np.asarray(M._prolong(0, jnp.asarray(xc))), P @ xc, rtol=1e-12)


def test_mg_beats_jacobi_iteration_count():
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond.jacobi import JacobiPrecond
    from gmres_tpu.solvers.gmres import gmres

    A3 = _poisson3d(24)
    A = CSRMatrix.from_scipy(A3)
    n = A.shape[0]
    b = np.random.default_rng(2).standard_normal(n)
    op = device_operator(A, dtype=jnp.float32)
    Mj = JacobiPrecond(inv_diag=jnp.asarray(1.0 / A3.diagonal(),
                                            jnp.float32))
    Mm = mg(A, n_coarse=512)
    assert isinstance(Mm, MgPrecond) and len(Mm.ops) >= 1
    res_j = gmres(op, jnp.asarray(b, jnp.float32), M_left=Mj,
                  tol=1e-6, restart=32, maxiter=1000)
    res_m = gmres(op, jnp.asarray(b, jnp.float32), M_left=Mm,
                  tol=1e-6, restart=32, maxiter=1000)
    x = np.asarray(res_m.x, np.float64)
    rel = np.linalg.norm(b - A3 @ x) / np.linalg.norm(b)
    assert rel < 1e-5
    assert int(res_m.iterations) < int(res_j.iterations) / 3, (
        int(res_m.iterations), int(res_j.iterations))


def test_mg_handles_tail_rows():
    """Rows past the inferred grid (pad internals) ride identity
    transfers and still get solved."""
    A3 = _poisson3d(8, 8, 4)
    n = A3.shape[0]
    tail = 5
    # couple 5 extra rows to the grid weakly
    rows = list(range(n, n + tail))
    T = sp.lil_matrix((n + tail, n + tail))
    T[:n, :n] = A3
    for k, r in enumerate(rows):
        T[r, r] = 3.0
        T[r, k * 7] = -1.0
        T[k * 7, r] = -1.0
    A = CSRMatrix.from_scipy(T.tocsr())
    M = mg(A, n_coarse=64, dtype=jnp.float64)
    assert M is not None and M.tails[0] == tail
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n + tail)
    z = np.asarray(M(jnp.asarray(b)))
    assert np.all(np.isfinite(z))
    # one V-cycle must reduce the residual of A z ~ b vs the Jacobi start
    r_mg = np.linalg.norm(b - T.tocsr() @ z)
    r_j = np.linalg.norm(b - T.tocsr() @ (b / T.diagonal()))
    assert r_mg < r_j


def test_resolve_auto_picks_mg_on_grids():
    """The auto policy is now amortized-cost-driven (VERDICT r4 next #3):
    MG wins only when its O(1) iteration count pays back its ~3x setup
    and apply cost — very long transients; short/warm runs and one-shots
    stay on AINV (see tests/test_precond.py for the full table)."""
    from gmres_tpu.precond import resolve_precond

    A = CSRMatrix.from_scipy(_poisson3d(32))       # 32768 rows
    assert resolve_precond("auto", A, steps=50000) == "mg"
    # r5 recalibration: the halved MG build moved the 32K crossover to
    # ~220 warm steps, so 1000-step runs now take mg; 100-step stay ainv
    assert resolve_precond("auto", A, steps=1000) == "mg"
    assert resolve_precond("auto", A, steps=100) == "ainv"
    small = CSRMatrix.from_scipy(_poisson3d(8))
    assert resolve_precond("auto", small) == "ainv"


def test_saddle_with_mg_core_matches_oracle(tmp_path):
    """Saddle + MG on the grounded block: transient equals the direct-LU
    oracle (mg_min_n forced down so the test fixture takes the MG path)."""
    from gmres_tpu.frontend.fixtures import write_pg_netlist
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.transient import _prep, transient_direct
    from gmres_tpu.precond.saddle import saddle
    from gmres_tpu.solvers.gmres import gmres
    from gmres_tpu.ops.spmv import device_operator

    net = tmp_path / "pg.sp"
    write_pg_netlist(net, nx=16, layers=2, pad_pitch=8,
                     tstep=1e-10, tstop=3e-10)
    mna = load_netlist(str(net))
    _, _, _, _, A, _ = _prep(mna, None, None)
    M = saddle(A, mg_min_n=64)
    from gmres_tpu.precond.mg import MgPrecond as _Mg

    assert isinstance(M.Mg, _Mg), type(M.Mg)
    import scipy.sparse.linalg as spla

    rng = np.random.default_rng(4)
    b = rng.standard_normal(A.shape[0])
    op = device_operator(A, dtype=jnp.float32)
    res = gmres(op, jnp.asarray(b, jnp.float32), M_left=M,
                tol=1e-6, restart=32, maxiter=2000)
    x = np.asarray(res.x, np.float64)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    rel = (np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b))
    assert rel < 5e-5, rel  # f32 floor on mOhm-scaled MNA
    assert np.abs(x - x_ref).max() / np.abs(x_ref).max() < 1e-3
    assert int(res.iterations) < 500, int(res.iterations)
    del transient_direct  # imported for parity with other engine tests


def test_probe_rejects_heterogeneous_coefficients():
    """The build-time contraction probe must reject coefficient fields
    where piecewise-constant coarsening stagnates (PG planes: lognormal
    segment conductances + mOhm pad anchors — measured 0.67-0.87 per-cycle
    asymptotic contraction, which plateaus GMRES at ~1e-5 and diverges the
    2.1M DC solve), while keeping smooth fields (thermal FD cubes)."""
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.precond.mg import mg

    rng = np.random.default_rng(0)
    nx = 128
    n = nx * nx

    def resistor_mesh(sigma):
        # lognormal edge conductances on a 2-D grid + a few huge anchors
        gx = np.exp(rng.normal(0.0, sigma, (nx, nx - 1))) * 25.0
        gy = np.exp(rng.normal(0.0, sigma, (nx - 1, nx))) * 25.0
        rows, cols, vals = [], [], []

        def add(i, j, g):
            rows.extend([i, j, i, j]); cols.extend([j, i, i, j])
            vals.extend([-g, -g, g, g])

        idx = np.arange(n).reshape(nx, nx)
        for i in range(nx):
            for j in range(nx - 1):
                add(idx[i, j], idx[i, j + 1], gx[i, j])
        for i in range(nx - 1):
            for j in range(nx):
                add(idx[i, j], idx[i + 1, j], gy[i, j])
        A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        d = np.zeros(n)
        d[:: nx * 8] = 500.0 if sigma > 0 else 1.0   # pad-like anchors
        return CSRMatrix.from_scipy((A + sp.diags(d + 1e-3)).tocsr())

    assert mg(resistor_mesh(2.0), n_coarse=256) is None

    # acceptance half: the 3-D thermal FD class stays in (probe rho
    # measured 0.36-0.46 vs the 0.5 gate; PG planes measure 0.67-0.87)
    nc = 24
    e = np.ones(nc)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nc)
    A3 = (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
          + sp.kron(sp.kron(T, I), I) + 0.05 * sp.eye(nc ** 3))
    assert mg(CSRMatrix.from_scipy(A3.tocsr()), n_coarse=256) is not None


def test_level_op_exact_formats():
    """r5 level-op routing (_level_op): small coarse levels become DENSE
    MXU matvecs (DenseOp), mid levels pure DIA past the generic
    128-diagonal cap — both EXACT formats, so every level operator must
    match its host matrix to f32 roundoff (the bf16-default pitfall is
    pinned by the HIGHEST-precision dot in DenseOp)."""
    from gmres_tpu.ops.operator import DenseOp
    from gmres_tpu.precond.mg import mg as build_mg

    # 64^3 = 262144 rows: levels 262144 / 32768 / 4096 / coarse 512 — the
    # n=4096 level exercises the dense branch
    A = CSRMatrix.from_scipy(_poisson3d(64))
    M = build_mg(A)
    assert M is not None
    # the hierarchy bottoms out in at least one DenseOp level
    assert any(isinstance(op, DenseOp) for op in M.ops[1:])
    # the fine-level op reproduces the host matrix it was built from
    rng = np.random.default_rng(0)
    n = A.shape[0]
    v = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(M.ops[0](jnp.asarray(v)))[:n]
    ref = A.to_scipy().astype(np.float64) @ v.astype(np.float64)
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert err < 1e-6, err
    # every coarser level op is finite on a probe vector
    for l, op in enumerate(M.ops[1:], start=1):
        nl = (M.dims[l][0] * M.dims[l][1] * M.dims[l][2] + M.tails[l])
        vl = rng.standard_normal(nl).astype(np.float32)
        assert np.all(np.isfinite(np.asarray(op(jnp.asarray(vl)))))


def test_dense_op_highest_precision():
    """DenseOp must not silently truncate to bf16: a matvec whose answer
    needs more than bf16's 8 mantissa bits must come out f32-exact."""
    import jax

    from gmres_tpu.ops.operator import DenseOp

    n = 256
    rng = np.random.default_rng(1)
    A = rng.standard_normal((n, n)).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    # op as a jit ARGUMENT (pytree data), the production calling shape
    y = np.asarray(jax.jit(lambda o, x: o(x))(
        DenseOp(A=jnp.asarray(A)), jnp.asarray(v)))
    ref = A.astype(np.float64) @ v.astype(np.float64)
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert err < 1e-6, err  # bf16 passes would land ~1e-2
