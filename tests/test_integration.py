"""Larger end-to-end pipeline: 32x32 power grid through parse -> stamp ->
DC -> full transient -> ETBR -> IR, engines cross-checked."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.frontend.mna import stamp
from gmres_tpu.frontend.spice import parse_netlist
from gmres_tpu.models.dc import dc_solve
from gmres_tpu.models.etbr import etbr_reduce, reduced_transient
from gmres_tpu.models.ir import ir_analysis
from gmres_tpu.models.transient import transient_direct, transient_gmres
from gmres_tpu.solvers.gmres import gmres


@pytest.fixture(scope="module")
def big_grid(tmp_path_factory):
    N = 32
    lines = ["V1 vdd 0 DC 1.0"]
    for k in range(4):
        lines.append(f"Rsrc{k} vdd n0_{k * (N // 4)} 0.05")
    rng = np.random.default_rng(0)
    for i in range(N):
        for j in range(N):
            if i + 1 < N:
                lines.append(f"Rh{i}_{j} n{i}_{j} n{i+1}_{j} "
                             f"{rng.uniform(1, 3):.3f}")
            if j + 1 < N:
                lines.append(f"Rv{i}_{j} n{i}_{j} n{i}_{j+1} "
                             f"{rng.uniform(1, 3):.3f}")
            lines.append(f"Cd{i}_{j} n{i}_{j} 0 {rng.uniform(0.5, 2):.3f}p")
    for k, (ii, jj) in enumerate([(8, 8), (16, 24), (24, 8), (30, 30)]):
        t0 = 10 * k
        lines.append(
            f"I{k} n{ii}_{jj} 0 PWL(0 0 {t0}n 0 {t0+20}n 20m {t0+60}n 5m "
            f"400n 5m)"
        )
    lines.append(".tran 4n 400n")
    lines.append(".print v(n8_8) v(n16_24) v(n0_0) v(n31_31)")
    p = tmp_path_factory.mktemp("big") / "grid.sp"
    p.write_text("\n".join(lines) + "\n")
    return stamp(parse_netlist(str(p)))


def test_scale(big_grid):
    assert big_grid.num_nodes == 32 * 32 + 1  # grid + vdd
    assert big_grid.G.nnz > 5000


def test_dc_consistency(big_grid):
    xd = dc_solve(big_grid, method="direct")
    xg = dc_solve(big_grid, method="gmres", precond="ilu0",
                  dtype=jnp.float64, tol=1e-12)
    assert np.linalg.norm(xd - xg) / np.linalg.norm(xd) < 1e-8
    # all node voltages within supply rails (passive grid)
    v = xd[: big_grid.num_nodes]
    assert v.min() > -1e-9 and v.max() < 1.0 + 1e-9


def test_engines_agree(big_grid):
    ref = transient_direct(big_grid)
    got = transient_gmres(big_grid, precond="ainv", dtype=jnp.float64,
                          tol=1e-10)
    assert got.stats["converged"]
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-7
    # warm-started steps should converge in few iterations
    assert float(got.stats["iterations"].mean()) < 60


def test_etbr_on_big_grid(big_grid):
    ref = transient_direct(big_grid)
    model = etbr_reduce(big_grid, q=20, workers=4)
    red = reduced_transient(model, big_grid)
    scale = np.abs(ref.port_values).max()
    err = np.abs(red.port_values - ref.port_values).max() / scale
    assert err < 0.05
    rep = ir_analysis(ref.port_values, big_grid.port_names, verbose=False)
    assert rep.ir.max() > 0


def test_bf16_storage_f32_dots():
    """bf16 storage with f32 dot accumulation (the P6 precision-policy axis
    pushed past the reference's float32). Only legitimate on
    well-conditioned systems: bf16's ~3 significant digits perturb A itself,
    so an ill-conditioned PG grid is out of scope by design."""
    from conftest import random_sparse

    A = random_sparse(400, 0.02, seed=11, diag_boost=8.0)
    n = A.shape[0]
    x_true = np.random.default_rng(0).standard_normal(n)
    b64 = A.matvec(x_true)
    res = gmres(A.to_ell(dtype=jnp.bfloat16),
                jnp.asarray(b64, dtype=jnp.bfloat16),
                restart=30, tol=5e-3, maxiter=2000,
                dot_dtype=jnp.float32)
    assert bool(res.converged)
    rel = (np.linalg.norm(np.asarray(res.x, np.float64) - x_true)
           / np.linalg.norm(x_true))
    assert rel < 0.05
