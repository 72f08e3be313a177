"""Row-sharded distributed transient (parallel/dist_transient.py): the
user-visible workload behind ``pg -gmres -np N`` — the reference's -np
dispatch (etbr_cmd_short.cpp:364 -> etbr_wrapper.cpp:189-261) rebuilt as a
shard_map'd backward-Euler scan. Validated on the 8-device CPU mesh against
the host direct-LU oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmres_tpu.frontend.fixtures import write_pg_netlist
from gmres_tpu.frontend.mna import load_netlist
from gmres_tpu.models.transient import transient_direct
from gmres_tpu.parallel.dist_transient import dist_transient_gmres
from gmres_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def pg_fixture(tmp_path_factory):
    net = tmp_path_factory.mktemp("dt") / "pg.sp"
    write_pg_netlist(net, nx=16, layers=2, pad_pitch=8,
                     tstep=1e-10, tstop=6e-10)
    return load_netlist(str(net))


@pytest.mark.parametrize("ndev,precond", [(4, "iluk"), (8, "jacobi")])
def test_dist_transient_matches_direct(pg_fixture, ndev, precond):
    mna = pg_fixture
    ref = transient_direct(mna)
    mesh = make_mesh(n_rows=ndev, n_batch=1)
    res = dist_transient_gmres(mna, mesh, precond=precond,
                               dtype=jnp.float64, tol=1e-9)
    assert res.converged, (res.iterations, res.residuals)
    np.testing.assert_allclose(res.port_values, ref.port_values,
                               rtol=1e-5, atol=1e-10)
    assert res.times.shape[0] == ref.port_values.shape[0]


def test_dist_transient_partition_invariant(pg_fixture):
    """Iteration trajectory must be identical across shard counts (the
    deterministic psum-dot property, MEASUREMENTS r1)."""
    mna = pg_fixture
    r1 = dist_transient_gmres(mna, make_mesh(n_rows=1, n_batch=1),
                              precond="jacobi", dtype=jnp.float64, tol=1e-9)
    r8 = dist_transient_gmres(mna, make_mesh(n_rows=8, n_batch=1),
                              precond="jacobi", dtype=jnp.float64, tol=1e-9)
    np.testing.assert_array_equal(r1.iterations, r8.iterations)
    np.testing.assert_allclose(r1.port_values, r8.port_values,
                               rtol=1e-9, atol=1e-12)


def test_cli_np_routes_distributed(tmp_path, capsys):
    """`pg fix.sp -gmres -np 4` runs the row-sharded engine."""
    from gmres_tpu.cli.pg import main as pg_main

    net = tmp_path / "fix.sp"
    write_pg_netlist(net, nx=12, layers=2, pad_pitch=6,
                     tstep=1e-10, tstop=4e-10)
    rc = pg_main([str(net), "-gmres", "-np", "4", "-tol", "1e-6",
                  "-no-refine"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "distributed gmres transient (4 shards" in out
    assert "converged=True" in out
    # auto now runs the FULL shard-aligned saddle — no downgrade
    # (VERDICT r4 #4); only the pivoting class still downgrades loudly
    assert "DOWNGRADING" not in out
    assert "setup/run split" in out


def test_cli_np_ilutp_runs_shard_aligned(tmp_path, capsys):
    """-np -precond ilutp runs block-ILUTP (per-shard pivoting spilu) —
    the last downgrade path is gone (VERDICT r4 #4 fully closed)."""
    from gmres_tpu.cli.pg import main as pg_main

    net = tmp_path / "fix.sp"
    write_pg_netlist(net, nx=12, layers=2, pad_pitch=6,
                     tstep=1e-10, tstop=4e-10)
    rc = pg_main([str(net), "-gmres", "-np", "4", "-tol", "1e-6",
                  "-no-refine", "-precond", "ilutp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "DOWNGRADING" not in out
    assert "converged=True" in out


def test_dist_transient_block_ilutp_matches_direct(pg_fixture):
    """Block-ILUTP distributed transient matches the direct oracle and
    applies full-strength per-part numerics (MyILUPP's distributed
    counterpart; reference DD per-part LU, solve_dd.cpp:179-300)."""
    from gmres_tpu.parallel.dist_gmres import DistBlockIlutpPrecond

    mna = pg_fixture
    ref = transient_direct(mna)
    mesh = make_mesh(n_rows=4, n_batch=1)
    res = dist_transient_gmres(mna, mesh, precond="ilutp",
                               dtype=jnp.float64, tol=1e-9)
    assert res.converged, (res.iterations, res.residuals)
    np.testing.assert_allclose(res.port_values, ref.port_values,
                               rtol=1e-5, atol=1e-10)
    # the pivoting class should beat block-ILU(k) on saddle rows: sanity
    # bound on per-step work rather than an exact pin (both converge here)
    it_ilutp = np.asarray(res.iterations, float).mean()
    r_iluk = dist_transient_gmres(mna, mesh, precond="iluk",
                                  dtype=jnp.float64, tol=1e-9)
    assert it_ilutp <= np.asarray(r_iluk.iterations, float).mean() * 1.5


def test_dist_transient_chunked_matches_unchunked(pg_fixture):
    """Scan chunking (watchdog bounding, VERDICT r3 #6) must be a pure
    dispatch decision: identical port trajectories, iterations, and
    converged flags whether the scan runs as one program or in segments
    with a sharded state carry (tail segment padded)."""
    mna = pg_fixture
    mesh = make_mesh(n_rows=4, n_batch=1)
    r_one = dist_transient_gmres(mna, mesh, precond="jacobi",
                                 dtype=jnp.float64, tol=1e-9, chunk_steps=0)
    r_chk = dist_transient_gmres(mna, mesh, precond="jacobi",
                                 dtype=jnp.float64, tol=1e-9, chunk_steps=4)
    np.testing.assert_array_equal(r_one.iterations, r_chk.iterations)
    np.testing.assert_allclose(r_one.port_values, r_chk.port_values,
                               rtol=1e-12, atol=0)
    assert r_chk.converged
    assert r_chk.stats is not None and "transient_s" in r_chk.stats


def test_dist_transient_device_dc_seed(pg_fixture):
    """dc_method='gmres' seeds the distributed transient from an iterative
    DC (the reference's on-device DC, mna_solve_gpu_gmres.cpp:529-538)
    instead of host LU, with matching results."""
    mna = pg_fixture
    mesh = make_mesh(n_rows=4, n_batch=1)
    r_lu = dist_transient_gmres(mna, mesh, precond="jacobi",
                                dtype=jnp.float64, tol=1e-9)
    r_it = dist_transient_gmres(mna, mesh, precond="jacobi",
                                dtype=jnp.float64, tol=1e-9,
                                dc_method="gmres")
    np.testing.assert_allclose(r_it.port_values, r_lu.port_values,
                               rtol=1e-6, atol=1e-10)
    assert r_it.converged


def test_dist_transient_saddle_full_strength(pg_fixture):
    """The shard-aligned saddle (DistSaddlePrecond, VERDICT r4 #4): the
    distributed engine runs the PRODUCTION preconditioner — constraint-
    Schur elimination with block-local AINV Mg and replicated S_inv — and
    converges with an iteration count within 1.5x of the single-chip
    saddle engine on the same fixture."""
    from gmres_tpu.models.transient import transient_gmres

    mna = pg_fixture
    ref = transient_direct(mna)
    mesh = make_mesh(n_rows=8, n_batch=1)
    res = dist_transient_gmres(mna, mesh, precond="saddle",
                               dtype=jnp.float64, tol=1e-9)
    assert res.converged, (res.iterations, res.residuals)
    np.testing.assert_allclose(res.port_values, ref.port_values,
                               rtol=1e-5, atol=1e-10)
    single = transient_gmres(mna, precond="saddle", dtype=jnp.float64,
                             tol=1e-9, transform="none")
    it_d = float(np.asarray(res.iterations).mean())
    it_s = float(np.asarray(single.stats["iterations"]).mean())
    assert it_d <= 1.5 * it_s + 2.0, (it_d, it_s)


def test_dist_transient_refine_ir(pg_fixture):
    """GMRES-IR on the mesh (refine=True): f32 Arnoldi + sharded f64
    state/true-residuals reaches tolerances a plain f32 run cannot."""
    mna = pg_fixture
    ref = transient_direct(mna)
    mesh = make_mesh(n_rows=4, n_batch=1)
    res = dist_transient_gmres(mna, mesh, precond="saddle",
                               dtype=jnp.float32, tol=1e-9, refine=True)
    assert res.converged, (res.iterations, res.residuals)
    scale = np.abs(ref.port_values).max()
    assert np.abs(res.port_values - ref.port_values).max() / scale < 1e-6
