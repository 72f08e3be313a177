"""PG transient engines: analytic RC oracle, direct-vs-GMRES engine
cross-check (SURVEY.md §4 oracle style), IR analysis, writers."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.frontend.mna import stamp
from gmres_tpu.frontend.spice import parse_netlist
from gmres_tpu.models.ir import ir_analysis, write_ir_report
from gmres_tpu.models.transient import transient_direct, transient_gmres
from gmres_tpu.frontend.writers import write_output, write_xgraph


def _write(tmp_path, text, name="ckt.sp"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_rc_charging_analytic(tmp_path):
    # V steps to 1V at t=0 via PWL; v_out = 1 - exp(-t/RC), RC = 1ms
    path = _write(tmp_path, """\
V1 in 0 PWL(0 1 1 1)
R1 in out 1k
C1 out 0 1u
.tran 10u 3m
.print v(out)
""")
    mna = stamp(parse_netlist(path))
    # start from zero state (capacitor discharged), not the DC solution
    res = transient_direct(mna, x0=np.zeros(mna.size))
    v = res.port_values[:, 0]
    ref = 1.0 - np.exp(-res.times / 1e-3)
    assert np.abs(v - ref).max() < 5e-3  # BE is O(h): h/RC = 1%


def test_rl_decay_analytic(tmp_path):
    # I source drives RL: i_L(t) -> I*(1 - exp(-R t / L)), tau = L/R = 1ms
    path = _write(tmp_path, """\
I1 0 n1 PWL(0 1m 1 1m)
R1 n1 0 1k
L1 n1 0 1
.tran 10u 3m
.print v(n1)
""")
    mna = stamp(parse_netlist(path))
    res = transient_direct(mna, x0=np.zeros(mna.size))
    v = res.port_values[:, 0]
    # v_n1 = I*R*exp(-t/tau) with tau = L/R = 1e-3
    ref = 1.0 * np.exp(-res.times / 1e-3)
    assert np.abs(v - ref).max() < 2e-2


def _grid_netlist(tmp_path, N=7):
    lines = ["V1 vdd 0 DC 1.8", "Rsrc vdd n0_0 0.1"]
    for i in range(N):
        for j in range(N):
            if i + 1 < N:
                lines.append(f"Rh{i}_{j} n{i}_{j} n{i+1}_{j} 2")
            if j + 1 < N:
                lines.append(f"Rv{i}_{j} n{i}_{j} n{i}_{j+1} 2")
            lines.append(f"Cd{i}_{j} n{i}_{j} 0 1p")
    lines.append(f"I1 n{N//2}_{N//2} 0 PWL(0 0 50n 80m 100n 0 200n 0)")
    lines.append(f"I2 n{N-1}_{N-1} 0 PULSE(0 40m 20n 5n 5n 50n 200n)")
    lines.append(".tran 2n 400n")
    lines.append(f".print v(n{N//2}_{N//2}) v(n0_0) v(n{N-1}_{N-1})")
    return _write(tmp_path, "\n".join(lines) + "\n")


def test_gmres_engine_matches_direct(tmp_path):
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_gmres(mna, precond="ilu0", dtype=jnp.float64, tol=1e-10)
    assert got.stats["converged"]
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-7


def test_gmres_engine_transformed_matches_direct(tmp_path):
    # Forced Ruiz+RCM similarity (SystemTransform): the z-space scan must
    # reproduce the untransformed port waveforms exactly (up to solver tol).
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_gmres(mna, precond="ainv", dtype=jnp.float64, tol=1e-10,
                          transform="always")
    assert got.stats["converged"]
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-7


def test_dc_gmres_transform_on_mna():
    # dc_solve(gmres) on a system with V-source branch rows (zero diagonal)
    # must auto-transform and agree with the direct solve.
    import tempfile, os
    from gmres_tpu.models.dc import dc_solve

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ckt.sp")
        with open(p, "w") as f:
            f.write("V1 vdd 0 DC 1.0\n")
            for k in range(6):
                f.write(f"R{k} {'vdd' if k == 0 else 'n%d' % (k-1)} n{k} 1\n")
            f.write("Rg n5 0 1\n.tran 1n 2n\n")
        mna = stamp(parse_netlist(p))
    ref = dc_solve(mna, method="direct")
    got = dc_solve(mna, method="gmres", precond="ainv")
    assert np.abs(got - ref).max() < 1e-8


def test_gmres_engine_f32_ainv(tmp_path):
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_gmres(mna, precond="ainv", dtype=jnp.float32, tol=1e-6)
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-3


def test_ir_and_writers(tmp_path):
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    res = transient_direct(mna)
    rep = ir_analysis(res.port_values, mna.port_names, display_num=3,
                      verbose=False)
    assert len(rep.top(3)) == 3
    # the driven node should show the largest IR drop
    worst = rep.top(1)[0][0]
    assert worst in mna.port_names
    write_ir_report(str(tmp_path / "out.ir"), rep)
    write_output(str(tmp_path / "out.output"), res.times, res.port_values,
                 mna.port_names)
    write_output(str(tmp_path / "out.ext"), res.times, res.port_values,
                 mna.port_names, external=True)
    write_xgraph(str(tmp_path / "out.xgraph"), res.times, res.port_values,
                 mna.port_names)
    text = (tmp_path / "out.output").read_text()
    assert "Node:" in text and "END:" in text
    assert (tmp_path / "out.ir").read_text().startswith("#Tracked")


def test_gmres_engine_refine_high_accuracy(tmp_path):
    # GMRES-IR transient: f32 inner loop, f64 state — must match the f64
    # direct oracle to ~1e-9, far beyond plain-f32 accuracy.
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_gmres(mna, precond="ainv", dtype=jnp.float32, tol=1e-10,
                          transform="always", refine=True)
    assert got.stats["converged"]
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-8


def test_direct_device_engine_matches_host(tmp_path):
    """Device-resident direct-LU transient (wrapperGPUforPG.cu:17 parity):
    the lax.scan engine with level-scheduled L/U solves must reproduce the
    host SuperLU loop to factor-precision."""
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_direct(mna, device=True, dtype=jnp.float64)
    assert got.stats["lu_fill_nnz"] > 0
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-9
    # f32 factors: the reference's single-precision GPU path accuracy class
    got32 = transient_direct(mna, device=True, dtype=jnp.float32)
    assert np.abs(got32.port_values - ref.port_values).max() / scale < 1e-4


def test_gmres_engine_scan_dc(tmp_path):
    """The flagship DC-in-scan path (VERDICT r4 #2): dc_method='gmres' with
    the saddle preconditioner runs DC as w=1 rows of the SAME compiled
    transient scan (models/thermal.py _transient_impl with_dc) — no second
    GMRES program. Must match the direct oracle, report dc telemetry, and
    survive a chunk size that forces tail padding."""
    mna = stamp(parse_netlist(_grid_netlist(tmp_path)))
    ref = transient_direct(mna)
    got = transient_gmres(mna, precond="saddle", dtype=jnp.float32,
                          tol=1e-10, refine=True, dc_method="gmres",
                          chunk_steps=64)  # 200 steps -> 8-row padded tail
    assert got.stats["converged"]
    assert got.stats["dc_iters"] > 0
    assert got.stats["dc_residual"] < 1e-9
    # DC state itself matches the direct DC solve
    from gmres_tpu.models.dc import dc_solve

    dc_ref = dc_solve(mna, method="direct")
    assert np.abs(got.dc - dc_ref).max() / np.abs(dc_ref).max() < 1e-8
    scale = np.abs(ref.port_values).max()
    assert np.abs(got.port_values - ref.port_values).max() / scale < 1e-8
    assert got.port_values.shape == ref.port_values.shape
