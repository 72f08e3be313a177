"""SPICE parser + MNA stamping correctness against hand-computed circuits."""

import numpy as np
import pytest

from gmres_tpu.frontend.mna import stamp
from gmres_tpu.frontend.sources import Source
from gmres_tpu.frontend.spice import parse_netlist, parse_value
from gmres_tpu.models.dc import dc_solve


def _write(tmp_path, text, name="ckt.sp"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


@pytest.mark.parametrize("tok,val", [
    ("1k", 1e3), ("2.5m", 2.5e-3), ("3MEG", 3e6), ("1e-9", 1e-9),
    ("10p", 1e-11), ("4.7u", 4.7e-6), ("100n", 1e-7), ("1G", 1e9),
    ("2T", 2e12), ("5f", 5e-15), ("0.5", 0.5), ("1K", 1e3), ("3meg", 3e6),
    ("1.5E2", 150.0),
])
def test_parse_value(tok, val):
    assert parse_value(tok) == pytest.approx(val, rel=1e-12)


def test_parse_basic_netlist(tmp_path):
    path = _write(tmp_path, """\
* test circuit
V1 vdd 0 DC 1.0
R1 vdd out 1k
C1 out 0 1u
I1 0 out PWL(0 0 1m 1m 2m 0)
Ipulse 0 out PULSE(0 1m 0 1u 1u 10u 100u)
.tran 1u 2m
.print tran v(out)
.end
""")
    nl = parse_netlist(path)
    c = nl.counts()
    assert c == {"V": 1, "R": 1, "C": 1, "I": 2}
    assert nl.tstep == pytest.approx(1e-6)
    assert nl.tstop == pytest.approx(2e-3)
    assert nl.ports == ["out"]
    pwl = [e for e in nl.elements if e.name == "I1"][0].source
    assert pwl.kind == "pwl"
    assert np.allclose(pwl.times, [0, 1e-3, 2e-3])
    assert np.allclose(pwl.values, [0, 1e-3, 0])
    pulse = [e for e in nl.elements if e.name == "Ipulse"][0].source
    assert pulse.kind == "pulse"
    assert pulse.v2 == pytest.approx(1e-3)
    assert pulse.period == pytest.approx(1e-4)


def test_continuation_and_include(tmp_path):
    _write(tmp_path, "R2 a 0 2k\n", name="sub.inc")
    path = _write(tmp_path, """\
V1 a 0 DC
+ 2.0
.include sub.inc
.tran 1u 1m
""")
    nl = parse_netlist(path)
    assert nl.counts() == {"V": 1, "R": 1}
    v = [e for e in nl.elements if e.kind == "V"][0]
    assert v.source.dc == pytest.approx(2.0)


def test_subckt_flattening(tmp_path):
    path = _write(tmp_path, """\
.SUBCKT cell a b
R1 a mid 1k
R2 mid b 1k
.ends
V1 n1 0 1.0
X1 n1 0 cell
.print v(n1)
""")
    nl = parse_netlist(path)
    assert nl.counts() == {"V": 1, "R": 2}
    names = {e.name for e in nl.elements}
    assert "X1.R1" in names and "X1.R2" in names
    mna = stamp(nl)
    x = dc_solve(mna)
    # series 2k across 1V: current through V1 = -0.5mA (into + terminal)
    mid_idx = mna.node_index["X1.mid"]
    assert x[mid_idx] == pytest.approx(0.5, rel=1e-9)


def test_mna_dc_divider(tmp_path):
    path = _write(tmp_path, """\
V1 vdd 0 DC 1
R1 vdd out 1k
R2 out 0 1k
""")
    mna = stamp(parse_netlist(path))
    assert mna.num_nodes == 2 and mna.num_vsrc == 1
    x = dc_solve(mna)
    assert x[mna.node_index["out"]] == pytest.approx(0.5, rel=1e-9)
    assert x[mna.node_index["vdd"]] == pytest.approx(1.0, rel=1e-9)


def test_mna_current_source(tmp_path):
    path = _write(tmp_path, """\
I1 0 n1 1m
R1 n1 0 1k
""")
    mna = stamp(parse_netlist(path))
    x = dc_solve(mna)
    assert x[mna.node_index["n1"]] == pytest.approx(1.0, rel=1e-9)


def test_mna_inductor_dc(tmp_path):
    path = _write(tmp_path, """\
V1 in 0 DC 1
R1 in out 1
L1 out 0 1m
""")
    mna = stamp(parse_netlist(path))
    assert mna.num_ind == 1
    x = dc_solve(mna)
    assert x[mna.node_index["out"]] == pytest.approx(0.0, abs=1e-9)
    il_idx = mna.num_nodes + mna.num_vsrc  # first (only) inductor current
    assert x[il_idx] == pytest.approx(1.0, rel=1e-9)


def test_dc_gmres_matches_direct(tmp_path):
    # grid of resistors with a few sources
    lines = ["V1 vdd 0 DC 1.8"]
    N = 6
    for i in range(N):
        for j in range(N):
            if i + 1 < N:
                lines.append(f"Rh{i}_{j} n{i}_{j} n{i+1}_{j} 10")
            if j + 1 < N:
                lines.append(f"Rv{i}_{j} n{i}_{j} n{i}_{j+1} 10")
    lines.append("Rsrc vdd n0_0 1")
    lines.append("I1 n3_3 0 10m")
    lines.append("I2 n5_5 0 5m")
    path = _write(tmp_path, "\n".join(lines) + "\n")
    mna = stamp(parse_netlist(path))
    xd = dc_solve(mna, method="direct")
    import jax.numpy as jnp

    xg = dc_solve(mna, method="gmres", precond="ilu0", dtype=jnp.float64,
                  tol=1e-12)
    assert np.linalg.norm(xd - xg) / np.linalg.norm(xd) < 1e-8
