"""Fixture generators: structural sanity + end-to-end through the engines."""

import numpy as np

from gmres_tpu.frontend.fixtures import write_gcb_dir, write_pg_netlist
from gmres_tpu.frontend.gcb import read_gcb
from gmres_tpu.frontend.mna import stamp
from gmres_tpu.frontend.spice import parse_netlist


def test_pg_netlist_generator(tmp_path):
    p = tmp_path / "pg.sp"
    st = write_pg_netlist(str(p), nx=24, layers=2, pad_pitch=8,
                          via_pitch=4, tstop=1e-10)
    assert st["nodes"] > 24 * 24 * 2
    mna = stamp(parse_netlist(str(p)))
    # grid + pad internal nodes + V-source branch rows
    assert mna.size == st["nodes"] + st["vsources"]
    assert mna.ports.size == 8
    # both parsers agree on the generated structure
    try:
        from gmres_tpu.native import parse_netlist_native

        mna2 = parse_netlist_native(str(p))
        assert mna2.size == mna.size
        assert abs(mna.G.to_scipy() - mna2.G.to_scipy()).max() < 1e-12
    except ImportError:
        pass
    # DC solvable and inside the rails
    from gmres_tpu.models.dc import dc_solve

    x = dc_solve(mna, method="direct")
    v = x[: mna.num_nodes]
    assert v.min() > -1e-9 and v.max() < 1.8 + 1e-9
    # grid actually draws current: IR drop is nonzero but < vdd
    assert 1e-6 < (1.8 - v[mna.ports].min()) < 1.8


def test_gcb_generator_roundtrip_and_transient(tmp_path):
    d = tmp_path / "gcb"
    st = write_gcb_dir(str(d), nx=10, nz=3, steps=12)
    g = read_gcb(str(d))
    assert g.n == st["n"] and g.num_steps == 12
    # A = G + C/h must hold structurally: A - C/h is an M-matrix-ish
    # Laplacian (non-positive off-diagonals)
    Gmat = (g.A.to_scipy() - g.C.to_scipy() / g.t_step).tocsr()
    off = Gmat.copy()
    off.setdiag(0.0)
    assert off.data.max(initial=0.0) <= 1e-12
    # one thermal transient through the engine
    import jax.numpy as jnp

    from gmres_tpu.models.thermal import thermal_transient
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond import make_preconditioner

    M = make_preconditioner("jacobi", g.A, dtype=jnp.float64)
    res = thermal_transient(
        device_operator(g.A, dtype=jnp.float64),
        device_operator(g.B, dtype=jnp.float64),
        device_operator(g.C_over_h(), dtype=jnp.float64),
        g.U.T, x0=jnp.zeros(g.n, jnp.float64),
        tol=1e-9, maxiter=2000, M_left=M, dtype=jnp.float64,
    )
    assert bool(np.asarray(res.converged).all())
    X = np.asarray(res.X)
    assert np.isfinite(X).all()
    assert X.max() > 0  # heating happened
