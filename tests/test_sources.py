"""Source waveform evaluation: DC/PWL/PULSE host + in-graph parity
(kernels.cu gen_*ut oracle role)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.frontend.sources import (
    DevicePwlTable, Source, dc_values, eval_sources, source_table,
)


def test_dc():
    s = Source(kind="dc", dc=2.5)
    t = np.linspace(0, 1, 11)
    assert np.allclose(s(t), 2.5)
    assert s.value_at_0 == 2.5


def test_pwl_interp_and_extrapolation():
    s = Source(kind="pwl", times=np.array([0.0, 1.0, 2.0]),
               values=np.array([0.0, 1.0, 0.5]))
    t = np.array([-1.0, 0.5, 1.5, 3.0])
    assert np.allclose(s(t), [0.0, 0.5, 0.75, 0.5])


def test_pulse_shape():
    s = Source(kind="pulse", v1=0.0, v2=1.0, td=1.0, tr=1.0, tf=1.0,
               pw=2.0, period=10.0)
    # before delay
    assert s(np.array([0.5]))[0] == 0.0
    # mid-rise
    assert s(np.array([1.5]))[0] == pytest.approx(0.5)
    # plateau
    assert s(np.array([2.5]))[0] == 1.0
    assert s(np.array([3.5]))[0] == 1.0
    # mid-fall
    assert s(np.array([4.5]))[0] == pytest.approx(0.5)
    # back to v1
    assert s(np.array([6.0]))[0] == 0.0
    # periodic repeat
    assert s(np.array([11.5]))[0] == pytest.approx(0.5)


def test_pulse_zero_rise_fall():
    s = Source(kind="pulse", v1=0.0, v2=1.0, td=0.0, tr=0.0, tf=0.0,
               pw=1.0, period=2.0)
    assert s(np.array([0.5]))[0] == 1.0
    assert s(np.array([1.5]))[0] == 0.0


def test_source_table_grid():
    srcs = [Source(kind="dc", dc=1.0),
            Source(kind="pwl", times=np.array([0.0, 1e-3]),
                   values=np.array([0.0, 1.0]))]
    U = source_table(srcs, tstep=1e-4, tstop=1e-3)
    assert U.shape == (10, 2)
    assert np.allclose(U[:, 0], 1.0)
    # t_k = (k+1)*h convention
    assert U[0, 1] == pytest.approx(0.1)
    assert U[-1, 1] == pytest.approx(1.0)
    assert np.allclose(dc_values(srcs), [1.0, 0.0])


def test_device_pwl_table_matches_host():
    srcs = [
        Source(kind="dc", dc=0.7),
        Source(kind="pwl", times=np.array([0.0, 0.3, 0.6, 1.0]),
               values=np.array([0.0, 1.0, -1.0, 2.0])),
        Source(kind="pulse", v1=0.0, v2=1.0, td=0.1, tr=0.05, tf=0.05,
               pw=0.2, period=0.5),
    ]
    tab = DevicePwlTable.build(srcs, tstop=1.0, dtype=jnp.float64,
                               pulse_samples=2048)
    for t in [0.0, 0.15, 0.33, 0.51, 0.77, 0.99]:
        host = eval_sources(srcs, np.array([t]))[0]
        dev = np.asarray(tab(jnp.float64(t)))
        assert np.allclose(dev, host, atol=2e-3), (t, dev, host)
