"""Source waveforms: DC, PWL, PULSE.

Covers the reference's source machinery: host-side PWL interpolation with
precomputed slopes (interp.cpp:126-330) and the on-device waveform-table
generation kernels (kernels.cu gen_dcVt/gen_PWLut/gen_PULSEut, :4-357).
Here the table U[k, s] = u_s(t_k) is built vectorized on the host (NumPy)
and shipped to HBM once; an in-graph PWL evaluator is provided for
memory-light on-device generation (vmapped searchsorted — the TPU analogue
of gen_PWLut_kernel).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Source", "dc_values", "eval_sources", "source_table",
           "DevicePwlTable"]


@dataclasses.dataclass
class Source:
    """One independent source waveform (V or I)."""

    kind: str  # "dc" | "pwl" | "pulse"
    dc: float = 0.0
    # PWL: breakpoints
    times: Optional[np.ndarray] = None
    values: Optional[np.ndarray] = None
    # PULSE(v1 v2 td tr tf pw period)
    v1: float = 0.0
    v2: float = 0.0
    td: float = 0.0
    tr: float = 0.0
    tf: float = 0.0
    pw: float = 0.0
    period: float = 0.0

    def __call__(self, t):
        """Evaluate at time(s) t (NumPy, vectorized)."""
        t = np.asarray(t, dtype=np.float64)
        if self.kind == "dc":
            return np.full_like(t, self.dc)
        if self.kind == "pwl":
            # constant extrapolation on both ends (interp.cpp behavior)
            return np.interp(t, self.times, self.values)
        if self.kind == "pulse":
            per = self.period if self.period > 0 else np.inf
            tau = np.where(t < self.td, -1.0, np.mod(t - self.td, per))
            v = np.full_like(t, self.v1)
            tr = max(self.tr, 1e-30)
            tf = max(self.tf, 1e-30)
            rise = self.v1 + (self.v2 - self.v1) * (tau / tr)
            fall = self.v2 + (self.v1 - self.v2) * ((tau - tr - self.pw) / tf)
            v = np.where((tau >= 0) & (tau < tr), rise, v)
            v = np.where((tau >= tr) & (tau < tr + self.pw), self.v2, v)
            v = np.where(
                (tau >= tr + self.pw) & (tau < tr + self.pw + tf), fall, v
            )
            return v
        raise ValueError(f"unknown source kind {self.kind}")

    @property
    def value_at_0(self) -> float:
        return float(self(np.zeros(1))[0])


def dc_values(sources: Sequence[Source]) -> np.ndarray:
    return np.array([s.value_at_0 for s in sources])


def eval_sources(sources: Sequence[Source], t: np.ndarray) -> np.ndarray:
    """U[k, s] = value of source s at time t[k]; shape (len(t), len(sources))."""
    if not sources:
        return np.zeros((len(t), 0))
    return np.stack([s(t) for s in sources], axis=1)


def source_table(sources: Sequence[Source], tstep: float, tstop: float,
                 tstart: float = 0.0) -> np.ndarray:
    """Time grid t_k = tstart + (k+1)*tstep (backward-Euler solves for the
    state at the *end* of each step, mna_solve.cpp's loop convention)."""
    nsteps = int(np.floor((tstop - tstart) / tstep + 0.5))
    t = tstart + tstep * (np.arange(nsteps) + 1)
    return eval_sources(sources, t)


@dataclasses.dataclass
class DevicePwlTable:
    """Padded PWL tables for in-graph evaluation: all sources' breakpoints in
    (n_src, max_pts) arrays; DC/PULSE sources are sampled into PWL form at
    build time. u(t) = vmapped linear interp, usable inside lax.scan."""

    times: jax.Array   # (n_src, P)
    values: jax.Array  # (n_src, P)

    @classmethod
    def build(cls, sources: Sequence[Source], tstop: float,
              pulse_samples: int = 256, dtype=jnp.float32):
        ts, vs = [], []
        for s in sources:
            if s.kind == "pwl":
                t = np.asarray(s.times, np.float64)
                v = np.asarray(s.values, np.float64)
            elif s.kind == "dc":
                t = np.array([0.0, tstop])
                v = np.array([s.dc, s.dc])
            else:
                t = np.linspace(0.0, tstop, pulse_samples)
                v = s(t)
            ts.append(t)
            vs.append(v)
        P = max(len(t) for t in ts)
        T = np.zeros((len(ts), P))
        V = np.zeros((len(ts), P))
        for i, (t, v) in enumerate(zip(ts, vs)):
            T[i, : len(t)] = t
            T[i, len(t):] = t[-1] + 1.0 + np.arange(P - len(t))  # keep sorted
            V[i, : len(v)] = v
            V[i, len(v):] = v[-1]
        return cls(times=jnp.asarray(T, dtype), values=jnp.asarray(V, dtype))

    def __call__(self, t) -> jax.Array:
        def one(tt, vv):
            return jnp.interp(t, tt, vv)

        return jax.vmap(one)(self.times, self.values)


jax.tree_util.register_dataclass(
    DevicePwlTable, data_fields=["times", "values"], meta_fields=[]
)
