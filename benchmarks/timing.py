"""Robust on-device timing over the tunneled (axon) backend.

The relay adds a ~23 ms fixed round-trip per dispatched call with ~1-2 ms
jitter, so per-op time must be measured as the SLOPE between two chained
iteration counts, each taken as a min over repetitions, with a span large
enough that the op dwarfs the jitter.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def chain_time(fn, x, iters, reps=5):
    """Min wall time of one jitted chain of ``iters`` applications."""

    @jax.jit
    def chain(v, it):
        return lax.fori_loop(0, it, lambda i, u: fn(u) * 0.08, v)

    _ = float(jnp.sum(chain(x, iters)))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(chain(x, iters)))
        best = min(best, time.perf_counter() - t0)
    return best


def op_time(fn, x, target_span=0.05, n1=10, reps=5, max_n2=20000):
    """Per-application seconds of ``fn`` with the fixed call cost removed.

    Picks n2 so the incremental work is ~``target_span`` seconds (>=25x the
    observed relay jitter), then returns (t(n2) - t(n1)) / (n2 - n1).
    """
    t1 = chain_time(fn, x, n1, reps)
    # pilot estimate with a modest span
    n_pilot = n1 + 200
    tp = chain_time(fn, x, n_pilot, reps=3)
    per = max((tp - t1) / (n_pilot - n1), 1e-9)
    n2 = int(min(max(n_pilot, n1 + target_span / per), max_n2))
    if n2 <= n_pilot:
        return per
    t2 = chain_time(fn, x, n2, reps)
    return max((t2 - t1) / (n2 - n1), 1e-12)
