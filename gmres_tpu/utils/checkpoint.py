"""Transient checkpoint/resume.

The reference's only persistence is the out-of-core DD save/load
(dd_save_load.cpp); simulation state is lost on failure. Here long
transients run in chunks of the jitted scan, persisting (step, state,
accumulated outputs) after each chunk, and resume from the newest
checkpoint — cheap insurance for multi-hour runs on preemptible TPUs.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np

import jax.numpy as jnp

from gmres_tpu.models.thermal import TransientResult, thermal_transient

__all__ = ["save_state", "load_state", "thermal_transient_checkpointed"]


def save_state(path: str, step: int, x: np.ndarray, outputs: dict) -> None:
    """Atomic write (tmp + rename) so a crash mid-save never corrupts."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, step=np.asarray(step), x=np.asarray(x),
                     **{f"out_{k}": np.asarray(v) for k, v in outputs.items()})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_state(path: str):
    if not os.path.exists(path):
        return None
    z = np.load(path)
    outputs = {k[4:]: z[k] for k in z.files if k.startswith("out_")}
    return int(z["step"]), z["x"], outputs


def thermal_transient_checkpointed(
    A, B, C_over_h, U,
    x0=None,
    *,
    checkpoint_path: str,
    chunk_steps: int = 256,
    **kw,
) -> TransientResult:
    """Same contract as thermal_transient, resumable from checkpoint_path."""
    if kw.get("ports") is not None:
        raise ValueError(
            "checkpointed transient requires full-state recording (ports=None)"
        )
    U = np.asarray(U)
    total = U.shape[0]
    start = 0
    x = x0
    acc = {"X": [], "iterations": [], "residuals": [], "converged": []}
    st = load_state(checkpoint_path)
    if st is not None:
        start, x_np, outputs = st
        x = jnp.asarray(x_np)
        for k in acc:
            if k in outputs and outputs[k].size:
                acc[k] = [outputs[k]]
    k0 = start
    while k0 < total:
        k1 = min(k0 + chunk_steps, total)
        res = thermal_transient(A, B, C_over_h, U[k0:k1], x0=x, **kw)
        acc["X"].append(np.asarray(res.X))
        acc["iterations"].append(np.asarray(res.iterations))
        acc["residuals"].append(np.asarray(res.residuals))
        acc["converged"].append(np.asarray(res.converged))
        x = jnp.asarray(acc["X"][-1][-1])
        save_state(
            checkpoint_path, k1, np.asarray(x),
            {k: np.concatenate(v) for k, v in acc.items()},
        )
        k0 = k1
    return TransientResult(
        X=np.concatenate(acc["X"]),
        iterations=np.concatenate(acc["iterations"]),
        residuals=np.concatenate(acc["residuals"]),
        converged=np.concatenate(acc["converged"]),
    )
