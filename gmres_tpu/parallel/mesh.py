"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "row_specs", "row_shardings"]


def make_mesh(n_rows: Optional[int] = None, n_batch: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D ("rows") or 2-D ("rows","batch") mesh. Rows = matrix partition
    axis, batch = independent-RHS / frequency-sample axis (SURVEY §2.7 P7's
    row-parallel x sample-parallel 2-D mesh)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_rows is None:
        n_rows = len(devices) // n_batch
    used = devices[: n_rows * n_batch]
    arr = np.array(used).reshape(n_rows, n_batch)
    return Mesh(arr, ("rows", "batch"))


def row_specs(pytree, axis: str = "rows"):
    """Build a PartitionSpec pytree sharding the leading axis of every array
    leaf over ``axis`` (scalars replicated)."""

    def spec(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "ndim") else leaf
        if arr.ndim == 0:
            return P()
        return P(axis, *([None] * (arr.ndim - 1)))

    return jax.tree.map(spec, pytree)


def row_shardings(pytree, mesh: Mesh, axis: str = "rows"):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), row_specs(pytree, axis)
    )
