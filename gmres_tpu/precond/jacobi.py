"""Jacobi / diagonal preconditioner.

The reference stores the inverse diagonal as a 1-row CSR and applies it as an
SpMV or a dedicated kernel (MyDIAG, preconditioner.cu:480-541); on TPU it is
one elementwise multiply.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix, to_device

__all__ = ["JacobiPrecond", "jacobi"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["inv_diag"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class JacobiPrecond:
    inv_diag: jax.Array

    def __call__(self, v: jax.Array) -> jax.Array:
        return self.inv_diag * v


def jacobi(A: CSRMatrix, dtype=jnp.float32) -> JacobiPrecond:
    d = A.diagonal()
    d = np.where(np.abs(d) > 0, d, 1.0)
    return JacobiPrecond(inv_diag=to_device(1.0 / d, dtype))
