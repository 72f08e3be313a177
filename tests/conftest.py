"""Test harness: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests validate against
XLA's CPU backend with 8 virtual devices (the 'fake backend' role of
SURVEY.md §4). x64 is enabled so f64 oracles match SciPy bit-for-bit.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) before python
# starts; the env var is latched at import, so force CPU via the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: GMRES while-loops are compile-heavy on the CPU
# backend; cache across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/gmres_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from gmres_tpu.ops.formats import CSRMatrix  # noqa: E402


def poisson2d(nx: int, ny: int = None) -> CSRMatrix:
    """5-point Laplacian on an nx-by-ny grid — the reference's own sanity
    matrix (src_thermal/ainv.cu:62 uses cusp poisson5pt)."""
    ny = ny or nx
    ex = np.ones(nx)
    ey = np.ones(ny)
    Tx = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1])
    Ty = sp.diags([-ey[:-1], 2 * ey, -ey[:-1]], [-1, 0, 1])
    A = sp.kron(sp.eye(ny), Tx) + sp.kron(Ty, sp.eye(nx))
    return CSRMatrix.from_scipy(A.tocsr())


def random_sparse(n: int, density: float = 0.01, seed: int = 0,
                  diag_boost: float = 10.0) -> CSRMatrix:
    """Random diagonally-dominant unsymmetric matrix (GMRES-friendly)."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csr")
    A = A + diag_boost * sp.eye(n)
    return CSRMatrix.from_scipy(A.tocsr())


@pytest.fixture
def poisson64():
    return poisson2d(8)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
