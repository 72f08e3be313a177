"""WELL (windowed-ELL) format: packing, reference executor, and the Pallas
kernel in interpreter mode, all vs the SciPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix
from gmres_tpu.ops.well import to_well, well_spmv, well_spmv_reference

from conftest import poisson2d, random_sparse


def _pad_x(x, n_pad):
    out = np.zeros(n_pad, dtype=x.dtype)
    out[: len(x)] = x
    return out


@pytest.mark.parametrize("maker", [
    lambda: poisson2d(9),
    lambda: poisson2d(16, 5),
    lambda: random_sparse(300, 0.02, seed=1),
    lambda: random_sparse(130, 0.15, seed=2),
])
def test_reference_executor_matches_scipy(maker):
    A = maker()
    W = to_well(A, dtype=jnp.float64)
    n = A.shape[0]
    x = np.random.default_rng(0).standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, xp))[:n]
    ref = A.matvec(x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


@pytest.mark.parametrize("tps", [4, 16])
def test_pallas_kernel_interpret(tps):
    A = random_sparse(260, 0.03, seed=3)
    W = to_well(A, dtype=jnp.float64, tiles_per_step=tps)
    n = A.shape[0]
    x = np.random.default_rng(1).standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv(W, xp, interpret=True))[:n]
    ref = A.matvec(x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-12


def test_empty_rows_and_wide_rows():
    import scipy.sparse as sp
    from gmres_tpu.ops.formats import CSRMatrix

    rng = np.random.default_rng(4)
    n = 200
    # some empty rows, one very dense row spanning many windows
    rows = np.concatenate([rng.integers(0, n, 500), np.full(150, 77)])
    cols = np.concatenate([rng.integers(0, n, 500), rng.choice(n, 150, False)])
    vals = rng.standard_normal(len(rows))
    A = CSRMatrix.from_scipy(
        sp.csr_matrix((vals, (rows, cols)), shape=(n, n)))
    W = to_well(A, dtype=jnp.float64)
    x = rng.standard_normal(n)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, xp))[:n]
    assert np.allclose(y, A.matvec(x), atol=1e-12)
    y2 = np.asarray(well_spmv(W, xp, interpret=True))[:n]
    assert np.allclose(y2, A.matvec(x), atol=1e-12)


def test_slot_utilization_reasonable_on_stencil():
    A = poisson2d(20)
    W = to_well(A, dtype=jnp.float32)
    slots = np.prod(W.vals.shape)
    util = A.nnz / slots
    # 5-point stencil after natural ordering: 3 windows/tile, ~2 slots used
    assert util > 0.05


def test_rectangular_tall():
    import scipy.sparse as sp
    from gmres_tpu.ops.formats import CSRMatrix

    rng = np.random.default_rng(5)
    n, m = 300, 40
    k = 200
    A = CSRMatrix.from_scipy(sp.csr_matrix(
        (rng.standard_normal(k),
         (rng.integers(0, n, k), rng.integers(0, m, k))), shape=(n, m)))
    W = to_well(A, dtype=jnp.float64)
    u = rng.standard_normal(m)
    up = jnp.asarray(_pad_x(u, W.shape[1]))
    y = np.asarray(well_spmv_reference(W, up))[:n]
    assert np.allclose(y, A.matvec(u), atol=1e-12)
    y2 = np.asarray(well_spmv(W, up, interpret=True))[:n]
    assert np.allclose(y2, A.matvec(u), atol=1e-12)


def test_spmv_dispatch_well():
    from gmres_tpu.ops.spmv import spmv

    A = random_sparse(200, 0.04, seed=6)
    W = to_well(A, dtype=jnp.float64)
    x = np.random.default_rng(0).standard_normal(200)
    xp = jnp.asarray(_pad_x(x, W.shape[1]))
    y = np.asarray(spmv(W, xp))[:200]
    assert np.allclose(y, A.matvec(x), atol=1e-12)


def _banded_pg(n=4000, seed=0, extra=()):
    """RCM-banded PG-like matrix, optionally with long-range via entries."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    nx = int(np.sqrt(n))
    n = nx * nx
    rng = np.random.default_rng(seed)
    i = np.arange(n)
    right = i[(i % nx) < nx - 1]
    down = i[i < n - nx]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + nx])
    g = rng.uniform(0.5, 2.0, rows.shape[0])
    G = sp.coo_matrix((-g, (rows, cols)), shape=(n, n))
    G = (G + G.T).tolil()
    for (a, b, v) in extra:
        G[a % n, b % n] = v
    G = G.tocsr()
    d = -np.asarray(G.sum(axis=1)).ravel() + 1e-3
    A = (G + sp.diags(d)).tocsr()
    p = reverse_cuthill_mckee(A, symmetric_mode=True)
    return A[p][:, p].tocsr()


def test_well_slab_matches_oracle():
    from gmres_tpu.ops.well import (to_well_slab, well_slab_spmv,
                                    well_slab_spmv_reference)

    A = _banded_pg()
    W = to_well_slab(CSRMatrix.from_scipy(A), dtype=jnp.float64)
    assert W is not None, "banded PG matrix must fit the slab envelope"
    assert W.spill_nnz == 0
    rng = np.random.default_rng(1)
    x = rng.standard_normal(W.shape[1])
    y_ref = A.astype(np.float64) @ x[: A.shape[0]]
    y1 = np.asarray(well_slab_spmv_reference(W, jnp.asarray(x)))
    assert np.abs(y1[: A.shape[0]] - y_ref).max() < 1e-10
    y2 = np.asarray(well_slab_spmv(W, jnp.asarray(x), interpret=True))
    assert np.abs(y2[: A.shape[0]] - y_ref).max() < 1e-10


def test_well_slab_spill_path():
    """Long-range vias that defeat the dense slab window route to the
    scatter planes (each plane carries its own window base — no COO
    spill); results stay exact."""
    from gmres_tpu.ops.well import (to_well_slab, well_slab_spmv,
                                    well_slab_spmv_reference)

    rng = np.random.default_rng(2)
    extra = [(int(a), int(a) + 2000, 1.5)
             for a in rng.integers(0, 1500, 10)]
    A = _banded_pg(extra=extra)
    W = to_well_slab(CSRMatrix.from_scipy(A), dtype=jnp.float64, slab_cap=16)
    assert W is not None
    assert W.spill_nnz == 0 and W.has_planes
    x = rng.standard_normal(W.shape[1])
    y_ref = A.astype(np.float64) @ x[: A.shape[0]]
    y1 = np.asarray(well_slab_spmv_reference(W, jnp.asarray(x)))
    assert np.abs(y1[: A.shape[0]] - y_ref).max() < 1e-10
    y2 = np.asarray(well_slab_spmv(W, jnp.asarray(x), interpret=True))
    assert np.abs(y2[: A.shape[0]] - y_ref).max() < 1e-10


def test_well_slab_unbanded_small():
    """Unbanded but small: the whole x fits one slab, so v2 still applies
    (the chunk-group grid has no per-step chunk-count cap)."""
    from gmres_tpu.ops.well import to_well_slab, well_slab_spmv

    A = random_sparse(3000, 0.003, seed=0)
    W = to_well_slab(CSRMatrix.from_scipy(A.to_scipy()), dtype=jnp.float64)
    # slab must span every REAL window (columns pad square to the row tile
    # grid, but windows past round_up(n, 128) are empty and need no slab)
    assert W is not None and W.slab == -(-3000 // 128)
    x = np.random.default_rng(3).standard_normal(W.shape[1])
    y_ref = A.to_scipy().astype(np.float64) @ x[:3000]
    y = np.asarray(well_slab_spmv(W, jnp.asarray(x), interpret=True))
    assert np.abs(y[:3000] - y_ref).max() < 1e-10


def test_well_slab_wide_footprint_handled():
    """A matrix whose footprint exceeds the dense slab cap no longer
    bails: out-of-slab entries route to scatter planes (each plane has its
    own window base) and the result stays exact."""
    from gmres_tpu.ops.well import (to_well_slab, well_slab_spmv,
                                    well_slab_spmv_reference)

    A = random_sparse(3000, 0.003, seed=0)
    W = to_well_slab(CSRMatrix.from_scipy(A.to_scipy()),
                     dtype=jnp.float64, slab_cap=8)
    assert W is not None and W.spill_nnz == 0
    rng = np.random.default_rng(3)
    x = rng.standard_normal(W.shape[1])
    y_ref = A.to_scipy().astype(np.float64) @ x[: A.shape[0]]
    y1 = np.asarray(well_slab_spmv_reference(W, jnp.asarray(x)))
    assert np.abs(y1[: A.shape[0]] - y_ref).max() < 1e-10
    y2 = np.asarray(well_slab_spmv(W, jnp.asarray(x), interpret=True))
    assert np.abs(y2[: A.shape[0]] - y_ref).max() < 1e-10


def test_well_slab_bails_on_lane_collisions():
    """Pathological per-lane collisions (a dense COLUMN: every row hits
    the same (bucket, output-lane) cells) degenerate the planes to ~one
    entry each; the packer must bail to the v1 fallback (None)."""
    import scipy.sparse as sp

    from gmres_tpu.ops.well import to_well_slab

    n = 65536
    cols = np.arange(0, n, 2)  # one dense ROW: every entry on output lane 0
    A = sp.coo_matrix((np.ones(cols.size), (np.zeros(cols.size), cols)),
                      shape=(n, n)).tocsr()
    W = to_well_slab(CSRMatrix.from_scipy(A.tocsr()), plane_min=10 ** 9)
    assert W is None


def test_hybrid_dia_plus_spill():
    """Natural-ordering PG grid + vias: dense diagonals ride DIA, vias go
    through the slab/COO remainder; exact vs SciPy."""
    import scipy.sparse as sp

    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.ops.well import HybridMatrix, to_hybrid

    rng = np.random.default_rng(4)
    nx = 60
    n = nx * nx
    i = np.arange(n)
    right = i[(i % nx) < nx - 1]
    down = i[i < n - nx]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + nx])
    keep = rng.random(rows.shape[0]) > 0.08
    rows, cols = rows[keep], cols[keep]
    vr = rng.integers(0, n, n // 50)
    vc = (vr + rng.integers(nx * 3, nx * 20, n // 50)) % n
    rows = np.concatenate([rows, vr])
    cols = np.concatenate([cols, vc])
    g = rng.uniform(0.5, 2.0, rows.shape[0])
    G = sp.coo_matrix((-g, (rows, cols)), shape=(n, n))
    G = G + G.T
    A = (G + sp.diags(-np.asarray(G.sum(axis=1)).ravel() + 1e-3)).tocsr()

    H = to_hybrid(CSRMatrix.from_scipy(A), dtype=jnp.float64)
    assert isinstance(H, HybridMatrix)
    assert len(H.dia.offsets) <= 8          # stencil diagonals only
    x = np.random.default_rng(5).standard_normal(H.shape[1])
    y = np.asarray(spmv(H, jnp.asarray(x)))[:n]
    y_ref = A.astype(np.float64) @ x[:n]
    assert np.abs(y - y_ref).max() < 1e-10


def test_hybrid_rejects_scattered():
    from gmres_tpu.ops.well import to_hybrid

    A = random_sparse(2000, 0.005, seed=1)
    assert to_hybrid(CSRMatrix.from_scipy(A.to_scipy())) is None


def test_hybrid_permuted_rest_exact():
    """A hybrid remainder too wide for the dense slab envelope
    (discovery-order node numbering scattering one layer over 100K+
    offsets — the 2.1M netlist shape) now packs DIRECTLY: the scattered
    entries become scatter planes, each carrying its own window base
    (r5; previously this forced a PermutedMatrix with two O(n) gathers
    per apply). The product stays exact."""
    import scipy.sparse as sp

    import jax.numpy as jnp

    from gmres_tpu.ops.spmv import spmv
    from gmres_tpu.ops.well import PermutedMatrix, to_hybrid

    rng = np.random.default_rng(0)
    n = 1 << 17
    main = sp.diags([np.full(n, 4.0), np.full(n - 1, -1.0),
                     np.full(n - 1, -1.0)], [0, -1, 1])
    m = 150000  # banded graph under a random relabeling: RCM recovers it
    rb = rng.integers(0, n, m)
    cb = np.clip(rb + rng.integers(1, 40, m), 0, n - 1)
    relab = rng.permutation(n)
    Sc = sp.coo_matrix((rng.standard_normal(m), (relab[rb], relab[cb])),
                       shape=(n, n))
    S = (main + Sc + Sc.T).tocsr()
    H = to_hybrid(CSRMatrix.from_scipy(S), dtype=jnp.float64,
                  promote_min=float("inf"))
    from gmres_tpu.ops.well import WellSlabMatrix

    assert isinstance(H.rest, (WellSlabMatrix, PermutedMatrix))
    if isinstance(H.rest, WellSlabMatrix):
        assert H.rest.plane_nnz > 0
    x = rng.standard_normal(H.shape[1])
    y = np.asarray(spmv(H, jnp.asarray(x)))[:n]
    yref = S @ x[:n]
    assert np.linalg.norm(y - yref) / np.linalg.norm(yref) < 1e-12
