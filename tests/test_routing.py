"""Production SpMV routing guarantee (VERDICT r2 #6).

The raw gather kernels (WELL slab/v1) sit below the reference's 5 Gnnz/s
C2070 bar (src/SpMV_kernel.cu:166-251); the DIA / hybrid DIA+COO paths sit
far above it (48x / 1.38x measured). These tests pin the guarantee that the
*flagship engines' hot operators* — the matrices multiplied every Krylov
iteration — route onto DIA/hybrid, never onto the sub-bar gather paths:

- PG contest netlists loaded with ``order="auto"`` (geometric renumbering)
  present A = G + C/h as a stencil + scattered vias -> DIA or hybrid.
- Thermal GCB systems are 3-D stencils -> DIA.
- ``transient_gmres`` keeps the operator in NATURAL order even when the
  SystemTransform fires (decoupled hooks), so the guarantee survives the
  realistic saddle-point MNA path.

Telemetry: every routing decision is recorded in
``gmres_tpu.ops.spmv.routing_log()`` (format-selection prints of the
reference, main2.cu:198-208).
"""

import os
import tempfile
import numpy as np
import pytest

from gmres_tpu.frontend.fixtures import write_gcb_dir, write_pg_netlist
from gmres_tpu.frontend.gcb import read_gcb
from gmres_tpu.frontend.mna import load_netlist
from gmres_tpu.ops.formats import CSRMatrix, DiaMatrix
from gmres_tpu.ops.spmv import device_matrix, routing_log, stencil_matrix
from gmres_tpu.ops.well import HybridMatrix

FAST = (DiaMatrix, HybridMatrix)


@pytest.fixture(scope="module")
def pg_mna(tmp_path_factory):
    p = tmp_path_factory.mktemp("routing") / "pg.sp"
    write_pg_netlist(str(p), nx=50, layers=2, seed=3)
    return load_netlist(str(p), order="auto")


def test_pg_contest_operator_routes_fast(pg_mna):
    """A = G + C/h of the geometric-ordered contest netlist must ride
    DIA/hybrid under the TPU routing (the backend the guarantee is for)."""
    mna = pg_mna
    A = CSRMatrix.from_scipy(mna.G.to_scipy() + mna.C.to_scipy() / mna.tstep)
    routing_log(clear=True)
    dev = device_matrix(A, backend="tpu")
    assert isinstance(dev, FAST), type(dev).__name__
    entries = routing_log()
    assert entries and entries[-1][3] in ("DiaMatrix", "HybridMatrix")


def test_pg_decoupled_stencil_path(pg_mna):
    """The decoupled transform path (transient.py:226) asks stencil_matrix
    for the natural-order operator; on the contest class it must succeed
    (None would silently re-route the whole transient onto the transformed
    RCM ordering and the gather kernels)."""
    mna = pg_mna
    A = CSRMatrix.from_scipy(mna.G.to_scipy() + mna.C.to_scipy() / mna.tstep)
    S = stencil_matrix(A)
    assert S is not None and isinstance(S, FAST)


def test_thermal_gcb_operator_routes_dia(tmp_path):
    d = tmp_path / "gcb"
    write_gcb_dir(str(d), nx=16, nz=4)
    sys_ = read_gcb(str(d))
    A = sys_.A if isinstance(sys_.A, CSRMatrix) else CSRMatrix.from_scipy(sys_.A)
    routing_log(clear=True)
    dev = device_matrix(A, backend="tpu")
    assert isinstance(dev, FAST), type(dev).__name__


def test_discovery_order_documented_escape_hatch(pg_mna):
    """Discovery-order loads CAN fall off the fast path — that is the
    documented failure mode order="auto" exists to prevent. Pin that the
    guarantee is delivered by the loader default, not by accident: auto
    ordering yields >=10x fewer distinct diagonal offsets."""
    mna = pg_mna

    def n_offsets(m):
        sp = m.G.to_scipy().tocoo()
        return np.unique(sp.col.astype(np.int64) - sp.row.astype(np.int64)).size

    # rebuild the same netlist in discovery order for comparison
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "pg.sp")
        write_pg_netlist(p, nx=50, layers=2, seed=3)
        disc = load_netlist(p, order="natural")
        assert n_offsets(disc) >= 10 * n_offsets(mna)


def test_opaque_names_route_fast_path(tmp_path):
    """A 100K-node netlist with OPAQUE node names (no coordinate tuples)
    must still land the operator on the DIA/hybrid fast-path formats
    (VERDICT r3 #7). The load-time policy measures: geometric naming fails
    -> hybrid-viability score of discovery order (for this class the
    element listing keeps the 5 stencil diagonals and the post-promotion
    remainder fits the COO bound) -> RCM only if it measurably wins
    (here it would shred coverage 86.5% -> 19.8%, so it must NOT fire)."""
    import random
    import re

    src = tmp_path / "pg.sp"
    write_pg_netlist(src, nx=224, layers=2, seed=5)
    txt = src.read_text()
    names = sorted(set(re.findall(r"\bn\d+_\d+_\d+\b", txt)))
    rng = random.Random(0)
    order = list(range(len(names)))
    rng.shuffle(order)
    mapping = {nm: f"x{order[k]}q" for k, nm in enumerate(names)}
    dst = tmp_path / "pg_opaque.sp"
    dst.write_text(re.sub(r"\bn\d+_\d+_\d+\b",
                          lambda m: mapping[m.group(0)], txt))

    from gmres_tpu.frontend.mna import geometric_node_order

    mna = load_netlist(str(dst))           # order="auto"
    assert mna.num_nodes >= 100_000
    assert geometric_node_order(mna.node_index, mna.num_nodes) is None
    dev = device_matrix(mna.G, backend="tpu")
    assert isinstance(dev, FAST), type(dev).__name__
    # the hybrid's remainder must be a fast scattered-entry class: the
    # scatter-planes slab (r5: ~few us for tens of K scattered entries) or
    # COO for tiny tails — never the v1 gather fallback
    if isinstance(dev, HybridMatrix):
        from gmres_tpu.ops.formats import DeviceCOO
        from gmres_tpu.ops.well import WellSlabMatrix

        assert isinstance(dev.rest, (DeviceCOO, WellSlabMatrix)), \
            type(dev.rest).__name__
