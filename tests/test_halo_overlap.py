"""Structural verification of the halo comm/compute overlap claim
(parallel/dist_gmres.py HaloShardedOp docstring): the interior SpMV must
have NO dataflow dependency on the two ``ppermute``s, so XLA's latency-
hiding scheduler is free to run it while the halo is in flight over ICI.

Real-ICI timing needs >1 chip (out of scope on this 1-chip env); what CAN
be pinned is the dependency structure: in the lowered module, at least one
reduction (the interior row-sum) must not transitively consume any
collective-permute result, while the final output consumes both. A
regression that concatenates the halo into x before one big dot would
create that dependency and serialize comm behind compute."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gmres_tpu.parallel.dist_gmres import DistGmresSolver, HaloShardedOp
from gmres_tpu.parallel.mesh import make_mesh, row_specs

from conftest import poisson2d


def _dep_graphs(hlo_text):
    """List of name -> (op, [operand names]) graphs, one per SSA scope.
    Nested regions (the shard_map body) renumber values from %0, so a new
    scope starts whenever a name is redefined."""
    graphs = [{}]
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w#.\-]+)\s*=\s*(.*)$", line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        opm = re.search(r"(?:stablehlo\.|mhlo\.)?\"?([\w.\-]+)\"?[(\s]", rhs)
        op = opm.group(1) if opm else ""
        operands = re.findall(r"%([\w#.\-]+)", rhs)
        if name in graphs[-1]:
            graphs.append({})
        graphs[-1][name] = (op, operands)
    return graphs


def _reaches(graph, start, targets, memo):
    if start in memo:
        return memo[start]
    memo[start] = False  # cycle guard
    _, operands = graph.get(start, ("", []))
    hit = start in targets or any(
        _reaches(graph, o, targets, memo) for o in operands
    )
    memo[start] = hit
    return hit


def test_interior_dot_independent_of_ppermute():
    A = poisson2d(64)  # 4096 rows, bandwidth 64 << rows/dev
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond=None, dtype=jnp.float32)
    assert isinstance(s.Aop, HaloShardedOp), s.comm

    def apply_op(Aop, x):
        return Aop(x)

    f = jax.jit(jax.shard_map(
        apply_op, mesh=mesh,
        in_specs=(row_specs(s.Aop, "rows"), P("rows")),
        out_specs=P("rows"), check_vma=False,
    ))
    x = jnp.zeros((s.part.n_padded,), jnp.float32)
    txt = f.lower(s.Aop, x).as_text()
    scopes = [
        g for g in _dep_graphs(txt)
        if any("collective_permute" in op or "collective-permute" in op
               for op, _ in g.values())
    ]
    assert scopes, "no collective_permute lowered — halo path not exercised"
    graph = scopes[0]
    perms = {n for n, (op, _) in graph.items() if "collective_permute" in op
             or "collective-permute" in op}
    reduces = [n for n, (op, _) in graph.items()
               if op.split(".")[-1] in ("reduce", "dot_general", "dot")]
    assert reduces, "no reductions found in lowered module"
    dep = {n: _reaches(graph, n, perms, {}) for n in reduces}
    # the interior row-sum is ppermute-independent...
    assert any(not d for d in dep.values()), (
        "every reduction depends on the collective_permute — interior/halo "
        f"split lost, overlap impossible: {dep}")
    # ...and the halo contribution does consume the ppermute results
    assert any(dep.values()), (
        "no reduction consumes the ppermute — halo contribution missing")


def test_halo_telemetry_recorded():
    A = poisson2d(64)
    mesh = make_mesh(n_rows=4, n_batch=1)
    s = DistGmresSolver(A, mesh, precond=None, dtype=jnp.float32)
    st = s.comm_stats
    assert st and len(st["interior_nnz"]) == 4 and len(st["halo_nnz"]) == 4
    total = sum(st["interior_nnz"]) + sum(st["halo_nnz"])
    assert total == A.nnz
    # boundary work must be a small fraction of interior work on a banded
    # matrix — the premise of the overlap design
    assert sum(st["halo_nnz"]) < 0.1 * sum(st["interior_nnz"])
