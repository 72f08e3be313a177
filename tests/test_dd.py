"""Domain decomposition (Schur complement) vs direct solve, including the
out-of-core variant and save/load (reference's -np path oracles)."""

import numpy as np
import pytest

from gmres_tpu.parallel.dd import (
    DDSolver, dd_form, dd_solve, load_matrix, partition_graph, save_matrix,
)
from gmres_tpu.solvers.direct import SparseLU

from conftest import poisson2d, random_sparse


def test_partition_covers_all():
    A = poisson2d(12)
    part = partition_graph(A, 4)
    assert part.shape == (144,)
    assert set(part) == {0, 1, 2, 3}
    # reasonably balanced
    counts = np.bincount(part)
    assert counts.min() > 0.5 * counts.max()


@pytest.mark.parametrize("nparts", [2, 3, 4])
def test_dd_solve_matches_direct(nparts):
    A = poisson2d(11)
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    x_ref = SparseLU(A).solve(b)
    x = dd_solve(A, b, nparts)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-10


def test_dd_unsymmetric():
    A = random_sparse(120, 0.04, seed=3, diag_boost=4.0)
    b = np.random.default_rng(1).standard_normal(120)
    x_ref = SparseLU(A).solve(b)
    x = dd_solve(A, b, 3, workers=3)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-9


def test_dd_out_of_core():
    A = poisson2d(10)
    b = np.random.default_rng(2).standard_normal(100)
    x_ref = SparseLU(A).solve(b)
    x = dd_solve(A, b, 2, out_of_core=True)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-10


def test_dd_solver_reuse_multiple_rhs():
    A = poisson2d(9)
    part = partition_graph(A, 3)
    form = dd_form(A, part)
    s = DDSolver(form)
    lu = SparseLU(A)
    for seed in range(3):
        b = np.random.default_rng(seed).standard_normal(81)
        assert np.allclose(s.solve(b), lu.solve(b), atol=1e-9)


def test_save_load_matrix(tmp_path):
    A = random_sparse(50, 0.1, seed=5)
    p = str(tmp_path / "mat")
    save_matrix(p, A)
    B = load_matrix(p)
    assert np.allclose(A.to_dense(), B.to_dense())


def test_etbr_with_dd(tmp_path):
    from gmres_tpu.frontend.mna import stamp
    from gmres_tpu.frontend.spice import parse_netlist
    from gmres_tpu.models.etbr import etbr_reduce, reduced_transient
    from gmres_tpu.models.transient import transient_direct

    N = 7
    lines = ["V1 vdd 0 DC 1.8", "Rsrc vdd n0_0 0.1"]
    for i in range(N):
        for j in range(N):
            if i + 1 < N:
                lines.append(f"Rh{i}_{j} n{i}_{j} n{i+1}_{j} 2")
            if j + 1 < N:
                lines.append(f"Rv{i}_{j} n{i}_{j} n{i}_{j+1} 2")
            lines.append(f"Cd{i}_{j} n{i}_{j} 0 0.5p")
    lines.append("I1 n3_3 0 PWL(0 0 40n 50m 200n 50m)")
    lines.append(".tran 4n 200n")
    lines.append(".print v(n3_3)")
    p = tmp_path / "g.sp"
    p.write_text("\n".join(lines) + "\n")
    mna = stamp(parse_netlist(str(p)))
    m_dd = etbr_reduce(mna, q=10, nparts=3)
    m_lu = etbr_reduce(mna, q=10)
    r_dd = reduced_transient(m_dd, mna)
    r_lu = reduced_transient(m_lu, mna)
    scale = np.abs(r_lu.port_values).max()
    assert np.abs(r_dd.port_values - r_lu.port_values).max() / scale < 1e-8
