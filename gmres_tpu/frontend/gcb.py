"""Thermal GCB matrix-directory I/O.

File format produced by the reference's MATLAB exporter
(src_thermal/parserGCB.m:1-44) and consumed by src_thermal/main2.cu:127-147:

- ``A.mtx``/``B.mtx``/``C.mtx``: one header line ``numRows numCols nnz``
  followed by nnz lines ``i j val`` (1-based, ASCII floats; readSparseMatrix
  in SpMV_gen.cpp:93 parses indices as floats too).
- ``u_vec.mtx``: header ``numCols numRows`` then numCols column blocks of
  numRows values each (column i = input vector at time step i).
- ``t_step.mtx``: single scalar.

Note A is pre-combined: A = G + C/t_step, so the backward-Euler step solves
``A x_{k+1} = B u_k + (C/t_step) x_k``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from gmres_tpu.ops.formats import CSRMatrix

__all__ = ["GCBSystem", "read_gcb", "read_mtx", "write_mtx", "read_uvec",
           "write_uvec", "write_vector"]


def read_mtx(path: str) -> CSRMatrix:
    with open(path) as f:
        header = f.readline().split()
        while header and header[0].startswith("%"):
            header = f.readline().split()
        nrows, ncols, nnz = (int(float(t)) for t in header[:3])
        body = np.loadtxt(f, ndmin=2)
    if body.size == 0:
        body = np.zeros((0, 3))
    if body.shape[0] != nnz:
        raise ValueError(f"{path}: expected {nnz} triplets, got {body.shape[0]}")
    rows = body[:, 0].astype(np.int64) - 1
    cols = body[:, 1].astype(np.int64) - 1
    return CSRMatrix.from_triplets(rows, cols, body[:, 2], (nrows, ncols))


def write_mtx(path: str, A: CSRMatrix) -> None:
    s = A.to_scipy().tocoo()
    with open(path, "w") as f:
        f.write(f" {A.shape[0]:.7e} {A.shape[1]:.7e} {s.nnz:.7e}\n")
        for i, j, v in zip(s.row, s.col, s.data):
            f.write(f" {float(i + 1):.7e} {float(j + 1):.7e} {v:.7e}\n")


def read_uvec(path: str) -> np.ndarray:
    """Returns U with shape (num_inputs, num_steps)."""
    with open(path) as f:
        header = f.readline().split()
        ncols, nrows = int(float(header[0])), int(float(header[1]))
        body = np.ravel(np.loadtxt(f, ndmin=1))
    if body.size != ncols * nrows:
        raise ValueError(f"{path}: expected {ncols * nrows} values, got {body.size}")
    return body.reshape(ncols, nrows).T


def write_uvec(path: str, U: np.ndarray) -> None:
    nrows, ncols = U.shape
    with open(path, "w") as f:
        f.write(f" {float(ncols):.7e} {float(nrows):.7e}\n")
        for i in range(ncols):
            for v in U[:, i]:
                f.write(f" {v:.7e}\n")


def write_vector(path: str, x: np.ndarray) -> None:
    """xCPU.txt / xGPU.txt-style dump (one value per line,
    src_thermal/main.cu:486-519)."""
    np.savetxt(path, np.asarray(x).ravel())


@dataclasses.dataclass
class GCBSystem:
    """A thermal transient problem: A = G + C/h, inputs B, capacitance C,
    input waveforms U (inputs x steps), step h."""

    A: CSRMatrix
    B: CSRMatrix
    C: CSRMatrix
    U: np.ndarray
    t_step: float

    @property
    def n(self) -> int:
        return self.A.shape[0]

    @property
    def num_steps(self) -> int:
        return self.U.shape[1]

    def C_over_h(self) -> CSRMatrix:
        Ch = self.C.to_scipy() * (1.0 / self.t_step)
        return CSRMatrix.from_scipy(Ch)


def read_gcb(directory: str) -> GCBSystem:
    p = lambda name: os.path.join(directory, name)
    A = read_mtx(p("A.mtx"))
    B = read_mtx(p("B.mtx"))
    C = read_mtx(p("C.mtx"))
    U = read_uvec(p("u_vec.mtx"))
    t_step = float(np.loadtxt(p("t_step.mtx")))
    if B.shape[1] != U.shape[0]:
        raise ValueError(
            f"B has {B.shape[1]} inputs but u_vec has {U.shape[0]} rows"
        )
    return GCBSystem(A=A, B=B, C=C, U=U, t_step=t_step)
