"""gmres_tpu — TPU-native sparse linear-solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
sheldonucr/GPU-GMRES (GPU-accelerated power-grid & 3D-thermal analysis):

- sparse formats tuned for TPU (tiled-ELL, DIA, block-CSR) -- ``gmres_tpu.ops``
- one restarted-GMRES(m) implementation covering the reference's 14 CUDA/C++
  variants via parameters -- ``gmres_tpu.solvers``
- preconditioners (Jacobi, ILU(0), ILU(k), AINV, scaled/permuted split) --
  ``gmres_tpu.precond``
- simulation engines (DC, full-MNA transient, ETBR reduction, reduced/mixed
  transient, thermal backward-Euler, IR-drop) -- ``gmres_tpu.models``
- SPICE-subset front-end + MNA stamping -- ``gmres_tpu.frontend``
- multi-chip row-partitioned GMRES over a jax.sharding.Mesh --
  ``gmres_tpu.parallel``

The reference is CUDA/C++ (see /root/reference and SURVEY.md); nothing here is
a translation -- the compute path is jit-compiled XLA + Pallas kernels, host
factorization is NumPy/SciPy + a native C++ helper library.
"""

from gmres_tpu.config import SolverConfig, SolverStats
from gmres_tpu.ops.formats import (
    COOMatrix,
    CSRMatrix,
    DeviceCOO,
    DeviceCSR,
    DiaMatrix,
    EllMatrix,
)
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.solvers.gmres import gmres

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "SolverStats",
    "COOMatrix",
    "CSRMatrix",
    "DeviceCOO",
    "DeviceCSR",
    "DiaMatrix",
    "EllMatrix",
    "spmv",
    "gmres",
]
