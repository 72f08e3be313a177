"""Sparse formats and SpMV kernels (TPU-native replacement of the reference's
L2 layer: SpMV_kernel.cu, SpMV_gen.cpp, formatConvert.cpp, kernels.cu)."""

from gmres_tpu.ops.formats import (
    COOMatrix,
    CSRMatrix,
    DeviceCOO,
    DeviceCSR,
    DiaMatrix,
    EllMatrix,
)
from gmres_tpu.ops.spmv import spmv

__all__ = [
    "COOMatrix",
    "CSRMatrix",
    "DeviceCOO",
    "DeviceCSR",
    "DiaMatrix",
    "EllMatrix",
    "spmv",
]
