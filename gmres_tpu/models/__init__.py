"""Simulation engines (L5): DC, transient, ETBR reduction, thermal,
IR-drop analysis."""

from gmres_tpu.models.thermal import thermal_transient, TransientResult
from gmres_tpu.models.dc import dc_solve
from gmres_tpu.models.transient import (
    PgTransientResult, transient_direct, transient_gmres,
)
from gmres_tpu.models.etbr import (
    EtbrModel, etbr_reduce, mixed_transient, reduced_transient,
)
from gmres_tpu.models.ir import IrReport, ir_analysis, write_ir_report

__all__ = [
    "thermal_transient", "TransientResult",
    "dc_solve",
    "PgTransientResult", "transient_direct", "transient_gmres",
    "EtbrModel", "etbr_reduce", "mixed_transient", "reduced_transient",
    "IrReport", "ir_analysis", "write_ir_report",
]
