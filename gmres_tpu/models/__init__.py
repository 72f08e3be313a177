"""Simulation engines (L5): DC, transient, ETBR reduction, thermal,
IR-drop analysis."""

from gmres_tpu.models.thermal import thermal_transient, TransientResult

__all__ = ["thermal_transient", "TransientResult"]
