"""Utilities: phase timers, convergence telemetry, profiling hooks."""

from gmres_tpu.utils.timing import PhaseTimers, Timer

__all__ = ["PhaseTimers", "Timer"]
