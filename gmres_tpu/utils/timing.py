"""Wall-clock phase timers with an end-of-run summary.

The reference instruments every phase with IT++ Real_Timer + a printout
block (etbr_cmd_short.cpp:70-73,422-436; TIME macro defs.h:39-43; GMRES
op-class breakdown gmres.h:64-80). One context-manager registry replaces
all of it; ``jax.profiler`` traces hook in via ``trace``.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Iterator, Optional

__all__ = ["Timer", "PhaseTimers"]


class Timer:
    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        self._t0 = None
        return dt


class PhaseTimers:
    def __init__(self) -> None:
        self._timers: "OrderedDict[str, Timer]" = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t = self._timers.setdefault(name, Timer())
        t.start()
        try:
            yield
        finally:
            t.stop()

    def __getitem__(self, name: str) -> Timer:
        return self._timers[name]

    def report(self, out=print) -> None:
        if not self._timers:
            return
        out("****** runtime summary ******")
        total = sum(t.total for t in self._timers.values())
        for name, t in self._timers.items():
            out(f"  {name:<20s} {t.total:9.3f} s"
                + (f"  ({t.count}x)" if t.count > 1 else ""))
        out(f"  {'total':<20s} {total:9.3f} s")


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None):
    """jax.profiler trace wrapper (TPU equivalent of SUB_TIMER breakdowns):
    with trace('gmres', '/tmp/trace'): ... — view in TensorBoard/XProf."""
    import jax

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield
