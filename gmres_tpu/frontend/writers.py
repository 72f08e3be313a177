"""Simulation output writers.

Covers writer_wrapper (etbr_wrapper.cpp:298-389): the ``.output`` port
waveform file ("Node: NAME" blocks with time/value lines, "END: NAME"; DC
runs emit "name value" lines) plus both precision styles (default and the
UCR_EXTERNAL 4-digit scientific), and write_xgraph (xgraph.cpp:29).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["write_output", "write_dc_output", "write_xgraph"]


def write_output(
    path: str,
    times: np.ndarray,
    port_values: np.ndarray,  # (steps, nports)
    port_names: Sequence[str],
    external: bool = False,
) -> None:
    pv = np.asarray(port_values)
    with open(path, "w") as f:
        for j, name in enumerate(port_names):
            if external:
                f.write(f"NODE: {name}\n")
                for t, v in zip(times, pv[:, j]):
                    f.write(f"{t:.4e} {v:.4e}\n")
            else:
                f.write(f"\nNode: {name}\t\n\n")
                for t, v in zip(times, pv[:, j]):
                    f.write(f" {t:.3e} {v:.6e}\n")
            f.write(f"END: {name}\n")
        f.write("\n")


def write_dc_output(path: str, values: np.ndarray,
                    port_names: Sequence[str]) -> None:
    with open(path, "w") as f:
        for name, v in zip(port_names, np.asarray(values)):
            f.write(f"{name}  {v}\n")
        f.write("\n")


def write_xgraph(
    path: str,
    times: np.ndarray,
    port_values: np.ndarray,
    port_names: Sequence[str],
) -> None:
    """xgraph plot file: one titled curve per port."""
    pv = np.asarray(port_values)
    with open(path, "w") as f:
        f.write("TitleText: port waveforms\n")
        for j, name in enumerate(port_names):
            f.write(f'\n"{name}\n')
            for t, v in zip(times, pv[:, j]):
                f.write(f"{t:.6e} {v:.6e}\n")
