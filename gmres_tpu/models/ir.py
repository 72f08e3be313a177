"""IR-drop analysis: rank nodes by voltage statistics over the transient.

Covers ir_analysis.cpp:30-116: per tracked node compute min/max/avg voltage
over the simulation, IR value = max - min, report the top-N (default 20,
etbr_cmd_short.cpp:182) and write the .ir file.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["IrReport", "ir_analysis", "write_ir_report"]


@dataclasses.dataclass
class IrReport:
    names: List[str]
    max_v: np.ndarray
    min_v: np.ndarray
    avg_v: np.ndarray
    ir: np.ndarray  # max - min per node

    def top(self, k: int, key: str = "ir"):
        vals = getattr(self, {"ir": "ir", "max": "max_v", "avg": "avg_v"}[key])
        order = np.argsort(vals)[::-1][:k]
        return [(self.names[i], float(vals[i])) for i in order]


def ir_analysis(
    port_values: np.ndarray,
    names: Sequence[str],
    display_num: int = 20,
    verbose: bool = True,
) -> IrReport:
    """port_values: (steps, nodes) waveform matrix."""
    pv = np.asarray(port_values)
    rep = IrReport(
        names=list(names),
        max_v=pv.max(axis=0),
        min_v=pv.min(axis=0),
        avg_v=pv.mean(axis=0),
        ir=pv.max(axis=0) - pv.min(axis=0),
    )
    if verbose:
        k = min(display_num, len(rep.names))
        print("****** Node Voltage Info ******")
        print(f"#Tracked nodes: {len(rep.names)}")
        print(f"Max {k} node voltage:")
        for name, v in rep.top(k, "max"):
            print(f"  {name} : {v:.6g}")
        print(f"Max {k} IR drop (max-min):")
        for name, v in rep.top(k, "ir"):
            print(f"  {name} : {v:.6g}")
    return rep


def write_ir_report(path: str, rep: IrReport, display_num: int = 20) -> None:
    k = min(display_num, len(rep.names))
    with open(path, "w") as f:
        f.write(f"#Tracked nodes: {len(rep.names)}\n")
        f.write(f"Max {k} Node Voltage:\n")
        for name, v in rep.top(k, "max"):
            f.write(f"{name} : {v:.6e}\n")
        f.write(f"Avg {k} Node Voltage:\n")
        for name, v in rep.top(k, "avg"):
            f.write(f"{name} : {v:.6e}\n")
        f.write(f"Max {k} IR (max-min):\n")
        for name, v in rep.top(k, "ir"):
            f.write(f"{name} : {v:.6e}\n")
