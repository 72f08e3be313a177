"""MNA stamping: netlist -> G x + C dx/dt = B u(t).

The TPU-framework equivalent of the reference's stamp pass (parser.cpp
stampG/stampC/stampB :1904/:2100/:2269 and the OO variant MNA::stamp,
mna.cpp:81-302): vectorized triplet accumulation into COO, converted once to
host CSR. State vector x = [node voltages | V-source currents | inductor
currents]; u = [I-source values | V-source values] (the reference likewise
appends branch currents for V/L and splits B by source kind).

Sign conventions:
- R between a,b: G[aa]+=g, G[bb]+=g, G[ab]-=g, G[ba]-=g.
- C between a,b: same pattern into C.
- V source k (value e(t), n1=+): rows n+k couple: G[a,iv]=+1, G[iv,a]=+1,
  G[b,iv]=-1, G[iv,b]=-1, B[iv, nI+k]=1.
- L between a,b, branch current il: G[a,il]=+1, G[il,a]=+1, G[b,il]=-1,
  G[il,b]=-1, C[il,il]=-L.
- I source (current flows n1 -> n2 inside the source, i.e. injects into n2):
  B[n1,k]=-1, B[n2,k]=+1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from gmres_tpu.frontend.sources import Source
from gmres_tpu.frontend.spice import Element, Netlist
from gmres_tpu.ops.formats import CSRMatrix, TripletBuilder

__all__ = ["MnaSystem", "stamp", "load_netlist"]


def load_netlist(path: str) -> "MnaSystem":
    """Parse + stamp in one step. Flat netlists go through the native C++
    fast path (native/spice_parse.cpp — ~20x the Python parser on
    multi-million-line grids); hierarchical ones (.SUBCKT/X) and missing-
    library environments fall back to the Python parser. Both paths produce
    identical systems (tests/test_frontend.py)."""
    try:
        from gmres_tpu.native import parse_netlist_native

        mna = parse_netlist_native(path)
        if mna is not None:
            return mna
    except ImportError:
        pass
    from gmres_tpu.frontend.spice import parse_netlist

    return stamp(parse_netlist(path))


@dataclasses.dataclass
class MnaSystem:
    G: CSRMatrix
    C: CSRMatrix
    B: CSRMatrix
    sources: List[Source]        # column order of B: I sources then V sources
    node_index: Dict[str, int]   # node name -> row (ground excluded)
    num_nodes: int
    num_vsrc: int
    num_ind: int
    ports: np.ndarray            # indices into x for .print nodes
    port_names: List[str]
    tstep: float
    tstop: float

    @property
    def size(self) -> int:
        return self.num_nodes + self.num_vsrc + self.num_ind

    def source_table(self, tstep: Optional[float] = None,
                     tstop: Optional[float] = None) -> np.ndarray:
        from gmres_tpu.frontend.sources import source_table

        return source_table(
            self.sources, tstep or self.tstep, tstop or self.tstop
        )

    def dc_rhs(self) -> np.ndarray:
        from gmres_tpu.frontend.sources import dc_values

        return self.B.to_scipy() @ dc_values(self.sources)


def stamp(nl: Netlist) -> MnaSystem:
    node_index: Dict[str, int] = {}

    def node(name: str) -> int:
        if name == "0":
            return -1
        idx = node_index.get(name)
        if idx is None:
            idx = len(node_index)
            node_index[name] = idx
        return idx

    # First walk assigns node numbers + counts branch unknowns.
    vsrcs = [e for e in nl.elements if e.kind == "V"]
    isrcs = [e for e in nl.elements if e.kind == "I"]
    inds = [e for e in nl.elements if e.kind == "L"]
    for e in nl.elements:
        node(e.n1)
        node(e.n2)
    nn = len(node_index)
    nv = len(vsrcs)
    nldim = len(inds)
    size = nn + nv + nldim
    nsrc = len(isrcs) + len(vsrcs)

    g = TripletBuilder((size, size))
    c = TripletBuilder((size, size))
    b = TripletBuilder((size, nsrc))

    def stamp_pair(tb: TripletBuilder, a: int, bb: int, val: float):
        if a >= 0:
            tb.push(a, a, val)
        if bb >= 0:
            tb.push(bb, bb, val)
        if a >= 0 and bb >= 0:
            tb.push(a, bb, -val)
            tb.push(bb, a, -val)

    icol = {id(e): k for k, e in enumerate(isrcs)}
    iv = 0
    il = 0
    for e in nl.elements:
        a, bb = node(e.n1), node(e.n2)
        if e.kind == "R":
            if e.value == 0:
                raise ValueError(f"{e.name}: zero resistance")
            stamp_pair(g, a, bb, 1.0 / e.value)
        elif e.kind == "C":
            stamp_pair(c, a, bb, e.value)
        elif e.kind == "L":
            k = nn + nv + il
            il += 1
            if a >= 0:
                g.push(a, k, 1.0)
                g.push(k, a, 1.0)
            if bb >= 0:
                g.push(bb, k, -1.0)
                g.push(k, bb, -1.0)
            c.push(k, k, -e.value)
        elif e.kind == "V":
            k = nn + iv
            col = len(isrcs) + iv
            iv += 1
            if a >= 0:
                g.push(a, k, 1.0)
                g.push(k, a, 1.0)
            if bb >= 0:
                g.push(bb, k, -1.0)
                g.push(k, bb, -1.0)
            b.push(k, col, 1.0)
        elif e.kind == "I":
            col = icol[id(e)]
            if a >= 0:
                b.push(a, col, -1.0)
            if bb >= 0:
                b.push(bb, col, 1.0)

    sources = [e.source for e in isrcs] + [e.source for e in vsrcs]

    ports = []
    port_names = []
    for p in nl.ports:
        if p in node_index:
            ports.append(node_index[p])
            port_names.append(p)
    return MnaSystem(
        G=g.build().to_csr(),
        C=c.build().to_csr(),
        B=b.build().to_csr(),
        sources=sources,
        node_index=node_index,
        num_nodes=nn,
        num_vsrc=nv,
        num_ind=nldim,
        ports=np.asarray(ports, dtype=np.int64),
        port_names=port_names,
        tstep=nl.tstep,
        tstop=nl.tstop,
    )
