"""SPICE-subset netlist parser for power-grid analysis.

Grammar coverage mirrors the reference parser (src/parser.cpp):
- elements R/C/L/V/I (parser.cpp pass-2 stamping entry points stampG/stampC/
  stampB at :1904/:2100/:2269), with DC, ``PWL(t v t v ...)``
  (parser.cpp:877-1035) and ``PULSE(v1 v2 td tr tf pw per)`` sources;
- directives ``.tran`` (:515), ``.print`` ports (:521), ``.include`` (:542),
  ``.SUBCKT``/``.ends`` + ``X`` instances (:569-602), ``.end``, ``.op``;
- engineering suffixes per StrToNum (parser.cpp:30-66): T G K M(milli!)
  MEG(mega) U N P F, case-insensitive;
- ``*`` comments, ``+`` continuation lines; node ``0``/``gnd`` is ground.

Output is a flat :class:`Netlist` (subcircuits expanded, internal nodes
prefixed ``Xinst.``), ready for MNA stamping (frontend/mna.py).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from gmres_tpu.frontend.sources import Source

__all__ = ["Netlist", "Element", "parse_netlist", "parse_value"]

_SUFFIX = {
    "t": 1e12, "g": 1e9, "meg": 1e6, "k": 1e3, "m": 1e-3,
    "u": 1e-6, "n": 1e-9, "p": 1e-12, "f": 1e-15,
}

_NUM_RE = re.compile(
    r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)\s*([a-zA-Z]*)\s*$"
)


def parse_value(tok: str) -> float:
    """Engineering-notation number: 1k, 2.5m, 3MEG, 1e-9, 10p, 4.7uF."""
    m = _NUM_RE.match(tok)
    if not m:
        raise ValueError(f"bad numeric token {tok!r}")
    val = float(m.group(1))
    suf = m.group(2).lower()
    if not suf:
        return val
    if suf.startswith("meg"):
        return val * 1e6
    key = suf[0]
    if key in _SUFFIX:
        return val * _SUFFIX[key]
    return val  # trailing units like 'V', 'A', 'Ohm'


@dataclasses.dataclass
class Element:
    kind: str          # 'R' | 'C' | 'L' | 'V' | 'I'
    name: str
    n1: str
    n2: str
    value: float = 0.0           # R/C/L value
    source: Optional[Source] = None  # V/I waveform


@dataclasses.dataclass
class Netlist:
    elements: List[Element]
    tstep: float = 0.0
    tstop: float = 0.0
    ports: List[str] = dataclasses.field(default_factory=list)
    title: str = ""

    def counts(self) -> Dict[str, int]:
        c: Dict[str, int] = {}
        for e in self.elements:
            c[e.kind] = c.get(e.kind, 0) + 1
        return c


_GROUND = {"0", "gnd", "gnd!", "vss!"}


def _is_ground(node: str) -> bool:
    return node.lower() in _GROUND


@dataclasses.dataclass
class _Subckt:
    name: str
    ports: List[str]
    lines: List[str]


def _read_logical_lines(path: str) -> List[str]:
    """Read with comment stripping, '+' continuation joining and .include
    expansion (recursive, relative to the including file)."""
    out: List[str] = []
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        raw = f.readlines()
    for line in raw:
        line = line.rstrip("\n")
        if not line.strip():
            continue
        s = line.strip()
        if s.startswith("*") or s.startswith("$"):
            continue
        if s.startswith("+"):
            if not out:
                raise ValueError(f"{path}: continuation with no prior line")
            out[-1] = out[-1] + " " + s[1:]
            continue
        low = s.lower()
        if low.startswith(".include") or low.startswith(".inc "):
            inc = s.split(None, 1)[1].strip().strip("'\"")
            if not os.path.isabs(inc):
                inc = os.path.join(base, inc)
            out.extend(_read_logical_lines(inc))
            continue
        out.append(s)
    return out


def _parse_source_tail(tokens: List[str], line: str) -> Source:
    """Parse the waveform part of a V/I card: DC value, PWL(...), PULSE(...)."""
    joined = " ".join(tokens)
    up = joined.upper()
    if "PWL" in up:
        nums = [parse_value(t) for t in
                re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?[a-zA-Z]*",
                           joined[up.index("PWL") + 3:].replace("(", " ").replace(")", " "))]
        if len(nums) % 2 != 0:
            raise ValueError(f"odd PWL pair count in {line!r}")
        t = np.array(nums[0::2])
        v = np.array(nums[1::2])
        order = np.argsort(t, kind="stable")
        return Source(kind="pwl", times=t[order], values=v[order],
                      dc=float(v[order][0]) if len(v) else 0.0)
    if "PULSE" in up:
        nums = [parse_value(t) for t in
                re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?[a-zA-Z]*",
                           joined[up.index("PULSE") + 5:].replace("(", " ").replace(")", " "))]
        nums = (nums + [0.0] * 7)[:7]
        return Source(kind="pulse", v1=nums[0], v2=nums[1], td=nums[2],
                      tr=nums[3], tf=nums[4], pw=nums[5], period=nums[6])
    # DC [value] or bare value
    vals = [t for t in tokens if t.upper() != "DC"]
    dc = parse_value(vals[0]) if vals else 0.0
    return Source(kind="dc", dc=dc)


def _parse_element(line: str) -> Optional[Element]:
    tokens = line.split()
    name = tokens[0]
    kind = name[0].upper()
    if kind in ("R", "C", "L"):
        if len(tokens) < 4:
            raise ValueError(f"short element card: {line!r}")
        return Element(kind=kind, name=name, n1=tokens[1], n2=tokens[2],
                       value=parse_value(tokens[3]))
    if kind in ("V", "I"):
        if len(tokens) < 3:
            raise ValueError(f"short source card: {line!r}")
        src = _parse_source_tail(tokens[3:], line)
        return Element(kind=kind, name=name, n1=tokens[1], n2=tokens[2],
                       source=src)
    return None


_PRINT_NODE_RE = re.compile(r"[vV]\(\s*([^)\s]+)\s*\)")


def parse_netlist(path: str) -> Netlist:
    """Two phases like the reference (pass 1 collects .SUBCKT defs and
    directives, pass 2 instantiates + stamps); here pass 2 produces the flat
    element list instead of matrix entries."""
    lines = _read_logical_lines(path)
    nl = Netlist(elements=[])
    subckts: Dict[str, _Subckt] = {}

    # phase 1: split subckt definitions from top-level cards
    top: List[str] = []
    cur: Optional[_Subckt] = None
    for s in lines:
        low = s.lower()
        if low.startswith(".subckt"):
            toks = s.split()
            cur = _Subckt(name=toks[1].lower(), ports=toks[2:], lines=[])
            continue
        if low.startswith(".ends"):
            if cur is None:
                raise ValueError(".ends without .subckt")
            subckts[cur.name] = cur
            cur = None
            continue
        (cur.lines if cur is not None else top).append(s)

    def handle_card(s: str, prefix: str, portmap: Dict[str, str]):
        low = s.lower()
        c0 = s[0].upper()

        def mapnode(node: str) -> str:
            """Resolve a node name in this scope to a global flat name."""
            if _is_ground(node):
                return "0"
            if node in portmap:
                return portmap[node]  # already resolved to a global name
            return prefix + node if prefix else node

        if c0 == ".":
            if low.startswith(".tran"):
                toks = s.split()
                nl.tstep = parse_value(toks[1])
                nl.tstop = parse_value(toks[2])
            elif low.startswith(".print"):
                nodes = _PRINT_NODE_RE.findall(s)
                if not nodes:
                    nodes = [t for t in s.split()[1:]
                             if t.lower() not in ("tran", "dc", "ac")]
                nl.ports.extend(nodes)
            elif low.startswith(".end"):
                pass
            elif low.startswith(".op"):
                pass
            # unknown dot-cards ignored (reference skips them too)
            return
        if c0 == "X":
            toks = s.split()
            subname = toks[-1].lower()
            if subname not in subckts:
                raise ValueError(f"unknown subckt {toks[-1]!r} in {s!r}")
            sub = subckts[subname]
            conns = toks[1:-1]
            if len(conns) != len(sub.ports):
                raise ValueError(
                    f"{toks[0]}: {len(conns)} connections for "
                    f"{len(sub.ports)}-port subckt {sub.name}"
                )
            inner_map = dict(zip(sub.ports, [mapnode(c) for c in conns]))
            inst_prefix = prefix + toks[0] + "."
            for inner in sub.lines:
                handle_card(inner, inst_prefix, inner_map)
            return
        e = _parse_element(s)
        if e is None:
            return
        e = dataclasses.replace(
            e, name=prefix + e.name, n1=mapnode(e.n1), n2=mapnode(e.n2)
        )
        nl.elements.append(e)

    for s in top:
        handle_card(s, "", {})
    return nl
