"""ctypes bindings for the native host library (native/gmres_host.cpp).

Builds the shared library on first use (make -C native) and exposes
``*_native`` variants of the host factorizations. Every entry returns None
when the library is unavailable so the NumPy fallbacks in gmres_tpu.precond
take over transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "load_library",
    "ilu0_factor_native",
    "iluk_factor_native",
    "ainv_factor_native",
    "rcm_native",
    "levels_native",
    "parse_netlist_native",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgmres_host.so")

_lock = threading.Lock()
_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.gt_ilu0.argtypes = [ctypes.c_int64, _i64p, _i32p, _f64p]
        lib.gt_ilu0.restype = ctypes.c_int
        lib.gt_iluk.argtypes = [ctypes.c_int64, _i64p, _i32p, _f64p,
                                ctypes.c_int]
        lib.gt_iluk.restype = ctypes.c_void_p
        lib.gt_iluk_nnz.argtypes = [ctypes.c_void_p]
        lib.gt_iluk_nnz.restype = ctypes.c_int64
        lib.gt_iluk_fetch.argtypes = [ctypes.c_void_p, _i64p, _i32p, _f64p]
        lib.gt_iluk_free.argtypes = [ctypes.c_void_p]
        lib.gt_ainv.argtypes = [ctypes.c_int64, _i64p, _i32p, _f64p,
                                _i64p, _i32p, _f64p, ctypes.c_double,
                                ctypes.c_int64]
        lib.gt_ainv.restype = ctypes.c_void_p
        lib.gt_ainv_znnz.argtypes = [ctypes.c_void_p]
        lib.gt_ainv_znnz.restype = ctypes.c_int64
        lib.gt_ainv_wnnz.argtypes = [ctypes.c_void_p]
        lib.gt_ainv_wnnz.restype = ctypes.c_int64
        lib.gt_ainv_fetch.argtypes = [ctypes.c_void_p, _i64p, _i64p, _f64p,
                                      _i64p, _i64p, _f64p, _f64p]
        lib.gt_ainv_free.argtypes = [ctypes.c_void_p]
        lib.gt_rcm.argtypes = [ctypes.c_int64, _i64p, _i32p, _i64p]
        lib.gt_rcm.restype = ctypes.c_int
        lib.gt_levels.argtypes = [ctypes.c_int64, _i64p, _i32p,
                                  ctypes.c_int, _i32p]
        lib.gt_levels.restype = ctypes.c_int
        lib.gt_parse_netlist.argtypes = [ctypes.c_char_p]
        lib.gt_parse_netlist.restype = ctypes.c_void_p
        lib.gt_parse_last_error.argtypes = []
        lib.gt_parse_last_error.restype = ctypes.c_char_p
        lib.gt_parse_dim.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.gt_parse_dim.restype = ctypes.c_int64
        lib.gt_parse_time.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.gt_parse_time.restype = ctypes.c_double
        lib.gt_parse_fetch_csr.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, _i64p, _i32p, _f64p]
        lib.gt_parse_fetch_ports.argtypes = [ctypes.c_void_p, _i64p,
                                             ctypes.c_char_p]
        lib.gt_parse_fetch_node_names.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_char_p]
        lib.gt_parse_fetch_sources.argtypes = [ctypes.c_void_p, _f64p,
                                               _f64p, _f64p]
        lib.gt_parse_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _csr_args(A):
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    return indptr, indices, data


def ilu0_factor_native(A) -> Optional[Tuple]:
    """In-place-pattern ILU(0); returns (L, U) CSRMatrix pair or None."""
    lib = load_library()
    if lib is None:
        return None
    from gmres_tpu.precond.ilu import _split_lu

    indptr, indices, data = _csr_args(A)
    data = data.copy()
    if lib.gt_ilu0(A.shape[0], indptr, indices, data) != 0:
        return None
    return _split_lu(A.shape[0], indptr, indices, data)


def iluk_factor_native(A, fill_level: int) -> Optional[Tuple]:
    lib = load_library()
    if lib is None:
        return None
    from gmres_tpu.precond.ilu import _split_lu

    n = A.shape[0]
    indptr, indices, data = _csr_args(A)
    h = lib.gt_iluk(n, indptr, indices, data, int(fill_level))
    if not h:
        return None
    try:
        nnz = lib.gt_iluk_nnz(h)
        op = np.empty(n + 1, np.int64)
        oi = np.empty(nnz, np.int32)
        od = np.empty(nnz, np.float64)
        lib.gt_iluk_fetch(h, op, oi, od)
    finally:
        lib.gt_iluk_free(h)
    return _split_lu(n, op, oi, od)


def ainv_factor_native(A, drop_tol: float,
                       max_col_nnz: int = 0) -> Optional[Tuple]:
    lib = load_library()
    if lib is None:
        return None
    from gmres_tpu.ops.formats import CSRMatrix

    n = A.shape[0]
    indptr, indices, data = _csr_args(A)
    At = A.transpose()
    tptr, tidx, tdat = _csr_args(At)  # CSR of A^T == CSC of A
    h = lib.gt_ainv(n, indptr, indices, data, tptr, tidx, tdat,
                    float(drop_tol), int(max_col_nnz))
    if not h:
        return None
    try:
        znnz = lib.gt_ainv_znnz(h)
        wnnz = lib.gt_ainv_wnnz(h)
        zr = np.empty(znnz, np.int64)
        zc = np.empty(znnz, np.int64)
        zv = np.empty(znnz, np.float64)
        wr = np.empty(wnnz, np.int64)
        wc = np.empty(wnnz, np.int64)
        wv = np.empty(wnnz, np.float64)
        invd = np.empty(n, np.float64)
        lib.gt_ainv_fetch(h, zr, zc, zv, wr, wc, wv, invd)
    finally:
        lib.gt_ainv_free(h)
    Z = CSRMatrix.from_triplets(zr, zc, zv, (n, n))
    Wt = CSRMatrix.from_triplets(wr, wc, wv, (n, n))
    return Z, Wt, invd


def parse_netlist_native(path: str):
    """Parse + stamp a flat netlist natively. Returns an MnaSystem, or None
    when the library is unavailable or the netlist is hierarchical
    (.SUBCKT/X — the Python parser handles those). Raises ValueError on a
    hard parse error (mirroring the Python parser)."""
    lib = load_library()
    if lib is None:
        return None
    from gmres_tpu.frontend.mna import MnaSystem
    from gmres_tpu.frontend.sources import Source
    from gmres_tpu.ops.formats import CSRMatrix

    h = lib.gt_parse_netlist(path.encode())
    if not h:
        err = lib.gt_parse_last_error().decode()
        if err:
            raise ValueError(err)
        return None  # hierarchical: fall back to the Python parser
    try:
        nn = lib.gt_parse_dim(h, 0)
        nv = lib.gt_parse_dim(h, 1)
        nl = lib.gt_parse_dim(h, 2)
        nsrc = lib.gt_parse_dim(h, 3)
        size = nn + nv + nl
        mats = []
        for which, ncols in ((0, size), (1, size), (2, nsrc)):
            nnz = lib.gt_parse_dim(h, 4 + which)
            indptr = np.empty(size + 1, np.int64)
            indices = np.empty(nnz, np.int32)
            data = np.empty(nnz, np.float64)
            lib.gt_parse_fetch_csr(h, which, indptr, indices, data)
            mats.append(CSRMatrix(indptr, indices, data, (size, ncols)))
        G, C, B = mats

        nports = lib.gt_parse_dim(h, 7)
        pn_len = lib.gt_parse_dim(h, 8)
        ports = np.zeros(nports, np.int64)
        port_names: list = []
        if nports:
            buf = ctypes.create_string_buffer(int(pn_len))
            lib.gt_parse_fetch_ports(h, ports, buf)
            port_names = buf.raw[:pn_len].decode().split("\n")
        names_len = lib.gt_parse_dim(h, 9)
        node_index = {}
        if names_len:
            buf = ctypes.create_string_buffer(int(names_len))
            lib.gt_parse_fetch_node_names(h, buf)
            names = buf.raw[:names_len].decode().split("\n")
            node_index = dict(zip(names, range(len(names))))

        meta = np.empty(nsrc * 10, np.float64)
        total_pwl = lib.gt_parse_dim(h, 11)
        t_all = np.empty(max(total_pwl, 1), np.float64)
        v_all = np.empty(max(total_pwl, 1), np.float64)
        if nsrc:
            lib.gt_parse_fetch_sources(h, meta, t_all, v_all)
        sources = []
        off = 0
        for k in range(nsrc):
            m = meta[k * 10:(k + 1) * 10]
            kind = int(m[0])
            if kind == 1:
                npwl = int(m[9])
                sources.append(Source(kind="pwl",
                                      times=t_all[off:off + npwl].copy(),
                                      values=v_all[off:off + npwl].copy(),
                                      dc=float(m[1])))
                off += npwl
            elif kind == 2:
                p = m[2:9]
                sources.append(Source(kind="pulse", v1=p[0], v2=p[1],
                                      td=p[2], tr=p[3], tf=p[4], pw=p[5],
                                      period=p[6]))
            else:
                sources.append(Source(kind="dc", dc=float(m[1])))

        return MnaSystem(
            G=G, C=C, B=B,
            sources=sources,
            node_index=node_index,
            num_nodes=int(nn),
            num_vsrc=int(nv),
            num_ind=int(nl),
            ports=ports,
            port_names=port_names,
            tstep=lib.gt_parse_time(h, 0),
            tstop=lib.gt_parse_time(h, 1),
        )
    finally:
        lib.gt_parse_free(h)


def rcm_native(A) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    indptr, indices, _ = _csr_args(A)
    perm = np.empty(A.shape[0], np.int64)
    if lib.gt_rcm(A.shape[0], indptr, indices, perm) != 0:
        return None
    return perm


def levels_native(T, lower: bool) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    indptr, indices, _ = _csr_args(T)
    level = np.empty(T.shape[0], np.int32)
    if lib.gt_levels(T.shape[0], indptr, indices, 1 if lower else 0,
                     level) != 0:
        return None
    return level
