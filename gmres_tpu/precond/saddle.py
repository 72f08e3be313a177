"""Constraint-Schur preconditioner for MNA saddle-point systems.

The MNA matrix with V-source/inductor branch rows is a bordered block
system (parser stamping, reference parser.cpp:1904-2269):

    A = [[Agg, Agj],      J = the branch rows (structurally zero or tiny
         [Ajg, Ajj]]          diagonal; |J| = #V-sources, typically <<n)

Unpivoted incomplete factorizations and AINV choke on the zero diagonals
(measured r1-r2: AINV stalls, ILU(k) needs thousands of iterations), and
the pivoting class (ILUTP) costs a level-scheduled device trisolve per
apply — sequential poison on TPU (measured 341 ms/apply at 100K) — and its
SuperLU factorization goes exactly singular at 2.1M. This preconditioner
eliminates the J rows EXACTLY instead:

    u1 = Mg b1                 Mg ~ Agg^-1: AINV on the grounded block —
    z2 = S^-1 (Ajg u1 - b2)    the well-conditioned conductance system
    z1 = Mg (b1 - Agj z2)      AINV was designed for (two SpMVs, no
                               trisolves; TVLSI SSV robustness pick)
    S  = Ajg Mg Agj - Ajj      dense (|J|, |J|), built once on host with
                               sparse algebra, applied as one small matmul

With Mg = Agg^-1 this is exact block elimination (one GMRES iteration);
with AINV it clusters the spectrum like AINV does on grounded systems.
Every apply is two AINV applies + two thin SpMVs + one (|J|,|J|) matmul —
MXU/VPU work only, no sequential dependency chains. No reordering is
needed (no factorization locality to engineer), so the operator keeps its
natural stencil layout outright.
"""

from __future__ import annotations

import dataclasses
from typing import Optional
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix, to_device

__all__ = ["SaddlePrecond", "saddle", "branch_rows"]


def branch_rows(A: CSRMatrix) -> np.ndarray:
    """Indices of structurally-zero-diagonal rows (V-source branch rows)."""
    return np.nonzero(np.asarray(A.diagonal()) == 0.0)[0]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Mg", "Agj", "Ajg", "MgAgj", "S_inv", "g_gather",
                 "j_gather", "g_scatter"],
    meta_fields=["n", "ng"],
)
@dataclasses.dataclass(frozen=True)
class SaddlePrecond:
    """Apply the block-elimination preconditioner (see module docstring).

    Two block-split layouts:
    - **contiguous** (``g_gather is None``): the grounded rows are
      ``[0, ng)`` and the branch rows the tail ``[ng, n)`` — the layout the
      MNA stamper produces (frontend/mna.py stamp: V/L branch rows appended
      after the node block) and the geometric load-time ordering preserves.
      The split/merge is pure static slicing + one concatenate.
      This matters enormously: XLA lowers an explicit 2.1M-element gather
      to ~12 ms on v5e even when the index vector is an iota, so the
      gather-based apply spent ~25 of its 33 ms moving data that never
      needed to move (measured, benchmarks/probe_saddle_parts.py r4).
    - **general** (``g_gather``/``j_gather``/``g_scatter`` index arrays):
      any row split, three gathers per apply.
    """

    Mg: object           # AinvPrecond (or any pytree op) on Agg
    Agj: object          # (ng, nj) coupling operator
    Ajg: object          # (nj, ng) coupling operator
    MgAgj: object        # optional precomputed (Mg o Agj) thin operator
    S_inv: jax.Array     # (nj, nj) dense inverse Schur complement
    g_gather: Optional[jax.Array]  # (ng,) int32, or None when contiguous
    j_gather: Optional[jax.Array]  # (nj,) int32, or None when contiguous
    g_scatter: Optional[jax.Array] # (n,) int32: position of row i in [z1;z2]
    n: int
    ng: int

    def __call__(self, v: jax.Array) -> jax.Array:
        if self.g_gather is None:
            b1 = v[: self.ng]
            b2 = v[self.ng:]
        else:
            b1 = v[self.g_gather]
            b2 = v[self.j_gather]
        u1 = self.Mg(b1)
        z2 = self.S_inv @ (self.Ajg(u1) - b2)
        if self.MgAgj is not None:
            # single-Mg form: z1 = Mg(b1 - Agj z2) = u1 - (Mg o Agj) z2
            # with (Mg o Agj) precomputed on the host as a thin sparse
            # operator (it already exists there for the Schur build) —
            # identical linear map, one Mg apply saved (~half the apply
            # cost at 2.1M, probe_saddle_parts r4)
            z1 = u1 - self.MgAgj(z2)
        else:
            z1 = self.Mg(b1 - self.Agj(z2))
        z = jnp.concatenate([z1, z2])
        return z if self.g_scatter is None else z[self.g_scatter]


def _diag_banded(S, Gi, min_density: float = 0.25,
                 min_coverage: float = 0.5) -> bool:
    """True when the grounded block S[Gi][:,Gi] already concentrates >=
    ``min_coverage`` of its nnz on >=``min_density``-dense diagonals (the
    to_hybrid viability criterion): its AINV factors then inherit the
    stencil layout and ride DIA — no RCM needed or wanted."""
    B = S[Gi][:, Gi].tocsr()
    ng = B.shape[0]
    if B.nnz == 0:
        return False
    rows = np.repeat(np.arange(ng), np.diff(B.indptr))
    off = B.indices.astype(np.int64) - rows
    _, counts = np.unique(off, return_counts=True)
    return counts[counts >= min_density * ng].sum() >= min_coverage * B.nnz


def saddle(A: CSRMatrix, drop_tol: float = 0.1, dtype=jnp.float32,
           block_size=None, reorder: bool = True, mg_min_n: int = 32768,
           **ainv_kw) -> object:
    """Build a :class:`SaddlePrecond` for an MNA saddle-point matrix.

    Falls back to plain AINV when the matrix has no zero-diagonal rows
    (grounded systems need no elimination). Extra kwargs go to
    :func:`gmres_tpu.precond.ainv.ainv`.

    ``reorder``: build Mg in RCM-banded space. This does NOT touch the
    GMRES operator (A stays in its natural stencil layout) and costs
    nothing per apply — the permutation composes into the gather/scatter
    index arrays the block split needs anyway. What it buys: the AINV
    factors of a banded matrix are banded, so Z/W^T ride the slab/hybrid
    device formats. Unpermuted multi-layer netlists carry an interlayer
    offset ~n/2 that blows every windowed format's footprint (measured at
    2.1M: Z spans 529 offsets incl. +-1M; the v1 WELL fallback needs more
    SMEM than the chip has), and block-Jacobi AINV blocks get coupling-
    local, preserving quality."""
    import os
    import time as _time

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from gmres_tpu.ops.reorder import rcm_ordering
    from gmres_tpu.precond.ainv import ainv, ainv_factor

    _dbg = os.environ.get("GMRES_TPU_DEBUG_SETUP", "0") == "1"
    _t0 = _time.perf_counter()

    def _mark(label):
        nonlocal _t0
        if _dbg:
            t = _time.perf_counter()
            print(f"[saddle] {label}: {t - _t0:.1f} s", flush=True)
            _t0 = t

    J = branch_rows(A)
    if J.size == 0:
        return ainv(A, drop_tol=drop_tol, dtype=dtype,
                    block_size=block_size, **ainv_kw)
    n = A.shape[0]
    Gmask = np.ones(n, dtype=bool)
    Gmask[J] = False
    Gi = np.nonzero(Gmask)[0]
    S = A.to_scipy().tocsr().astype(np.float64)
    if reorder and not _diag_banded(S, Gi):
        # RCM exists to band DISCOVERY-ordered netlists whose interlayer
        # couplings blow every windowed format's footprint. When the
        # grounded block already has dense-diagonal structure (geometric
        # load-time ordering, frontend/mna.py geometric_node_order), RCM
        # would *shred* it — the AINV factors of the stencil-ordered block
        # stay stencil-ordered (measured at 524K: 16 diagonals, 95% dense
        # -> pure DIA apply, vs RCM-space factors landing on the slab
        # kernel with a ~283 s Mosaic compile).
        perm = rcm_ordering(CSRMatrix.from_scipy(S[Gi][:, Gi].tocsr()))
        Gi = Gi[perm]
    Agg = CSRMatrix.from_scipy(S[Gi][:, Gi].tocsr())
    Agj = S[Gi][:, J].tocsr()
    Ajg = S[J][:, Gi].tocsr()
    Ajj = S[J][:, J].toarray()
    _mark("block split")

    # Mg on the grounded block: geometric multigrid when the block is
    # grid-structured at scale (V-cycle bounds the GMRES count O(1) in n
    # where block-Jacobi AINV's grows with the grid — measured 704
    # iters/step at 524K with AINV), AINV otherwise.
    Mg = None
    MgAgj_s = None   # sparse host (Mg o Agj) when cheaply available
    if Agg.shape[0] >= mg_min_n:
        from gmres_tpu.precond.mg import mg as build_mg

        Mg, mg_host = build_mg(Agg, dtype=dtype, with_host=True)
        if Mg is None:
            # Pure-conductance blocks (DC: G alone, no C/h) are
            # near-singular Laplacians on which the SA hierarchy stagnates
            # (rho ~ 1.0 measured at 2.1M) while a lightly regularized copy
            # contracts fine. Build the hierarchy on Agg + eps*diag and use
            # it as Mg for the TRUE block — preconditioner semantics, and
            # GMRES absorbs the handful of outlier modes (measured: 0.70
            # stationary rho on true G, ~40-iteration DC solves vs 1245
            # with AINV-Mg).
            import scipy.sparse as _sp

            d0 = np.asarray(Agg.diagonal())
            Ash = CSRMatrix.from_scipy(
                (Agg.to_scipy() + _sp.diags(1e-4 * d0)).tocsr())
            Mg, mg_host = build_mg(Ash, dtype=dtype, with_host=True)
        _mark("mg build (host+device)")
    if Mg is not None:
        # Schur block via the TWO-LEVEL ADDITIVE proxy of the V-cycle:
        #   Mg ~ c0 D^-1  +  P A_c^-1 P^T      (P = composed SA prolongator)
        # so  S ~ c0 (Ajg D^-1 Agj) + (Ajg P) A_c^-1 (P^T Agj) - Ajj,
        # all SMALL host products (nj x nc at most). Exact alternatives
        # measured at 2.1M x 256 and rejected: host V-cycle columns ~300 s
        # single-threaded; device vmapped V-cycle needs a multi-minute
        # remote compile of its own. The Schur only steers the
        # preconditioner: pads couple through the grid, which is exactly
        # the coarse-solve term; the c0 D^-1 term carries the local
        # response (weight = the SA damping 4/(3 lmax)). DC at 2.1M: 10
        # GMRES iterations with the exact Schur — proxy parity is pinned
        # in tests/test_mg.py.
        if not mg_host.Ps:
            # zero-level hierarchy: Mg IS the dense coarse inverse — exact
            S_dense = (Ajg @ (mg_host.coarse_inv @ Agj.toarray())) - Ajj
        else:
            # fold the P chain column-wise/row-wise — never materialize the
            # composed prolongator (its sparse self-product costs minutes
            # at 2.1M; these nj-wide chains cost milliseconds)
            T = Agj                                        # (n_l, nj)
            for P in mg_host.Ps:
                T = P.T @ T
            W = Ajg                                        # (nj, n_l)
            for P in mg_host.Ps:
                W = W @ P
            c0 = 4.0 / (3.0 * mg_host.lmaxs[0])
            Dinv = sp.diags(mg_host.inv_diags[0])
            S_dense = np.asarray(
                W @ (mg_host.coarse_inv @ T.toarray())
                + c0 * (Ajg @ (Dinv @ Agj)).toarray()
                - Ajj)
        _mark("schur columns (two-level proxy)")
    else:
        # AINV (host factors reused for the sparse Schur build)
        Z, Wt, inv_d = ainv_factor(
            Agg, drop_tol, ainv_kw.get("max_col_nnz", 0),
            block_size if block_size is not None
            else (0 if Agg.shape[0] <= 131072 else 65536))
        from gmres_tpu.precond.ainv import AinvPrecond

        if ainv_kw.get("fmt", "auto") == "auto":
            from gmres_tpu.ops.spmv import device_matrix

            Zd = device_matrix(Z, dtype=dtype)
            Wd = device_matrix(Wt, dtype=dtype)
        else:
            Zd = Z.to_ell(dtype=dtype)
            Wd = Wt.to_ell(dtype=dtype)
        Mg = AinvPrecond(Z=Zd, Wt=Wd, inv_d=to_device(inv_d, dtype))
        _mark("ainv build")
        Zs, Wts = Z.to_scipy(), Wt.to_scipy()
        MgAgj = Zs @ sp.diags(inv_d) @ (Wts @ Agj)
        if MgAgj.nnz <= 4 * max(Agg.nnz, 1):
            MgAgj_s = MgAgj.tocsr()
        S_dense = (Ajg @ MgAgj).toarray() - Ajj
    # the Schur block of a connected PG grid is nonsingular; regularize
    # defensively against degenerate fixtures
    try:
        S_inv = np.linalg.inv(S_dense)
    except np.linalg.LinAlgError:
        S_inv = np.linalg.pinv(S_dense)
    _mark("schur inverse")

    ng = Gi.size
    g_scatter = np.empty(n, dtype=np.int64)
    g_scatter[Gi] = np.arange(ng)
    g_scatter[J] = ng + np.arange(J.size)

    from gmres_tpu.ops.operator import as_operator

    def thin(M):
        # coupling blocks have O(|J|) nonzeros over a huge span: COO
        # scatter beats any tiled format outright
        C = CSRMatrix.from_scipy(M)
        return as_operator(C.to_device_coo(dtype=dtype),
                           logical_shape=M.shape)

    # Contiguous layout (grounded block = [0, ng), branch rows = tail):
    # the MNA stamper's natural layout, preserved by the geometric ordering
    # and by _diag_banded short-circuiting the RCM. Slice-based apply — an
    # explicit n-length gather costs ~12 ms at 2.1M on v5e even with
    # identity indices (probe_saddle_parts r4), ~25 ms/apply of pure waste.
    contiguous = bool(
        np.array_equal(Gi, np.arange(ng))
        and np.array_equal(J, np.arange(ng, n)))
    return SaddlePrecond(
        Mg=Mg,
        Agj=thin(Agj),
        Ajg=thin(Ajg),
        MgAgj=None if MgAgj_s is None else thin(MgAgj_s),
        S_inv=to_device(S_inv, dtype),
        g_gather=None if contiguous else jnp.asarray(Gi, jnp.int32),
        j_gather=None if contiguous else jnp.asarray(J, jnp.int32),
        g_scatter=None if contiguous else jnp.asarray(g_scatter, jnp.int32),
        n=n,
        ng=ng,
    )
