"""Geometric multigrid preconditioner for stencil-structured operators.

The reference's preconditioner hierarchy tops out at ILU/AINV
(preconditioner.h:34-84) — both give iteration counts that grow with the
grid (measured here: block-Jacobi AINV needs ~700 GMRES iters/step on a
524K-node P/G plane, ~300 on the 2.1M thermal stencil). On regular-grid
Poisson-class systems (3D-IC thermal FD grids, parserGCB.m; P/G planes)
a V-cycle of damped-Jacobi smoothing with factor-2 geometric coarsening
bounds the iteration count O(1) in n, and — the TPU-native part — every
operation in the cycle is a dense strided VPU/MXU op:

- smoothing / residuals: DIA stencil SpMV (shifted multiplies),
- restriction: reshape to (nz, fz, ny, fy, nx, fx) + sum — no gather,
- prolongation: broadcast along the same axes — no scatter,
- coarsest level: one dense (n_c, n_c) matmul (precomputed inverse).

The grid shape is inferred from the dense-diagonal offsets of the matrix
itself (1, sx, sx*ny — the same structural signal the DIA router keys
on), so the preconditioner needs no geometry input. Rows beyond the
inferred grid (pad resistor internals, odd-dimension leftovers) ride an
identity block through every transfer and are solved exactly on the
coarsest level. The coarse-grid operators PᵀAP are built once on the
host with sparse algebra (piecewise-constant P, the unsmoothed-
aggregation choice — exact transposes of the device reshape transfers).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gmres_tpu.ops.formats import CSRMatrix, to_device

__all__ = ["MgPrecond", "mg", "infer_grid"]


def infer_grid(A: CSRMatrix, min_density: float = 0.25
               ) -> Optional[Tuple[int, int, int]]:
    """(nz, ny, nx) implied by the dense diagonal offsets, or None.

    Looks for offsets {1, sx[, sxy]} with >=``min_density`` fill: row-major
    x-neighbors at +-1, y-neighbors at +-sx, z-neighbors at +-sxy = sx*ny.
    Rows past nz*ny*nx (there may be a few — pad internals) are the
    caller's tail block."""
    n = A.shape[0]
    if A.shape[0] != A.shape[1] or A.nnz == 0 or n < 64:
        return None
    rows = np.repeat(np.arange(n), A.row_lengths())
    offs = A.indices.astype(np.int64) - rows
    diag, counts = np.unique(offs, return_counts=True)
    dense = set(diag[(counts >= min_density * n) & (diag > 0)].tolist())
    if 1 not in dense:
        return None
    strides = sorted(d for d in dense if d > 1)
    if not strides:
        return None
    sx = strides[0]
    if sx < 2:
        return None
    if len(strides) >= 2 and strides[1] % sx == 0:
        sxy = strides[1]
        ny = sxy // sx
        nz = n // sxy
    else:
        ny = n // sx
        nz = 1
    nx = sx
    if nx * ny * nz < max(64, n // 2):   # inferred grid must cover most rows
        return None
    return (max(nz, 1), ny, nx)


def _coarsen_dims(dims: Tuple[int, int, int]) -> Tuple[int, ...]:
    """Factor (fz, fy, fx): 2 along every even dim > 1, else 1."""
    return tuple(2 if (d > 1 and d % 2 == 0) else 1 for d in dims)


def _prolong_scipy(dims, factors, n, dtype=np.float64):
    """Host P (n, n_c): piecewise-constant over the (fz, fy, fx) blocks of
    the grid part, identity on the tail — the exact transpose of the
    device reshape-sum restriction."""
    import scipy.sparse as sp

    nz, ny, nx = dims
    fz, fy, fx = factors
    ngrid = nz * ny * nx
    cz, cy, cx = nz // fz, ny // fy, nx // fx
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    coarse = ((z // fz) * cy + (y // fy)) * cx + (x // fx)
    rows = np.arange(ngrid)
    cols = coarse.reshape(-1)
    tail = n - ngrid
    Pg = sp.coo_matrix((np.ones(ngrid, dtype), (rows, cols)),
                       shape=(ngrid, cz * cy * cx))
    if tail:
        return sp.block_diag([Pg, sp.eye(tail, dtype=dtype)],
                             format="csr")
    return Pg.tocsr()


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ops", "inv_diags", "coarse_inv"],
    meta_fields=["dims", "factors", "tails", "omega", "nu", "smoother",
                 "lmaxs", "transfer", "p_weights"],
)
@dataclasses.dataclass(frozen=True)
class MgPrecond:
    """V-cycle. ``ops[l]``/``inv_diags[l]`` act on level l;
    ``dims[l]``/``factors[l]``/``tails[l]`` define the reshape transfers
    from level l to l+1; ``coarse_inv`` is the dense inverse of the last
    level's operator.

    ``smoother``: "chebyshev" (default) — degree-``nu`` Chebyshev
    polynomial in D^{-1}A targeting [lmax/4, lmax] (``lmaxs[l]`` estimated
    by host power iteration at build). Pure SpMVs + axpys, the TPU-optimal
    smoother, and far stronger on rough-coefficient PG planes than damped
    Jacobi (measured: see mg() docstring). "jacobi" — nu damped-Jacobi
    sweeps with factor ``omega`` (the round-3 cycle, kept for A/B)."""

    ops: Tuple[object, ...]
    inv_diags: Tuple[jax.Array, ...]
    coarse_inv: jax.Array
    dims: Tuple[Tuple[int, int, int], ...]
    factors: Tuple[Tuple[int, int, int], ...]
    tails: Tuple[int, ...]
    omega: float
    nu: int
    smoother: str = "chebyshev"
    lmaxs: Tuple[float, ...] = ()
    # "smoothed" = smoothed-aggregation transfers: P = (I - w D^-1 A) T
    # with T the piecewise-constant tentative. On device this is the SAME
    # reshape transfer bracketed by one fine-level SpMV (restrict:
    # T^T (r - w A D^-1 r); prolong: g - w D^-1 A g, g = T xc) — no
    # gathers. "constant" = bare reshape transfers (round-3 cycle).
    transfer: str = "constant"
    p_weights: Tuple[float, ...] = ()

    # -- transfers (pure reshapes/broadcasts; exact transposes) --

    # Factor-2 grid transfers, chosen by MEASUREMENT on v5e (128^3 grid):
    # restriction = per-axis stride-2 slice sums (38.5/3.9/5.2 us for
    # lane/sublane/leading axes); prolongation = stride-2 scatter
    # .at[].set (10 us). Rejected lowerings of the same math:
    # 6-D (..,2,..,2) reshape-sum — XLA tiles trailing size-2 dims onto
    # (8,128) vregs at 64x padding, 1549 us standalone and 19.9 GB of HLO
    # temps inside a GMRES while-loop (BENCH r4 MG OOM); single-channel
    # 3-D convs — degenerate MXU use, 4.5 ms + bf16 rounding;
    # lax.reduce_window — 20 us standalone but its compile inside a
    # fori_loop never returned (>20 min remote compile). Slice sums and
    # scatters are exact adds.

    def _restrict(self, l: int, r: jax.Array) -> jax.Array:
        (nz, ny, nx), (fz, fy, fx) = self.dims[l], self.factors[l]
        ngrid = nz * ny * nx
        g = r[:ngrid].reshape(nz, ny, nx)
        if fx == 2:
            g = g[:, :, 0::2] + g[:, :, 1::2]
        if fy == 2:
            g = g[:, 0::2, :] + g[:, 1::2, :]
        if fz == 2:
            g = g[0::2] + g[1::2]
        out = g.reshape(-1)
        return jnp.concatenate([out, r[ngrid:]]) if self.tails[l] else out

    def _prolong(self, l: int, xc: jax.Array) -> jax.Array:
        (nz, ny, nx), (fz, fy, fx) = self.dims[l], self.factors[l]
        cz, cy, cx = nz // fz, ny // fy, nx // fx
        g = xc[: cz * cy * cx].reshape(cz, cy, cx)
        if fz == 2:
            g = jnp.zeros((nz, cy, cx), g.dtype).at[0::2].set(g).at[1::2].set(g)
        if fy == 2:
            g = jnp.zeros((g.shape[0], ny, cx), g.dtype) \
                .at[:, 0::2, :].set(g).at[:, 1::2, :].set(g)
        if fx == 2:
            g = jnp.zeros((g.shape[0], g.shape[1], nx), g.dtype) \
                .at[:, :, 0::2].set(g).at[:, :, 1::2].set(g)
        g = g.reshape(-1)
        return jnp.concatenate([g, xc[cz * cy * cx:]]) if self.tails[l] \
            else g

    def _smooth(self, l: int, b: jax.Array, x) -> jax.Array:
        A, invd = self.ops[l], self.inv_diags[l]
        if self.smoother == "chebyshev":
            return _cheb_smooth(A, invd, b, x, self.lmaxs[l], self.nu)
        om = jnp.asarray(self.omega, b.dtype)
        if x is None:
            x = om * invd * b
            sweeps = self.nu - 1
        else:
            sweeps = self.nu
        for _ in range(sweeps):
            x = x + om * invd * (b - A(x))
        return x

    def _cycle(self, l: int, b: jax.Array) -> jax.Array:
        if l == len(self.ops):
            # HIGHEST: TPU f32 matmuls default to bf16 MXU passes; the
            # coarse solve anchors the cycle, and the matrix is tiny
            return jnp.dot(self.coarse_inv, b,
                           precision=jax.lax.Precision.HIGHEST)
        A, invd = self.ops[l], self.inv_diags[l]
        x = self._smooth(l, b, None)
        r = b - A(x)
        if self.transfer == "smoothed":
            w = jnp.asarray(self.p_weights[l], b.dtype)
            rc = self._restrict(l, r - w * A(invd * r))
            xc = self._cycle(l + 1, rc)
            g = self._prolong(l, xc)
            x = x + g - w * invd * A(g)
        else:
            xc = self._cycle(l + 1, self._restrict(l, r))
            x = x + self._prolong(l, xc)
        return self._smooth(l, b, x)

    def __call__(self, v: jax.Array) -> jax.Array:
        return self._cycle(0, v)


def _cheb_smooth(A, invd, b, x, lmax, degree):
    """Degree-``degree`` Chebyshev semi-iteration on the D^{-1}A spectrum
    [lmax/4, lmax] (the hypre convention). ``x=None`` means zero initial
    guess (saves one A apply). Works elementwise on (n,) device vectors AND
    (n, k) host multi-RHS blocks — invd broadcasting handles both."""
    lmin = lmax / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    if x is None:
        rt = invd * b
        x = None
    else:
        rt = invd * (b - A(x))
    d = rt / theta
    for k in range(degree):
        x = d if x is None else x + d
        if k == degree - 1:
            break
        rt = rt - invd * A(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * rt
        rho = rho_new
    return x


def _level_lmax(S, dinv) -> float:
    """Power-iteration estimate of lambda_max(D^{-1} S), host f64."""
    rng = np.random.default_rng(1)
    v = rng.standard_normal(S.shape[0])
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(8):
        w = dinv * (S @ v)
        lam = float(np.linalg.norm(w))
        if lam == 0.0:
            return 1.0
        v = w / lam
    return 1.05 * lam


def mg(A: CSRMatrix, *, dtype=jnp.float32, n_coarse: int = 2048,
       omega: float = 0.67, nu: int = 2, smoother: str = "chebyshev",
       transfer: str = "smoothed",
       max_levels: int = 16, with_host: bool = False,
       validate: bool = True, max_contraction: float = 0.5):
    """Build the V-cycle hierarchy, or None when A has no grid structure
    (caller falls back to AINV). Host setup is a chain of sparse PᵀAP
    products (O(nnz) each, halving per level).

    ``validate``: probe the finished cycle as a stationary iteration on a
    random RHS (4 cycles, host f64) and return None unless the per-cycle
    residual contraction is <= ``max_contraction``. Geometric coarsening
    with piecewise-constant transfers is only a good coarse model when the
    coefficient field is smooth: thermal FD cubes contract at ~0.1-0.2 per
    cycle, but PG planes (lognormal segment conductances, mΩ pad anchors,
    layer stacks glued by sparse vias) stagnate near 1 — measured 0.67 and
    0.87 asymptotic on 2-layer/1-layer contest fixtures, which plateaus
    GMRES at ~1e-5 true residual (the DC solve at 2.1M then *diverges* in
    the left-preconditioned norm). The probe costs ~10 SpMV-equivalents on
    the host, once, at build time; weak hierarchies fall back to AINV in
    every caller (make_preconditioner, saddle).

    ``with_host``: also return a NumPy/f64 multi-RHS apply with identical
    cycle semantics — for host-side uses like the saddle Schur build
    (64 columns through the cycle without any device dispatch)."""
    from gmres_tpu.ops.spmv import device_operator

    dims0 = infer_grid(A)
    if dims0 is None:
        return (None, None) if with_host else None
    S = A.to_scipy().tocsr().astype(np.float64)
    dims_meta, factors_meta, tails = [], [], []
    host_S, host_P, host_d, host_lmax, host_w = [], [], [], [], []
    dims = dims0
    for _ in range(max_levels):
        n = S.shape[0]
        f = _coarsen_dims(dims)
        if n <= n_coarse or all(x == 1 for x in f):
            break
        d = S.diagonal()
        d = np.where(d != 0.0, d, 1.0)
        ngrid = dims[0] * dims[1] * dims[2]
        dims_meta.append(dims)
        factors_meta.append(f)
        tails.append(n - ngrid)
        P = _prolong_scipy(dims, f, n)
        lmax = _level_lmax(S, 1.0 / d) \
            if (smoother == "chebyshev" or transfer == "smoothed") else 1.0
        if transfer == "smoothed":
            # smoothed aggregation: damp the tentative interpolant with one
            # Jacobi step of THIS level's operator (weight 4/(3 lmax), the
            # SA standard) — the coarse space then approximates the
            # low-energy modes of rough-coefficient operators that
            # piecewise-constant transfers miss (measured on a 100K PG
            # plane: rho 0.81 -> see MEASUREMENTS r4)
            import scipy.sparse as _sp

            w = 4.0 / (3.0 * lmax)
            Dinv = _sp.diags(1.0 / d)
            P = (P - w * (Dinv @ (S @ P))).tocsr()
            host_w.append(w)
        else:
            host_w.append(0.0)
        host_S.append(S)
        host_P.append(P)
        host_d.append(1.0 / d)
        host_lmax.append(lmax)
        S = (P.T @ S @ P).tocsr()
        dims = tuple(d // ff for d, ff in zip(dims, f))
    nc = S.shape[0]
    if nc > 16384:
        # never materialize a >1 GB dense coarse inverse
        return (None, None) if with_host else None
    coarse = np.linalg.inv(S.toarray())

    def host_smooth(l, B, X):
        Sl, dl = host_S[l], host_d[l][:, None]
        if smoother == "chebyshev":
            return _cheb_smooth(lambda v: Sl @ v, dl, B, X,
                                host_lmax[l], nu)
        if X is None:
            X = omega * dl * B
            sweeps = nu - 1
        else:
            sweeps = nu
        for _ in range(sweeps):
            X = X + omega * dl * (B - Sl @ X)
        return X

    def host_cycle(l, B):
        if l == len(host_S):
            return coarse @ B
        Sl, Pl = host_S[l], host_P[l]
        X = host_smooth(l, B, None)
        R = B - Sl @ X
        X = X + Pl @ host_cycle(l + 1, Pl.T @ R)
        return host_smooth(l, B, X)

    if validate and host_S:
        S0 = host_S[0]
        b = np.random.default_rng(0).standard_normal((S0.shape[0], 1))
        b /= np.linalg.norm(b)
        x = np.zeros_like(b)
        r = b
        # Estimate the ASYMPTOTIC contraction: discard the first cycle
        # (zero-guess transients contract fast on any hierarchy) and take
        # the geometric mean over the tail — a hierarchy with rho ~0.7-0.9
        # asymptotic (measured on PG planes) must not pass on its initial
        # burst and then plateau the GMRES it preconditions.
        cycles = 6
        norms = []
        for _ in range(cycles):
            x = x + host_cycle(0, r)
            r = b - S0 @ x
            norms.append(float(np.linalg.norm(r)))
        if norms[0] == 0.0:
            rho = 0.0
        else:
            rho = (norms[-1] / norms[0]) ** (1.0 / (cycles - 1))
        if not np.isfinite(rho) or rho > max_contraction:
            return (None, None) if with_host else None

    # device hierarchy only after the probe passes (no wasted transfers).
    # Level operators are (smoothed-aggregation) grid stencils: route them
    # straight to DIA instead of through the generic device_matrix router,
    # whose hybrid/slab host analysis cost 8.1 of the 20.3 s mg() build at
    # 2.1M (r5 profile; VERDICT r4 weak #5) — a few extra low-fill
    # diagonals on a coarse level cost microseconds per apply, the
    # analysis cost seconds per build.
    def _level_op(l, Sl):
        from gmres_tpu.ops.operator import DenseOp, as_operator

        n = Sl.shape[0]
        if l > 0 and n <= 8192:
            # small coarse level: dense MXU matvec. SA coarsening fills
            # these to >50% anyway (2.1M hierarchy: n=4096 has 2.1M nnz
            # over 787 diagonals); a 4096^2 f32 matvec reads 67 MB
            # (~80 us) while the sparse router's host analysis costs
            # seconds per build (r5 profile: 16.6 of the 31.3 s mg()
            # build was _level_op, VERDICT r4 weak #5)
            return DenseOp(A=to_device(Sl.toarray(), dtype))
        Ac = CSRMatrix.from_scipy(Sl)
        rows = np.repeat(np.arange(n), np.diff(Ac.indptr))
        ndiag = np.unique(Ac.indices.astype(np.int64) - rows).size
        itemsize = np.dtype(np.float32).itemsize if dtype != jnp.float64 \
            else 8
        slab_bytes = ndiag * (((n + 1023) // 1024) * 1024) * itemsize
        fill = Ac.nnz / max(ndiag * n, 1)
        if ndiag <= 128 or (ndiag <= 512 and slab_bytes <= 96 << 20
                            and fill >= 0.25):
            # mid levels: pure DIA even past the generic 128-diagonal cap
            # when the slab is byte-bounded and actually full — a
            # 179-diagonal 32K level is a 23 MB slab (~30 us/apply at
            # roofline), vs ~5 s of WELL/hybrid packing per build
            return as_operator(Ac.to_dia(dtype=dtype, pad_to=1024,
                                         max_diags=512),
                               logical_shape=Ac.shape)
        # remaining levels take the full router: a raw-slab level op
        # measured 1.3 ms/SpMV at 524K where the hybrid's DIA+planes
        # split runs ~0.1 ms — the cycle executes every transient
        # iteration, so apply speed beats the router's one-time analysis
        # seconds (an r5 slab shortcut here made the saddle-MG apply
        # 34 ms and tripped the worker watchdog on 50-step flagship
        # dispatches)
        return device_operator(Ac, dtype=dtype)

    ops = tuple(_level_op(l, Sl) for l, Sl in enumerate(host_S))
    inv_diags = tuple(to_device(dl, dtype) for dl in host_d)
    M = MgPrecond(
        ops=ops,
        inv_diags=inv_diags,
        coarse_inv=to_device(coarse, dtype),
        dims=tuple(dims_meta),
        factors=tuple(factors_meta),
        tails=tuple(tails),
        omega=float(omega),
        nu=int(nu),
        smoother=smoother,
        lmaxs=tuple(host_lmax),
        transfer=transfer,
        p_weights=tuple(host_w),
    )
    if not with_host:
        return M

    def host_apply(B: np.ndarray) -> np.ndarray:
        B = np.asarray(B, dtype=np.float64)
        squeeze = B.ndim == 1
        if squeeze:
            B = B[:, None]
        X = host_cycle(0, B)
        return X[:, 0] if squeeze else X

    # expose the host hierarchy for callers that need structural access
    # (the saddle Schur build uses the P chain + coarse inverse directly)
    host_apply.Ps = host_P
    host_apply.coarse_inv = coarse
    host_apply.inv_diags = host_d
    host_apply.lmaxs = host_lmax
    return M, host_apply
