"""Headline benchmark: SpMV nnz/s per chip AND GMRES time-to-1e-6
(both halves of the BASELINE.json primary metric).

Prints ONE JSON line. SpMV workloads mirror the reference's own SpMV
benchmark (src_thermal/main.cu:203-260); the GMRES arms mirror its solver
bench (main.cu:460-527: full solve, iterations + residual + wall time) on
the 2.1M-row thermal stencil (jacobi + AINV) and the 100K natural-order PG
matrix (hybrid router + the production '-precond auto' choice):

- ``value``: DIA-format SpMV on a 7-point 3D-Laplacian thermal matrix
  (stencil fast path, 2.1M rows / 14.6M nnz) — the flagship number.
- ``extra.well_nnz_per_s``: WELL-format SpMV on a ~100K-row PG-MNA-like
  general-sparsity matrix (irregular power grid + via stacks + V-source
  branch rows, RCM-ordered) — the path every real netlist lands on.

Both verify against f64 host oracles before timing (rel L2 < 1e-5,
main.cu:263-279 analogue). Timing: slope between two chained in-graph
iteration counts — the tunneled backend has a ~23 ms fixed cost per call,
so a single fixed-count chain overstates per-op time (round 1's numbers
were inflated ~4x for the flagship and ~70x for small ops).

``vs_baseline``: the reference never published absolute SpMV rates; its
GFLOPS metric (2*nnz/time) on the Tesla C2070 (144 GB/s) tops out around
5e9 nnz/s for CSR SpMV — that is the denominator (see BASELINE.md).

The tunneled TPU backend is flaky (round-1 bench died at first device_put:
"Unable to initialize backend 'axon'"); init is retried with backoff over
~2 minutes, and any terminal failure still emits a structured JSON line.
"""

import json
import sys
import time
import traceback

import numpy as np

BASELINE_NNZ_PER_S = 5e9
# v5e HBM bandwidth (819 GB/s): roofline fractions below report
# achieved-bytes / peak-bytes where achieved-bytes is the MINIMAL data an
# ideal scattered format would move (4 B value + 1 B packed index per nnz
# + the x read and y write) — i.e. fraction of speed-of-light for the
# memory-bound SpMV, comparable to the reference CSR kernel's ~25% of its
# C2070's 144 GB/s (SpMV_kernel.cu:166-251; VERDICT r4 next #1).
HBM_BYTES_PER_S = 819e9


def roofline_frac(nnz: int, n: int, dt: float) -> float:
    return (nnz * 5.0 + 8.0 * n) / dt / HBM_BYTES_PER_S


def _wait_for_backend(attempts: int = 5, base_delay: float = 8.0):
    """Retry jax backend init with exponential backoff (~2 min total).

    The axon tunnel drops intermittently; a failed PJRT init is cached by
    jax, so each retry clears the backend cache first."""
    last = None
    for k in range(attempts):
        try:
            import jax

            jax.config.update("jax_enable_x64", True)
            devs = jax.devices()
            # touch the device for real: init can "succeed" while the
            # tunnel is wedged; a tiny transfer proves liveness.
            import jax.numpy as jnp

            _ = float(jnp.asarray(1.0) + 1.0)
            return jax, devs
        except Exception as e:  # noqa: BLE001 — init raises RuntimeError subclasses
            last = e
            try:
                import jax

                jax.clear_caches()
                from jax._src import xla_bridge

                xla_bridge.backends_are_initialized() and \
                    xla_bridge._clear_backends()  # noqa: SLF001
            except Exception:  # noqa: BLE001
                pass
            if k < attempts - 1:
                time.sleep(base_delay * (1.6 ** k))
    raise RuntimeError(f"backend init failed after {attempts} attempts: {last}")


def build_dia_laplacian3d(nx: int, pad_to: int = 1024):
    """7-point 3D Laplacian directly in DIA layout (row-aligned convention:
    data[d, i] multiplies x[i + off_d])."""
    import jax.numpy as jnp

    from gmres_tpu.ops.formats import DiaMatrix, round_up

    n = nx ** 3
    n_pad = round_up(n, pad_to)
    offsets = [-nx * nx, -nx, -1, 0, 1, nx, nx * nx]
    i = np.arange(n)
    ix = i % nx
    iy = (i // nx) % nx
    iz = i // (nx * nx)
    data = np.zeros((len(offsets), n_pad), dtype=np.float32)
    data[0, : n][iz > 0] = -1.0
    data[1, : n][iy > 0] = -1.0
    data[2, : n][ix > 0] = -1.0
    data[3, : n] = 6.0
    data[4, : n][ix < nx - 1] = -1.0
    data[5, : n][iy < nx - 1] = -1.0
    data[6, : n][iz < nx - 1] = -1.0
    nnz = int((data != 0).sum())
    A = DiaMatrix(data=tuple(jnp.asarray(row) for row in data),
                  offsets=tuple(offsets),
                  shape=(n_pad, n_pad), logical_n=n)
    return A, data, nnz


def dia_matvec_numpy(data: np.ndarray, offsets, x: np.ndarray) -> np.ndarray:
    n = data.shape[1]
    y = np.zeros(n, dtype=np.float64)
    for d, off in enumerate(offsets):
        lo = max(0, -off)
        hi = min(n, n - off)
        y[lo:hi] += data[d, lo:hi].astype(np.float64) * x[lo + off: hi + off]
    return y


def build_pg_mna(nx: int = 316, seed: int = 0, rcm: bool = True):
    """~100K-row PG-MNA-like general-sparsity matrix: irregular 2-D grid
    conductances with randomly deleted edges, long-range via connections,
    and (optionally) RCM ordering. Matches the 100K/498K-nnz matrix class
    of MEASUREMENTS.md §WELL. Natural ordering (rcm=False) is what the
    front-end produces and what the hybrid DIA+WELL router expects."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rng = np.random.default_rng(seed)
    n = nx * nx
    i = np.arange(n)
    right = i[(i % nx) < nx - 1]
    down = i[i < n - nx]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + nx])
    keep = rng.random(rows.shape[0]) > 0.08      # irregular: drop 8% of edges
    rows, cols = rows[keep], cols[keep]
    # via stacks: 2% of nodes get a long-range connection
    nv = n // 50
    vr = rng.integers(0, n, nv)
    vc = (vr + rng.integers(nx * 3, nx * 20, nv)) % n
    rows = np.concatenate([rows, vr])
    cols = np.concatenate([cols, vc])
    g = rng.uniform(0.5, 2.0, rows.shape[0])
    G = sp.coo_matrix((-g, (rows, cols)), shape=(n, n))
    G = G + G.T
    d = -np.asarray(G.sum(axis=1)).ravel() + 1e-3
    A = (G + sp.diags(d)).tocsr()
    if not rcm:
        return A
    p = reverse_cuthill_mckee(A, symmetric_mode=True)
    return A[p][:, p].tocsr()


_CHAIN_CACHE = {}


def _chain_time(jax, op, x, iters, reps=5):
    """Time a chained apply of ``op`` (an operator PYTREE passed as a jit
    ARGUMENT — a closure would bake multi-hundred-MB operands into the
    program and die at the remote-compile size limit, the r3 applyprobe
    failure)."""
    import jax.numpy as jnp
    from jax import lax

    if "chain" not in _CHAIN_CACHE:
        @jax.jit
        def chain(o, v, it):
            return lax.fori_loop(0, it, lambda i, u: o(u) * 0.08, v)

        _CHAIN_CACHE["chain"] = chain
    chain = _CHAIN_CACHE["chain"]
    _ = float(jnp.sum(chain(op, x, iters)))          # compile + warm
    best = float("inf")
    for _k in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(chain(op, x, iters)))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_chain(jax, op, x, n1=10, target_span=0.08, max_n2=20000):
    """Per-SpMV seconds with the fixed per-dispatch cost removed.

    The tunneled backend adds a ~23 ms round-trip per *call* with ms-scale
    jitter — amortizing over a fixed iteration count (round 1 used 100)
    understates fast ops by up to 240 us/op. Instead time two chained
    iteration counts and take the slope, sizing the span so the measured
    work dwarfs the jitter."""
    t1 = _chain_time(jax, op, x, n1)
    n_pilot = n1 + 200
    tp = _chain_time(jax, op, x, n_pilot, reps=3)
    per = max((tp - t1) / (n_pilot - n1), 1e-9)
    n2 = int(min(max(n_pilot, n1 + target_span / per), max_n2))
    t2 = _chain_time(jax, op, x, n2)
    return max((t2 - t1) / (n2 - n1), 1e-12)


def _dispatch_cost(jax, reps: int = 5) -> float:
    """Fixed per-call round-trip of the tunneled backend (~23 ms), measured
    so one-dispatch timings (a whole GMRES solve) can subtract it."""
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros(8, jnp.float32)
    _ = float(jnp.sum(f(z)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(z)))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_gmres(jax, Aop, b_dev, M_left, disp, *, M_right=None, tol=1e-6,
                restart=32, maxiter=4000, reps=3, A_hi=None,
                work_dtype=None):
    """One-dispatch GMRES timing: min-of-reps wall time minus the fixed
    dispatch cost. The solve is a single XLA program (lax.while_loop), so
    slope timing does not apply; at 100s-of-ms solves the ~1 ms jitter is
    noise. Mirrors the reference's bench harness contract — run the full
    solve, report iterations + residual + time (src_thermal/main.cu:460-527).
    """
    from gmres_tpu.solvers.gmres import gmres

    res = gmres(Aop, b_dev, restart=restart, tol=tol, maxiter=maxiter,
                M_left=M_left, M_right=M_right, A_hi=A_hi,
                work_dtype=work_dtype)
    iters = int(res.iterations)            # forces + warms the program
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = gmres(Aop, b_dev, restart=restart, tol=tol, maxiter=maxiter,
                  M_left=M_left, M_right=M_right, A_hi=A_hi,
                  work_dtype=work_dtype)
        _ = float(r.residual)
        best = min(best, time.perf_counter() - t0)
    solve_s = max(best - disp, 1e-9)
    return res, solve_s, iters


def main():
    try:
        jax, _ = _wait_for_backend()
        import jax.numpy as jnp

        from gmres_tpu.ops.formats import CSRMatrix, DiaMatrix, round_up
        from gmres_tpu.ops.spmv import device_operator, spmv
        from gmres_tpu.ops.well import to_well

        # ---- DIA stencil path (flagship) ----
        nx = 128  # 2.1M nodes, 14.6M nnz
        A, data_np, nnz = build_dia_laplacian3d(nx)
        n_pad = A.shape[0]
        x_np = np.zeros(n_pad, np.float32)
        x_np[: nx ** 3] = np.random.default_rng(0).standard_normal(nx ** 3)
        x = jnp.asarray(x_np)
        from gmres_tpu.ops.operator import MatOp

        y = jax.jit(spmv)(A, x)
        y_ref = dia_matvec_numpy(data_np, A.offsets, x_np.astype(np.float64))
        rel = np.linalg.norm(np.asarray(y) - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-5, f"DIA SpMV verify failed: rel={rel}"
        dt = bench_chain(jax, MatOp(A), x)
        dia_nnz_per_s = nnz / dt
        # In the chained-apply timing regime the 8 MB x/y vectors stay
        # VMEM-resident across iterations; the HBM stream is the diagonal
        # data itself (ndiag * n_pad * 4 B). Measured r5: that stream runs
        # at ~0.84 TB/s = ~1.0x the v5e HBM peak — the DIA path is AT the
        # memory roofline.
        dia_bytes = len(A.offsets) * n_pad * 4.0
        extra0 = {
            "dia_hbm_bytes_per_s": dia_bytes / dt,
            "dia_roofline_frac": dia_bytes / dt / HBM_BYTES_PER_S,
        }

        # ---- general-sparsity paths (every real PG netlist) ----
        # two arms: (a) the production router on the natural-ordered PG
        # matrix (hybrid DIA + scattered remainder), (b) the raw slab-WELL
        # kernel on the RCM-banded ordering (no dense diagonals to lean on)
        extra = dict(extra0)

        def measure(Ac, dev):
            from gmres_tpu.ops.operator import MatOp

            nw = dev.shape[1]
            xw_np = np.zeros(nw, np.float32)
            xw_np[: Ac.shape[0]] = np.random.default_rng(1).standard_normal(
                Ac.shape[0])
            xw = jnp.asarray(xw_np)
            yw = jax.jit(spmv)(dev, xw)
            yw_ref = Ac.astype(np.float64) @ xw_np[: Ac.shape[0]].astype(
                np.float64)
            relw = (np.linalg.norm(np.asarray(yw)[: Ac.shape[0]] - yw_ref)
                    / np.linalg.norm(yw_ref))
            assert relw < 1e-5, f"verify failed: rel={relw}"
            return bench_chain(jax, MatOp(dev), xw)

        try:
            from gmres_tpu.ops.spmv import device_matrix
            from gmres_tpu.ops.well import to_well, to_well_slab

            An = build_pg_mna(rcm=False)
            Hn = device_matrix(CSRMatrix.from_scipy(An), dtype=jnp.float32)
            dtn = measure(An, Hn)
            extra.update({
                "pg_nnz_per_s": An.nnz / dtn,
                "pg_vs_baseline": An.nnz / dtn / BASELINE_NNZ_PER_S,
                "pg_variant": type(Hn).__name__,
                "pg_n": int(An.shape[0]), "pg_nnz": int(An.nnz),
                "pg_roofline_frac_ideal": roofline_frac(
                    int(An.nnz), int(An.shape[0]), dtn),
            })
        except Exception as e:  # noqa: BLE001 — flagship number still reports
            extra["pg_error"] = f"{type(e).__name__}: {e}"
        try:
            Ab = build_pg_mna(rcm=True)
            W = to_well_slab(CSRMatrix.from_scipy(Ab), dtype=jnp.float32)
            if W is None:
                W = to_well(CSRMatrix.from_scipy(Ab), dtype=jnp.float32)
            dtw = measure(Ab, W)
            extra.update({
                "well_nnz_per_s": Ab.nnz / dtw,
                "well_vs_baseline": Ab.nnz / dtw / BASELINE_NNZ_PER_S,
                "well_variant": type(W).__name__,
                "well_roofline_frac_ideal": roofline_frac(
                    int(Ab.nnz), int(Ab.shape[0]), dtw),
            })
        except Exception as e:  # noqa: BLE001
            extra["well_error"] = f"{type(e).__name__}: {e}"

        # ---- GMRES time-to-1e-6 (the second half of the primary metric:
        # BASELINE.md "GMRES time-to-tol"; reference harness contract
        # src_thermal/main.cu:460-527 runs the full solve and reports
        # iterations + residual + wall time) ----
        from gmres_tpu.ops.operator import as_operator

        disp = _dispatch_cost(jax)
        extra["dispatch_cost_s"] = disp
        n_log = nx ** 3
        rng_g = np.random.default_rng(7)
        bg = rng_g.standard_normal(n_log)
        bd = jnp.asarray(bg, jnp.float32)
        Aop_g = as_operator(A, logical_shape=(n_log, n_log))

        def true_rel(x):
            xp = np.zeros(n_pad)
            xp[:n_log] = np.asarray(x, np.float64)[:n_log]
            r = bg - dia_matvec_numpy(data_np, A.offsets, xp)[:n_log]
            return float(np.linalg.norm(r) / np.linalg.norm(bg))

        try:  # thermal 2.1M, Jacobi (the headline gmres numbers).
            # GMRES-IR (A_hi): plain f32 stalls at 1.005e-6 true relative
            # residual — a hair ABOVE tol (BENCH_r03 reported
            # converged:false) — so the f64 true-residual outer loop pays
            # one emulated-f64 SpMV per restart to finish honestly.
            from gmres_tpu.precond.jacobi import JacobiPrecond

            Mj = JacobiPrecond(
                inv_diag=jnp.full(n_log, 1.0 / 6.0, jnp.float32))
            A_hi_g = as_operator(
                DiaMatrix(data=tuple(jnp.asarray(row, jnp.float64)
                                     for row in data_np),
                          offsets=A.offsets, shape=A.shape,
                          logical_n=A.logical_n),
                logical_shape=(n_log, n_log))
            bd64 = jnp.asarray(bg, jnp.float64)
            res, solve_s, iters = bench_gmres(jax, Aop_g, bd64, Mj, disp,
                                              A_hi=A_hi_g,
                                              work_dtype=jnp.float32)
            extra.update({
                "gmres_time_to_tol_s": solve_s,
                "gmres_iters": iters,
                "gmres_iters_per_s": iters / solve_s,
                "gmres_converged": bool(res.converged),
                "gmres_true_rel": true_rel(res.x),
                "gmres_n": n_log, "gmres_precond": "jacobi",
            })
        except Exception as e:  # noqa: BLE001
            extra["gmres_error"] = f"{type(e).__name__}: {e}"
        try:  # thermal 2.1M, AINV (block-Jacobi) — fewer iters, setup cost
            import scipy.sparse as sp

            from gmres_tpu.precond import make_preconditioner

            e1 = np.ones(nx)
            T3 = sp.diags([-e1[:-1], 2 * e1, -e1[:-1]], [-1, 0, 1])
            I3 = sp.eye(nx)
            S3 = (sp.kron(sp.kron(I3, I3), T3) + sp.kron(sp.kron(I3, T3), I3)
                  + sp.kron(sp.kron(T3, I3), I3)).tocsr()
            t0 = time.perf_counter()
            Ma = make_preconditioner("ainv", CSRMatrix.from_scipy(S3),
                                     dtype=jnp.float32, fmt="auto")
            setup_s = time.perf_counter() - t0
            res, solve_s, iters = bench_gmres(jax, Aop_g, bd, Ma, disp)
            extra.update({
                "gmres_ainv_time_to_tol_s": solve_s,
                "gmres_ainv_iters": iters,
                "gmres_ainv_setup_s": setup_s,
                "gmres_ainv_true_rel": true_rel(res.x),
                "gmres_ainv_converged": bool(res.converged),
            })
        except Exception as e:  # noqa: BLE001
            extra["gmres_ainv_error"] = f"{type(e).__name__}: {e}"
        try:  # thermal 2.1M, geometric multigrid ('-precond auto' picks
            # this on grid-structured grounded systems >=32K rows):
            # O(1)-in-n iteration counts where jacobi/AINV grow with nx
            import scipy.sparse as sp

            from gmres_tpu.precond import make_preconditioner

            e1 = np.ones(nx)
            T3 = sp.diags([-e1[:-1], 2 * e1, -e1[:-1]], [-1, 0, 1])
            I3 = sp.eye(nx)
            S3 = (sp.kron(sp.kron(I3, I3), T3) + sp.kron(sp.kron(I3, T3), I3)
                  + sp.kron(sp.kron(T3, I3), I3)).tocsr()
            t0 = time.perf_counter()
            Mm = make_preconditioner("mg", CSRMatrix.from_scipy(S3),
                                     dtype=jnp.float32, fmt="auto")
            setup_s = time.perf_counter() - t0
            res, solve_s, iters = bench_gmres(jax, Aop_g, bd, Mm, disp)
            extra.update({
                "gmres_mg_time_to_tol_s": solve_s,
                "gmres_mg_iters": iters,
                "gmres_mg_setup_s": setup_s,
                "gmres_mg_true_rel": true_rel(res.x),
                "gmres_mg_converged": bool(res.converged),
                "gmres_mg_precond": type(Mm).__name__,
            })
        except Exception as e:  # noqa: BLE001
            extra["gmres_mg_error"] = f"{type(e).__name__}: {e}"
        try:  # 100K natural-order PG on the hybrid router + the production
            # '-precond auto' choice (ainv: no zero diagonals here)
            from gmres_tpu.ops.spmv import device_matrix
            from gmres_tpu.precond import make_preconditioner

            Apg = build_pg_mna(rcm=False)
            Hpg = device_matrix(CSRMatrix.from_scipy(Apg),
                                dtype=jnp.float32)
            npg = Apg.shape[0]
            bpg = np.random.default_rng(8).standard_normal(npg)
            t0 = time.perf_counter()
            Mpg = make_preconditioner("ainv", CSRMatrix.from_scipy(Apg),
                                      dtype=jnp.float32, fmt="auto")
            setup_s = time.perf_counter() - t0
            Hpg_hi = device_operator(CSRMatrix.from_scipy(Apg),
                                     dtype=jnp.float64)
            res, solve_s, iters = bench_gmres(
                jax, as_operator(Hpg, logical_shape=(npg, npg)),
                jnp.asarray(bpg, jnp.float64), Mpg, disp,
                A_hi=Hpg_hi, work_dtype=jnp.float32)
            rtrue = float(np.linalg.norm(
                bpg - Apg @ np.asarray(res.x, np.float64))
                / np.linalg.norm(bpg))
            extra.update({
                "pg_gmres_time_to_tol_s": solve_s,
                "pg_gmres_iters": iters,
                "pg_gmres_iters_per_s": iters / solve_s,
                "pg_gmres_setup_s": setup_s,
                "pg_gmres_true_rel": rtrue,
                "pg_gmres_converged": bool(res.converged),
                "pg_gmres_variant": type(Hpg).__name__,
            })
        except Exception as e:  # noqa: BLE001
            extra["pg_gmres_error"] = f"{type(e).__name__}: {e}"

        print(json.dumps({
            "metric": "spmv_nnz_per_s_per_chip",
            "value": dia_nnz_per_s,
            "unit": "nnz/s",
            "vs_baseline": dia_nnz_per_s / BASELINE_NNZ_PER_S,
            **extra,
        }))
    except Exception as e:  # noqa: BLE001 — structured error, not a traceback
        print(json.dumps({
            "metric": "spmv_nnz_per_s_per_chip",
            "value": None,
            "unit": "nnz/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
            "trace": traceback.format_exc().splitlines()[-3:],
        }))
        sys.exit(0)


if __name__ == "__main__":
    main()
