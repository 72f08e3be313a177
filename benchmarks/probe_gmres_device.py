"""Interactive probe: GMRES time-to-tol arms on the real TPU, before wiring
them into bench.py. Prints per-arm timings + true-residual verification."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_dia_laplacian3d, build_pg_mna  # noqa: E402


def dispatch_cost(jax, jnp, reps=5):
    f = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros(8, jnp.float32)
    _ = float(jnp.sum(f(z)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(z)))
        best = min(best, time.perf_counter() - t0)
    return best


def run_arm(name, jax, jnp, Aop, bd, M, host_csr, b_np, tol, restart,
            maxiter, disp, reps=3):
    from gmres_tpu.solvers.gmres import gmres

    t0 = time.perf_counter()
    res = gmres(Aop, bd, restart=restart, tol=tol, maxiter=maxiter, M_left=M)
    it = int(res.iterations)
    conv = bool(res.converged)
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = gmres(Aop, bd, restart=restart, tol=tol, maxiter=maxiter,
                  M_left=M)
        _ = float(r.residual)
        best = min(best, time.perf_counter() - t0)
    solve = max(best - disp, 1e-9)
    x = np.asarray(res.x, np.float64)
    tr = np.linalg.norm(b_np - host_csr @ x) / np.linalg.norm(b_np)
    print(f"{name}: iters={it} conv={conv} solve={solve*1e3:.1f} ms "
          f"({it/solve:.0f} iters/s, {solve/max(it,1)*1e3:.2f} ms/iter) "
          f"true_rel={tr:.2e} [compile+first {tc:.1f} s]", flush=True)
    return solve, it, conv, tr


def main():
    which = set(sys.argv[1:]) or {"thermal", "pg"}
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.operator import as_operator
    from gmres_tpu.ops.spmv import device_matrix
    from gmres_tpu.precond import make_preconditioner
    from gmres_tpu.precond.jacobi import JacobiPrecond

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    disp = dispatch_cost(jax, jnp)
    print(f"dispatch cost: {disp*1e3:.1f} ms", flush=True)

    if "thermal" in which:
        nx = 128
        A, data_np, nnz = build_dia_laplacian3d(nx)
        n = nx ** 3
        Aop = as_operator(A, logical_shape=(n, n))
        rng = np.random.default_rng(0)
        b_np = rng.standard_normal(n)
        bd = jnp.asarray(b_np, jnp.float32)
        # host oracle CSR
        e = np.ones(nx)
        T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
        Ieye = sp.eye(nx)
        S = (sp.kron(sp.kron(Ieye, Ieye), T) + sp.kron(sp.kron(Ieye, T), Ieye)
             + sp.kron(sp.kron(T, Ieye), Ieye)).tocsr()
        Mj = JacobiPrecond(inv_diag=jnp.full(n, 1.0 / 6.0, jnp.float32))
        run_arm("thermal-2.1M jacobi", jax, jnp, Aop, bd, Mj, S, b_np,
                1e-6, 32, 2000, disp)
        t0 = time.perf_counter()
        Ma = make_preconditioner("ainv", CSRMatrix.from_scipy(S),
                                 dtype=jnp.float32, fmt="auto")
        print(f"ainv setup: {time.perf_counter()-t0:.1f} s", flush=True)
        run_arm("thermal-2.1M ainv  ", jax, jnp, Aop, bd, Ma, S, b_np,
                1e-6, 32, 2000, disp)

    if "pg" in which:
        An = build_pg_mna(rcm=False)
        n = An.shape[0]
        H = device_matrix(CSRMatrix.from_scipy(An), dtype=jnp.float32)
        print("pg device format:", type(H).__name__, flush=True)
        Aop = as_operator(H, logical_shape=(n, n))
        rng = np.random.default_rng(1)
        b_np = rng.standard_normal(n)
        bd = jnp.asarray(b_np, jnp.float32)
        Ac = CSRMatrix.from_scipy(An)
        for pname in ("ainv", "jacobi"):
            t0 = time.perf_counter()
            M = make_preconditioner(pname, Ac, dtype=jnp.float32, fmt="auto")
            st = time.perf_counter() - t0
            print(f"{pname} setup: {st:.1f} s", flush=True)
            run_arm(f"pg-100K {pname:6s}", jax, jnp, Aop, bd, M, An, b_np,
                    1e-6, 32, 4000, disp)
        # production ILUTP configuration: factor on the Ruiz+RCM ordering
        # (small fill, shallow levels), SpMV stays natural via the hooks
        from gmres_tpu.precond.milu import SystemTransform
        from gmres_tpu.solvers.gmres import gmres as _g

        t0 = time.perf_counter()
        tr = SystemTransform.build(Ac)
        M = make_preconditioner("ilutp", tr.mat(Ac), dtype=jnp.float32)
        st = time.perf_counter() - t0
        print(f"ilutp(+transform) setup: {st:.1f} s", flush=True)

        class HookedGmres:
            pass

        from gmres_tpu.solvers.gmres import gmres

        def timed():
            t0 = time.perf_counter()
            r = gmres(Aop, bd, restart=32, tol=1e-6, maxiter=4000,
                      M_left=tr.left_hook(M, jnp.float32),
                      M_right=tr.right_hook(jnp.float32))
            it = int(r.iterations)
            return r, it, time.perf_counter() - t0

        r, it, tc = timed()
        best = float("inf")
        for _ in range(3):
            _, _, dtm = timed()
            best = min(best, dtm)
        x = np.asarray(r.x, np.float64)
        trr = np.linalg.norm(b_np - An @ x) / np.linalg.norm(b_np)
        print(f"pg-100K ilutp+hooks: iters={it} conv={bool(r.converged)} "
              f"solve={(best-disp)*1e3:.1f} ms "
              f"({it/max(best-disp,1e-9):.0f} iters/s) true_rel={trr:.2e} "
              f"[compile+first {tc:.1f} s]", flush=True)


if __name__ == "__main__":
    main()
