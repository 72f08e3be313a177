"""End-to-end GMRES benchmark: time-to-1e-6 relative residual on a 3D
thermal system (BASELINE.json's second headline metric) with each
preconditioner.

Usage: python benchmarks/gmres_bench.py [--nx 64] [--precond ainv,jacobi]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--precond", default="jacobi,ainv")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--restart", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond import make_preconditioner
    from gmres_tpu.solvers.gmres import gmres
    from gmres_tpu.utils.timing import Timer

    nx = args.nx
    n = nx ** 3
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nx)
    A = (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(T, I), I) + 0.05 * sp.eye(n)).tocsr()
    host = CSRMatrix.from_scipy(A)
    b = np.random.default_rng(0).standard_normal(n)
    print(f"n={n}, nnz={host.nnz}, backend={jax.default_backend()}, "
          f"tol={args.tol}, restart={args.restart}")

    Aop = device_operator(host, dtype=jnp.float32)
    bd = jnp.asarray(b, jnp.float32)

    for name in args.precond.split(","):
        t = Timer()
        t.start()
        M = make_preconditioner(name, host, dtype=jnp.float32, fmt="auto")
        setup = t.stop()
        # warm (compile)
        res = gmres(Aop, bd, restart=args.restart, tol=args.tol,
                    maxiter=20000, M_left=M)
        _ = float(res.residual)
        t2 = Timer()
        t2.start()
        res = gmres(Aop, bd, restart=args.restart, tol=args.tol,
                    maxiter=20000, M_left=M)
        it = int(res.iterations)
        conv = bool(res.converged)
        solve = t2.stop()
        r = b - host.matvec(np.asarray(res.x, np.float64))
        true_rel = np.linalg.norm(r) / np.linalg.norm(b)
        print(f"  {name:8s}: setup {setup:7.2f} s, solve {solve*1e3:8.1f} ms, "
              f"{it:5d} iters ({solve/max(it,1)*1e3:.2f} ms/iter), "
              f"converged={conv}, true rel resid={true_rel:.2e}")


if __name__ == "__main__":
    main()
