"""Distributed GMRES scaling: nnz/s and iteration rate at 1..N shards
(BASELINE target: >=70% nnz/s scaling efficiency at N>=2).

On a CPU host this exercises the virtual device mesh (functional scaling);
on a pod slice it measures real ICI scaling. Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/dist_bench.py --nx 64 --shards 1,2,4,8
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=48)
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.parallel import DistGmresSolver, make_mesh

    nx = args.nx
    n = nx ** 3
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.eye(nx)
    A = (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(T, I), I) + 0.05 * sp.eye(n)).tocsr()
    host = CSRMatrix.from_scipy(A)
    b = np.random.default_rng(0).standard_normal(n)
    ndev_avail = len(jax.devices())
    print(f"n={n}, nnz={host.nnz}, devices={ndev_avail}, "
          f"backend={jax.default_backend()}")

    base_rate = None
    for ndev in [int(s) for s in args.shards.split(",")]:
        if ndev > ndev_avail:
            print(f"  {ndev} shards: skipped (only {ndev_avail} devices)")
            continue
        mesh = make_mesh(n_rows=ndev, n_batch=1)
        s = DistGmresSolver(A=host, mesh=mesh, precond="jacobi",
                            dtype=jnp.float32, restart=32, tol=args.tol,
                            maxiter=20000)
        r = s.solve(b)  # warm/compile
        t0 = time.perf_counter()
        r = s.solve(b)
        dt = time.perf_counter() - t0
        it = int(r.iterations)
        rate = host.nnz * it / dt
        eff = ""
        if base_rate is None:
            base_rate = rate / ndev
        else:
            eff = f", scaling eff {rate / (base_rate * ndev) * 100:5.1f}%"
        print(f"  {ndev} shards [{s.comm}]: {dt*1e3:8.1f} ms, {it} iters, "
              f"{rate/1e9:.2f} Gnnz/s{eff}, converged={bool(r.converged)}")


if __name__ == "__main__":
    main()
