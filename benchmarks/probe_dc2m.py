"""Flagship DC probe: 2.1M-row device GMRES DC under CLI conditions.

Reference contract: the GPU engine solves DC on the device before the time
loop (mna_solve_gpu_gmres.cpp:529-538). Round-3 attempts crashed the TPU
worker (unbounded dispatch + emulated-f64 Arnoldi); this drives the fixed
path: x64 process, f32 working dtype with GMRES-IR, saddle preconditioner,
wall-time-bounded dispatch chunks.

Usage: python benchmarks/probe_dc2m.py [netlist]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    netlist = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/contest2m.sp"
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.dc import dc_solve

    t0 = time.time()
    mna = load_netlist(netlist)
    print(f"parse {time.time()-t0:.1f} s: n={mna.G.shape[0]}", flush=True)

    t0 = time.time()
    x = dc_solve(mna, method="gmres", precond="saddle", dtype=jnp.float32,
                 tol=1e-7, verbose=True)
    dc_s = time.time() - t0
    # host f64 verification
    r = mna.dc_rhs() - mna.G.to_scipy() @ x
    rel = np.linalg.norm(r) / np.linalg.norm(mna.dc_rhs())
    vmax = x[: mna.num_nodes].max()
    vmin = x[: mna.num_nodes].min()
    print(f"DC {dc_s:.1f} s; true rel res {rel:.3e}; "
          f"voltage range [{vmin:.6f}, {vmax:.6f}]", flush=True)


if __name__ == "__main__":
    main()
