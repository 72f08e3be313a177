"""Does the transient operator's preconditioner M_A = saddle(G + C/h, MG)
solve the DC system G x = b at 2.1M? (The C/h shift regularizes the MG
hierarchy — MG on pure G stagnates at rho~1 — and A is a 1e-4-relative
perturbation of G, so M_A should precondition G with at most a few outlier
modes for GMRES to kill.)"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    netlist = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/contest2m.sp"
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.models.dc import _chunked_gmres
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond.saddle import saddle

    t0 = time.time()
    mna = load_netlist(netlist)
    print(f"parse {time.time()-t0:.1f} s", flush=True)
    h = mna.tstep
    A = CSRMatrix.from_scipy(mna.G.to_scipy() + mna.C.to_scipy() / h)
    t0 = time.time()
    M = saddle(A, dtype=jnp.float32)
    print(f"saddle(A) setup {time.time()-t0:.1f} s; "
          f"Mg={type(M.Mg).__name__}", flush=True)

    Gop = device_operator(mna.G, dtype=jnp.float32)
    G_hi = device_operator(mna.G, dtype=jnp.float64)
    b = mna.dc_rhs()
    t0 = time.time()
    res = _chunked_gmres(Gop, jnp.asarray(b, jnp.float64), M, restart=50,
                         tol=1e-7, maxiter=20000, dispatch_iters=2000,
                         A_hi=G_hi, work_dtype=jnp.float32, verbose=True)
    print(f"DC-with-M_A {time.time()-t0:.1f} s: {int(res.iterations)} iters, "
          f"converged={bool(res.converged)}", flush=True)
    x = np.asarray(res.x, np.float64)
    r = b - mna.G.to_scipy() @ x
    print(f"true rel res {np.linalg.norm(r)/np.linalg.norm(b):.3e}; "
          f"v range [{x[:mna.num_nodes].min():.6f}, "
          f"{x[:mna.num_nodes].max():.6f}]", flush=True)


if __name__ == "__main__":
    main()
