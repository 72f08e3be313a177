"""Preconditioner-strength experiment: iterations-to-1e-7 vs the ILU++
(multilevel ILUCDP with pivoting) class.

The reference builds ILU++ ILUCDP preconditioners with
threshold/MEM_FACTOR/MAX_LEVELS tuning (mna_solve_gpu_gmres.cpp:316-344);
this repo's substitute is SystemTransform (Ruiz + RCM) + ILU(k)
(precond/milu.py). This experiment measures whether that substitute reaches
ILUCDP-class iteration counts on hard PG-style matrices, with SciPy's
``spilu`` (SuperLU ILUTP: threshold + partial pivoting) as the
pivoting-ILU stand-in.

Hard cases:
  saddle  — 100K-node irregular-grid MNA with V-source branch rows (zero
            diagonals) and conductances spanning 6 decades
  pg      — 100K-node irregular PG conductance matrix (via stacks, RCM)
  unsym   — 512K-row 3-D convection-diffusion (strongly unsymmetric)

All counts from SciPy's f64 GMRES (restart=32, tol handled as
``|r| <= 1e-7 |b|``) so only preconditioner quality is measured — no device
dtype effects. Usage: python benchmarks/precond_strength.py [--cases ...]
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


# ---------------------------------------------------------------------------
# matrices
# ---------------------------------------------------------------------------

def pg_conductance(nx: int = 316, seed: int = 0, decades: float = 1.0,
                   ground: float = 1e-3):
    """Irregular power-grid conductance matrix (grid + vias), like
    bench.py's WELL workload; ``decades`` widens the conductance range."""
    rng = np.random.default_rng(seed)
    n = nx * nx
    i = np.arange(n)
    right = i[(i % nx) < nx - 1]
    down = i[i < n - nx]
    rows = np.concatenate([right, down])
    cols = np.concatenate([right + 1, down + nx])
    keep = rng.random(rows.shape[0]) > 0.08
    rows, cols = rows[keep], cols[keep]
    nv = n // 50
    vr = rng.integers(0, n, nv)
    vc = (vr + rng.integers(nx * 3, nx * 20, nv)) % n
    rows = np.concatenate([rows, vr])
    cols = np.concatenate([cols, vc])
    g = 10.0 ** rng.uniform(-decades / 2, decades / 2, rows.shape[0])
    G = sp.coo_matrix((-g, (rows, cols)), shape=(n, n))
    G = G + G.T
    d = -np.asarray(G.sum(axis=1)).ravel() + ground
    return (G + sp.diags(d)).tocsr()


def saddle_mna(nx: int = 316, nsrc: int = 64, seed: int = 1):
    """MNA saddle point: [[G, Bv], [Bv^T, 0]] — V-source branch rows have
    structurally zero diagonals; conductances span 6 decades. This is the
    matrix class where unpivoted ILU breaks (parser.cpp V-source stamping,
    SURVEY §2.1)."""
    G = pg_conductance(nx, seed=seed, decades=6.0, ground=1e-4)
    n = G.shape[0]
    rng = np.random.default_rng(seed + 1)
    nodes = rng.choice(n, nsrc, replace=False)
    Bv = sp.coo_matrix((np.ones(nsrc), (nodes, np.arange(nsrc))),
                       shape=(n, nsrc)).tocsr()
    Z = sp.csr_matrix((nsrc, nsrc))
    return sp.bmat([[G, Bv], [Bv.T, Z]], format="csr")


def unsym_convdiff(nx: int = 80, peclet: float = 20.0):
    """3-D convection-diffusion, upwinded convection — strongly unsymmetric
    (512K rows at nx=80)."""
    n = nx ** 3
    e = np.ones(nx)
    # 1-D: -u'' + p u' with first-order upwind
    D = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    C = sp.diags([-(1 + peclet / nx) * e[:-1], (1 + peclet / nx) * e[:-1]],
                 [-1, 1]) * 0.5
    I = sp.eye(nx)
    T = D + C
    A = (sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(T, I), I) + 0.05 * sp.eye(n))
    return A.tocsr()


CASES = {
    "saddle": saddle_mna,
    "pg": pg_conductance,
    "unsym": unsym_convdiff,
}


# ---------------------------------------------------------------------------
# preconditioner wrappers (host apply, iteration counting via scipy gmres)
# ---------------------------------------------------------------------------

def count_iters(A, M_op, tol=1e-7, restart=32, maxiter=4000, seed=0):
    n = A.shape[0]
    b = np.random.default_rng(seed).standard_normal(n)
    it = [0]

    def cb(_):
        it[0] += 1

    # callback_type="legacy": maxiter counts INNER iterations and the
    # callback fires once per inner iteration.
    x, info = spla.gmres(A, b, rtol=tol, atol=0.0, restart=restart,
                         maxiter=maxiter, M=M_op,
                         callback=cb, callback_type="legacy")
    rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    return it[0], rel, info


def milu_op(A_csr, k):
    """SystemTransform (Ruiz+RCM) + ILU(k): returns (transformed A, M)."""
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.precond.ilu import iluk_factor
    from gmres_tpu.precond.milu import SystemTransform

    Ac = CSRMatrix.from_scipy(A_csr)
    tr = SystemTransform.build(Ac)
    App = tr.mat(Ac)
    L, U = iluk_factor(App, k)
    Ls = L.to_scipy().tocsr()
    Us = U.to_scipy().tocsr()

    def apply(v):
        y = spla.spsolve_triangular(Ls, v, lower=True, unit_diagonal=True)
        return spla.spsolve_triangular(Us, y, lower=False)

    n = A_csr.shape[0]
    return App.to_scipy().tocsr(), spla.LinearOperator((n, n), matvec=apply)


def ainv_op(A_csr, drop=0.1):
    """SystemTransform + AINV (two SpMVs)."""
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.precond.ainv import ainv_factor
    from gmres_tpu.precond.milu import SystemTransform

    Ac = CSRMatrix.from_scipy(A_csr)
    tr = SystemTransform.build(Ac)
    App = tr.mat(Ac)
    n = A_csr.shape[0]
    block = 65536 if n > 131072 else 0
    Z, Wt, inv_d = ainv_factor(App, drop_tol=drop, block_size=block)
    Zs, Wts = Z.to_scipy().tocsr(), Wt.to_scipy().tocsr()

    def apply(v):
        return Zs @ (inv_d * (Wts @ v))

    return App.to_scipy().tocsr(), spla.LinearOperator((n, n), matvec=apply)


def ilutp_op(A_csr, drop=1e-4, fill=10.0, transformed=True):
    """SuperLU ILUTP (threshold + partial pivoting) — the ILU++/ILUCDP
    stand-in. Applied to the same transformed system for a fair count."""
    if transformed:
        from gmres_tpu.ops.formats import CSRMatrix
        from gmres_tpu.precond.milu import SystemTransform

        Ac = CSRMatrix.from_scipy(A_csr)
        tr = SystemTransform.build(Ac)
        S = tr.mat(Ac).to_scipy().tocsc()
    else:
        S = A_csr.tocsc()
    ilu = spla.spilu(S, drop_tol=drop, fill_factor=fill)
    n = A_csr.shape[0]
    return S.tocsr(), spla.LinearOperator((n, n), matvec=ilu.solve)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="saddle,pg,unsym")
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--skip", default="",
                    help="comma list of precond names to skip")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    preconds = {
        "milu_k1": lambda A: milu_op(A, 1),
        "milu_k2": lambda A: milu_op(A, 2),
        "milu_k3": lambda A: milu_op(A, 3),
        "ainv_tr": lambda A: ainv_op(A),
        "ilutp_1e-3": lambda A: ilutp_op(A, 1e-3, 5.0),
        "ilutp_1e-4": lambda A: ilutp_op(A, 1e-4, 10.0),
        "ilutp_1e-5": lambda A: ilutp_op(A, 1e-5, 20.0),
    }

    for case in args.cases.split(","):
        A = CASES[case]()
        print(f"\n== {case}: n={A.shape[0]}, nnz={A.nnz} ==", flush=True)
        for name, build in preconds.items():
            if name in skip:
                continue
            t0 = time.time()
            try:
                As, M = build(A)
                setup = time.time() - t0
                t0 = time.time()
                iters, rel, info = count_iters(As, M, tol=args.tol)
                print(f"{name:12s} iters={iters:6d} rel={rel:.2e} "
                      f"setup={setup:7.1f}s solve={time.time()-t0:6.1f}s "
                      f"info={info}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
