"""Realistic-workload fixture generators.

The reference was validated on IBM TAU P/G contest netlists and
MATLAB-exported GCB thermal directories (docs/memo.txt:18-24,
src_thermal/parserGCB.m:1-44) — neither shipped. These generators produce
structurally equivalent fixtures at arbitrary scale:

- :func:`write_pg_netlist` — an IBM-PG-contest-style flat netlist: a metal
  grid plane per layer (resistor mesh with process variation), VDD pad
  cells (V sources) feeding the top layer through pad resistances, via
  arrays between layers, PWL switching-current loads and decap cells on
  the bottom layer, ``.tran``/``.print`` cards. 1M+ nodes in a few seconds
  (vectorized f-string assembly).
- :func:`write_gcb_dir` — a 3D-IC thermal GCB directory (A = G + C/h, B,
  C, u_vec, t_step as .mtx triplets, parserGCB.m layout): finite-difference
  cube with a heated power map on the bottom face.

CLI: ``python -m gmres_tpu.frontend.fixtures pg out.sp --nx 1024``
     ``python -m gmres_tpu.frontend.fixtures gcb outdir --nx 32``
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["write_pg_netlist", "write_gcb_dir"]


def write_pg_netlist(
    path: str,
    nx: int = 1024,
    ny: int = 0,
    layers: int = 2,
    vdd: float = 1.8,
    pad_pitch: int = 64,
    via_pitch: int = 4,
    load_fraction: float = 0.1,
    tstep: float = 5e-12,
    tstop: float = 5e-9,
    nports: int = 8,
    seed: int = 0,
) -> dict:
    """Write an IBM-PG-contest-scale flat SPICE netlist; returns stats.

    Grid topology (per contest convention): ``layers`` stacked nx x ny
    metal planes; plane L nodes are ``nL_i_j``. Horizontal/vertical
    segment resistances draw from a lognormal around 40 mΩ (upper planes
    thicker -> lower R). Vias connect vertically every ``via_pitch`` nodes
    (5 mΩ). VDD pads (V sources + 2 mΩ pad R) sit on the TOP plane every
    ``pad_pitch`` nodes; PWL current loads + 50 fF decaps populate a
    random ``load_fraction`` of BOTTOM-plane nodes.
    """
    ny = ny or nx
    rng = np.random.default_rng(seed)
    lines = [f"* synthetic IBM-PG-contest-class grid {nx}x{ny}x{layers}"]

    def node(L, i, j):
        return f"n{L}_{i}_{j}"

    nR = 0
    for L in range(layers):
        r_base = 0.04 / (1 + L)  # upper layers thicker
        i = np.repeat(np.arange(nx), ny).reshape(nx, ny)
        j = np.tile(np.arange(ny), nx).reshape(nx, ny)
        # horizontal segments (i, j) - (i, j+1)
        rh = r_base * rng.lognormal(0.0, 0.2, (nx, ny - 1))
        lines.extend(
            f"RH{L}_{a}_{b} n{L}_{a}_{b} n{L}_{a}_{b+1} {rh[a, b]:.5f}"
            for a in range(nx) for b in range(ny - 1)
        )
        nR += nx * (ny - 1)
        # vertical segments (i, j) - (i+1, j)
        rv = r_base * rng.lognormal(0.0, 0.2, (nx - 1, ny))
        lines.extend(
            f"RV{L}_{a}_{b} n{L}_{a}_{b} n{L}_{a+1}_{b} {rv[a, b]:.5f}"
            for a in range(nx - 1) for b in range(ny)
        )
        nR += (nx - 1) * ny
        if L + 1 < layers:
            ii = np.arange(0, nx, via_pitch)
            jj = np.arange(0, ny, via_pitch)
            lines.extend(
                f"RX{L}_{a}_{b} n{L}_{a}_{b} n{L+1}_{a}_{b} 0.005"
                for a in ii for b in jj
            )
            nR += len(ii) * len(jj)

    top = layers - 1
    npads = 0
    for a in range(pad_pitch // 2, nx, pad_pitch):
        for b in range(pad_pitch // 2, ny, pad_pitch):
            lines.append(f"Vp{npads} vp{npads} 0 DC {vdd}")
            lines.append(f"Rp{npads} vp{npads} n{top}_{a}_{b} 0.002")
            npads += 1

    # PWL switching loads + decaps on the bottom plane
    n_load = int(load_fraction * nx * ny)
    li = rng.integers(0, nx, n_load)
    lj = rng.integers(0, ny, n_load)
    amp = rng.uniform(1e-5, 3e-3, n_load)
    t0 = rng.uniform(0, 0.5 * tstop, n_load)
    tr = rng.uniform(2, 10, n_load) * tstep
    dur = rng.uniform(5, 50, n_load) * tstep
    for k in range(n_load):
        a, b = li[k], lj[k]
        if k % 4 == 0:
            # leakage/static draw: DC loads make the DC operating point
            # carry real IR drop (contest netlists mix DC and switching)
            lines.append(f"IL{k} n0_{a}_{b} 0 DC {0.1 * amp[k]:.4g}")
        else:
            t1, t2, t3 = t0[k], t0[k] + tr[k], t0[k] + tr[k] + dur[k]
            t4 = t3 + tr[k]
            lines.append(
                f"IL{k} n0_{a}_{b} 0 PWL(0 0 {t1:.4g} 0 {t2:.4g} "
                f"{amp[k]:.4g} {t3:.4g} {amp[k]:.4g} {t4:.4g} 0 "
                f"{tstop:.4g} 0)"
            )
        lines.append(f"CD{k} n0_{a}_{b} 0 50f")

    lines.append(f".tran {tstep:.4g} {tstop:.4g}")
    pi = rng.integers(0, nx, nports)
    pj = rng.integers(0, ny, nports)
    lines.append(".print " + " ".join(
        f"v(n0_{a}_{b})" for a, b in zip(pi, pj)))
    lines.append(".end")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {
        "nodes": nx * ny * layers + npads,
        "resistors": nR + npads,
        "vsources": npads,
        "loads": n_load,
        "lines": len(lines),
        "bytes": os.path.getsize(path),
    }


def write_gcb_dir(
    directory: str,
    nx: int = 32,
    ny: int = 0,
    nz: int = 8,
    steps: int = 64,
    t_step: float = 1e-3,
    n_sources: int = 16,
    seed: int = 0,
) -> dict:
    """Write a GCB thermal directory (A/B/C/u_vec/t_step .mtx) like
    parserGCB.m: A = G + C/h of a 3-D FD thermal cube with convection to
    ambient on the top face; B selects ``n_sources`` bottom-face power
    injection sites; u_vec holds stepwise power waveforms."""
    import scipy.sparse as sp

    from gmres_tpu.frontend.gcb import write_mtx, write_uvec
    from gmres_tpu.ops.formats import CSRMatrix

    ny = ny or nx
    n = nx * ny * nz
    rng = np.random.default_rng(seed)
    ex, ey, ez = np.ones(nx), np.ones(ny), np.ones(nz)
    Tx = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1])
    Ty = sp.diags([-ey[:-1], 2 * ey, -ey[:-1]], [-1, 0, 1])
    Tz = sp.diags([-ez[:-1], 2 * ez, -ez[:-1]], [-1, 0, 1])
    Ix, Iy, Iz = sp.eye(nx), sp.eye(ny), sp.eye(nz)
    # conductance ~ silicon thermal grid; z-axis anisotropy (layer stack)
    G = (sp.kron(sp.kron(Iz, Iy), Tx) + sp.kron(sp.kron(Iz, Ty), Ix)
         + 0.3 * sp.kron(sp.kron(Tz, Iy), Ix)).tocsr()
    # top-face convection to ambient (adds to the diagonal)
    conv = np.zeros(n)
    conv[n - nx * ny:] = 0.05
    G = (G + sp.diags(conv)).tocsr() * 1e-1
    # heat capacity per cell with material variation
    cdiag = rng.uniform(0.8, 1.2, n) * 1e-4
    C = sp.diags(cdiag).tocsr()
    A = (G + C / t_step).tocsr()

    bottom = rng.choice(nx * ny, n_sources, replace=False)
    B = sp.coo_matrix(
        (np.ones(n_sources), (bottom, np.arange(n_sources))),
        shape=(n, n_sources),
    ).tocsr()
    # stepwise power waveforms (workload phases)
    U = np.repeat(
        rng.uniform(0.0, 2.0, (-(-steps // 8), n_sources)),
        8, axis=0,
    )[:steps]

    os.makedirs(directory, exist_ok=True)
    write_mtx(os.path.join(directory, "A.mtx"), CSRMatrix.from_scipy(A))
    write_mtx(os.path.join(directory, "B.mtx"), CSRMatrix.from_scipy(B))
    write_mtx(os.path.join(directory, "C.mtx"), CSRMatrix.from_scipy(C))
    # parserGCB.m layout: u_vec rows = inputs, columns = time steps
    write_uvec(os.path.join(directory, "u_vec.mtx"), U.T)
    with open(os.path.join(directory, "t_step.mtx"), "w") as f:
        f.write(f"{t_step:.9g}\n")
    return {"n": n, "nnz_A": int(A.nnz), "steps": int(U.shape[0]),
            "sources": n_sources}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="kind", required=True)
    p1 = sub.add_parser("pg")
    p1.add_argument("path")
    p1.add_argument("--nx", type=int, default=1024)
    p1.add_argument("--layers", type=int, default=2)
    p1.add_argument("--seed", type=int, default=0)
    p2 = sub.add_parser("gcb")
    p2.add_argument("path")
    p2.add_argument("--nx", type=int, default=32)
    p2.add_argument("--nz", type=int, default=8)
    p2.add_argument("--steps", type=int, default=64)
    args = ap.parse_args(argv)
    if args.kind == "pg":
        stats = write_pg_netlist(args.path, nx=args.nx, layers=args.layers,
                                 seed=args.seed)
    else:
        stats = write_gcb_dir(args.path, nx=args.nx, nz=args.nz,
                              steps=args.steps)
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
