"""Preconditioners (L3): host-side setup, in-graph apply.

TPU redesign of the reference's ``Preconditioner`` hierarchy
(preconditioner.h:34-84: MyNONE/MyDIAG/MyILU0/MyILUK/MyILUPP/MyAINV with
HostPrecond/DevPrecond + split hooks). Here every preconditioner is:

  setup (host, NumPy/SciPy/native-C++)  ->  pytree state
  apply (pure jnp, jit/vmap/shard_map-safe)  ->  v |-> M^{-1} v

AINV is the first-class citizen on TPU (apply = two SpMVs + a diagonal
scale, no triangular solves) — the reference itself found AINV competitive
(TVLSI §V); ILU(0)/ILU(k) are provided for parity with level-scheduled or
Jacobi-sweep triangular solves.
"""

from gmres_tpu.precond.jacobi import JacobiPrecond, jacobi
from gmres_tpu.precond.ilu import IluPrecond, IlutpPrecond, ilu0, iluk, ilutp
from gmres_tpu.precond.ainv import AinvPrecond, ainv
from gmres_tpu.precond.mg import MgPrecond, mg
from gmres_tpu.precond.saddle import SaddlePrecond, saddle
from gmres_tpu.precond.trisolve import LevelTriSolve, tri_solve_levels

__all__ = [
    "JacobiPrecond", "jacobi",
    "IluPrecond", "IlutpPrecond", "ilu0", "iluk", "ilutp",
    "AinvPrecond", "ainv",
    "MgPrecond", "mg",
    "SaddlePrecond", "saddle",
    "LevelTriSolve", "tri_solve_levels",
    "make_preconditioner", "resolve_precond",
]


def resolve_precond(name: str, A) -> str:
    """Resolve ``"auto"`` to a concrete preconditioner for this matrix.

    Saddle-point MNA systems (V-source branch rows -> structurally zero
    diagonals) defeat unpivoted factorizations and AINV (measured r1-r2:
    AINV stalls, ILU(k) needs thousands of iterations); they go to the
    constraint-Schur preconditioner (precond/saddle.py: exact elimination
    of the branch rows over AINV on the grounded block — no triangular
    solves, no reordering). Grounded conductance/thermal systems go to
    plain AINV (cheapest device apply: two SpMVs, TVLSI §V's robustness
    pick). ILUTP remains available explicitly."""
    name = (name or "none").lower()
    if name != "auto":
        return name
    import numpy as np

    diag = A.diagonal() if hasattr(A, "diagonal") else None
    if diag is not None and np.any(np.asarray(diag) == 0.0):
        return "saddle"
    from gmres_tpu.precond.mg import infer_grid

    if A.shape[0] >= 32768 and infer_grid(A) is not None:
        # grid-structured grounded system at scale: the V-cycle bounds the
        # GMRES iteration count O(1) in n where AINV's grows with the grid
        # (measured: 189 -> 20 iters on 48^3 Poisson; the crossover cost
        # is the ~5-SpMV-equivalent cycle, so small systems keep AINV)
        return "mg"
    return "ainv"


def make_preconditioner(name: str, A, **kw):
    """Factory keyed by the reference's CLI/menu names (main2.cu:55-80:
    NONE/DIAG/ILU0/AINV; plus iluk/ilutp and "auto" — see
    :func:`resolve_precond`). Extra kwargs not understood by the selected
    builder are dropped (so callers can pass e.g. fmt='auto' uniformly)."""
    import inspect

    name = resolve_precond(name, A)
    if name in ("none", ""):
        return None
    builders = {
        "diag": jacobi, "jacobi": jacobi,
        "ilu0": ilu0, "iluk": iluk, "ainv": ainv, "mg": mg,
        "ilutp": ilutp, "ilupp": ilutp, "saddle": saddle,
    }
    if name not in builders:
        raise ValueError(f"unknown preconditioner {name!r}")
    fn = builders[name]
    params = inspect.signature(fn).parameters
    kw = {k: v for k, v in kw.items() if k in params}
    M = fn(A, **kw)
    if M is None and name == "mg":
        return ainv(A, **{k: v for k, v in kw.items()
                          if k in inspect.signature(ainv).parameters})
    return M
