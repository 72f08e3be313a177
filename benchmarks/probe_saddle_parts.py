"""Decompose the saddle-preconditioner apply cost at contest scale.

VERDICT r3 weak #2: the single number that decides whether the 2.1M DC is
feasible — the split of the measured 36.9 ms/iter saddle GMRES iteration
(vs jacobi's 2.97) into 2x Mg AINV applies vs COO coupling ops vs gathers
vs the S_inv matmul — never got measured because the round-3 probes (a)
baked ~300 MB of operator arrays into the jit closure (HTTP 413 at the
remote-compile relay) and (b) used spans below the 23 ms dispatch cost
(0.0 ms readings).

Both fixed here:
- every jitted chain takes the operator PYTREE AS AN ARGUMENT
  (MEASUREMENTS r1 rule: "pass matrices as jit arguments, never closures");
- slope timing between two chained iteration counts sized so the increment
  dwarfs the dispatch cost (benchmarks/timing.py recipe).

Usage:  python benchmarks/probe_saddle_parts.py [netlist] [out.log]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


@jax.jit
def _chain(op, v, it):
    # op is a pytree ARGUMENT: its arrays are device operands of the cached
    # program, not compile-time constants (no 300 MB program uploads).
    return lax.fori_loop(0, it, lambda i, u: op(u) * 0.9, v)


def chain_time(op, v, iters, reps=4):
    _ = float(jnp.sum(_chain(op, v, iters)))  # compile + warm
    best = np.inf
    for _r in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(_chain(op, v, iters)))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(op, v, n1=10, n2=None, target_span=0.5):
    t1 = chain_time(op, v, n1)
    np_ = n1 + 100
    tp = chain_time(op, v, np_, reps=2)
    per = max((tp - t1) / (np_ - n1), 1e-9)
    if n2 is None:
        n2 = int(min(max(np_, n1 + target_span / per), 20000))
    t2 = chain_time(op, v, n2)
    return max((t2 - t1) / (n2 - n1), 1e-12)


import dataclasses  # noqa: E402
from functools import partial  # noqa: E402


@partial(jax.tree_util.register_dataclass, data_fields=["inner"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Part:
    """Wrap an operator pytree as an (n)->(n) part under the chain harness."""

    inner: object

    def __call__(self, v):
        return self.inner(v)


@partial(jax.tree_util.register_dataclass,
         data_fields=["gg", "jg", "gs"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class GatherPart:
    """The saddle apply's index plumbing alone: two gathers + concat +
    scatter-gather back."""

    gg: jax.Array
    jg: jax.Array
    gs: jax.Array

    def __call__(self, v):
        return jnp.concatenate([v[self.gg], v[self.jg]])[self.gs]


@partial(jax.tree_util.register_dataclass,
         data_fields=["Agj", "Ajg", "S_inv"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ThinPart:
    """Coupling COO ops + dense Schur matmul, no Mg (ng)->(ng)."""

    Agj: object
    Ajg: object
    S_inv: jax.Array

    def __call__(self, u):
        return u - self.Agj(self.S_inv @ self.Ajg(u))


def main():
    netlist = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/contest2m.sp"
    from gmres_tpu.frontend.mna import load_netlist
    from gmres_tpu.ops.formats import CSRMatrix
    from gmres_tpu.ops.spmv import device_operator
    from gmres_tpu.precond.saddle import saddle

    t0 = time.time()
    mna = load_netlist(netlist)
    print(f"parse {time.time()-t0:.1f} s: n={mna.G.shape[0]}", flush=True)

    h = mna.tstep
    A = CSRMatrix.from_scipy(mna.G.to_scipy() + mna.C.to_scipy() / h)
    n = A.shape[0]
    t0 = time.time()
    M = saddle(A, dtype=jnp.float32)
    print(f"saddle setup {time.time()-t0:.1f} s; Mg={type(M.Mg).__name__}",
          flush=True)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ng = int(M.ng)
    vg = jnp.asarray(rng.standard_normal(ng).astype(np.float32))

    Aop = device_operator(A, dtype=jnp.float32)
    print(f"contiguous slice layout: {M.g_gather is None}; "
          f"single-Mg shortcut: {M.MgAgj is not None}", flush=True)

    Mg, Agj, Ajg, S_inv = M.Mg, M.Agj, M.Ajg, M.S_inv

    parts = {
        "A SpMV (jacobi-iter floor)": (Aop, v),
        "saddle full apply": (M, v),
        "Mg (AINV) apply": (Part(Mg), vg),
        "thin couple + S_inv (no Mg)": (ThinPart(Agj, Ajg, S_inv), vg),
    }
    if M.g_gather is not None:
        parts["gathers+concat+scatter only"] = (
            GatherPart(M.g_gather, M.j_gather, M.g_scatter), v)
    if hasattr(Mg, "Z"):
        from gmres_tpu.ops.operator import as_operator

        Zop = as_operator(Mg.Z, logical_shape=(ng, ng))
        Wtop = as_operator(Mg.Wt, logical_shape=(ng, ng))
        parts["Mg Z SpMV only"] = (Part(Zop), vg)
        parts["Mg Wt SpMV only"] = (Part(Wtop), vg)

    for name, (op, x) in parts.items():
        dt = slope(op, x)
        print(f"{name:32s}: {dt*1e3:8.3f} ms/apply", flush=True)

    # Pallas-vs-XLA A/B on the AINV factor's dense 18-diagonal DIA: the
    # XLA path re-reads the x vector once per diagonal; the Pallas kernel
    # keeps x VMEM-resident (the 7-diag flagship favored XLA 248-vs-167,
    # MEASUREMENTS — check whether the tradeoff flips at 18 diagonals).
    import os

    if hasattr(Mg, "Z") and hasattr(Mg.Z, "offsets"):
        from gmres_tpu.ops.operator import as_operator

        Zop = as_operator(Mg.Z, logical_shape=(ng, ng))
        for flag in ("0", "1"):
            os.environ["GMRES_TPU_PALLAS"] = flag
            jax.clear_caches()
            try:
                dt = slope(Zop, vg)
                nnzZ = int(sum(np.count_nonzero(np.asarray(r)) for r in Mg.Z.data))
                print(f"Z SpMV pallas={flag}: {dt*1e3:.3f} ms "
                      f"({nnzZ/dt/1e9:.1f} Gnnz/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"Z SpMV pallas={flag}: FAILED {type(e).__name__}: {e}",
                      flush=True)
        os.environ["GMRES_TPU_PALLAS"] = "0"


if __name__ == "__main__":
    main()
