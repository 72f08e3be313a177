"""A/B the hybrid-remainder SpMV strategies on device.

The hybrid router (ops/well.py to_hybrid) sends scattered entries (vias,
pad rows) to a COO segment-sum. MEASUREMENTS r2: gather-only 30 us,
+scatter 66 us at 4K nnz over a 100K vector — the fixed scatter latency
dominates the whole hybrid SpMV (DIA part: ~3.5 us). This probe measures,
as a function of remainder nnz:

  coo        — jax.ops.segment_sum (current production path)
  coo_sorted — segment_sum with indices_are_sorted=True (rows are sorted
               by construction in DeviceCOO built from CSR)
  at_add     — y.at[rows].add(v) scatter-add
  at_sorted  — same with indices_are_sorted (not unique: duplicates exist)
  ell_u      — unique-row ELL: (U,k) gather+row-sum, then a U-element
               unique scatter

Run: python benchmarks/remainder_ab.py [n] [nnz ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def slope_time(fn, x, n1=200, n2=600, reps=5):
    @jax.jit
    def chain(v, it):
        return lax.fori_loop(0, it, lambda i, u: fn(u) * 0.9 + v, x * 0)

    float(jnp.sum(chain(x, 8)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(jnp.sum(chain(x, n1))); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(chain(x, n2))); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
    nnzs = [int(v) for v in sys.argv[2:]] or [512, 4096, 16384]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    print(f"backend={jax.default_backend()} n={n}")
    for nnz in nnzs:
        rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
        cols = rng.integers(0, n, nnz).astype(np.int32)
        vals = rng.standard_normal(nnz).astype(np.float32)
        rj, cj, vj = map(jnp.asarray, (rows, cols, vals))

        def coo(v):
            return jax.ops.segment_sum(vj * v[cj], rj, num_segments=n)

        def coo_sorted(v):
            return jax.ops.segment_sum(vj * v[cj], rj, num_segments=n,
                                       indices_are_sorted=True)

        def at_add(v):
            return jnp.zeros_like(v).at[rj].add(vj * v[cj])

        def at_sorted(v):
            return jnp.zeros_like(v).at[rj].add(vj * v[cj],
                                                indices_are_sorted=True)

        # unique-row ELL: pad each distinct row to the max entries/row
        ur, inv, cnt = np.unique(rows, return_inverse=True, return_counts=True)
        k = int(cnt.max())
        slot = np.zeros(nnz, np.int64)
        seen = {}
        for t, r in enumerate(rows):
            slot[t] = seen.get(r, 0)
            seen[r] = slot[t] + 1
        ec = np.zeros((ur.size, k), np.int32)
        ev = np.zeros((ur.size, k), np.float32)
        ec[inv, slot] = cols
        ev[inv, slot] = vals
        urj, ecj, evj = map(jnp.asarray, (ur.astype(np.int32), ec, ev))

        def ell_u(v):
            contrib = jnp.sum(evj * v[ecj], axis=1)
            return jnp.zeros_like(v).at[urj].add(
                contrib, indices_are_sorted=True, unique_indices=True)

        # gather-only floor
        def gonly(v):
            return jnp.zeros_like(v).at[:nnz].set(vj * v[cj])

        ref = np.zeros(n)
        np.add.at(ref, rows, vals * np.asarray(x)[cols])
        out = {}
        for name, f in [("coo", coo), ("coo_sorted", coo_sorted),
                        ("at_add", at_add), ("at_sorted", at_sorted),
                        ("ell_u", ell_u), ("gather_only", gonly)]:
            if name != "gather_only":
                got = np.asarray(jax.jit(f)(x))
                err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
                assert err < 1e-4, (name, err)
            dt = slope_time(f, x)
            out[name] = dt
            print(f"  nnz={nnz:6d} {name:12s} {dt*1e6:8.1f} us "
                  f"{nnz/dt/1e9:7.2f} Gnnz/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
