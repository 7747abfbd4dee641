"""EMD cost on REALISTIC inputs (independent random clouds, slow
auction convergence) vs the trivial near-identical case, plus a split:
bid kernel alone vs per-round glue (sort + resolve scatters), and the
unassigned-count trajectory that drives the compaction ladder."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, reps=3):
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    from sparenet_tpu.ops.emd import emd_auction, _emd_batched
    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas

    rs = np.random.RandomState(0)
    B, n = 8, 16384
    x1 = jnp.asarray(rs.rand(B, n, 3), jnp.float32)
    x2 = jnp.asarray(rs.rand(B, n, 3), jnp.float32)

    f_easy = jax.jit(lambda a, b: jnp.sum(emd_auction(a, b, 0.005, 50)[0]))
    timed("EMD 50 rounds, near-identical clouds",
          lambda: f_easy(x2 + 1e-6, x2))
    timed("EMD 50 rounds, independent clouds",
          lambda: f_easy(x1, x2))

    # bid kernel alone at full width, 50 rounds (price evolves trivially)
    price0 = jnp.zeros((B, n), jnp.float32)

    @jax.jit
    def bids50(x1, x2, price):
        def body(p, _):
            tgt, inc = emd_bids_pallas(x1, x2, p)
            return p + 0.001 * inc.astype(p.dtype) * 0, jnp.sum(inc)
        p, s = jax.lax.scan(body, price, None, length=50)
        return jnp.sum(s)
    timed("bid kernel x50 (full width)", lambda: bids50(x1, x2, price0))

    # unassigned-count trajectory on independent clouds
    from sparenet_tpu.ops import emd as emd_mod
    counts = []
    for iters in (1, 2, 3, 5, 8, 12, 20, 30, 40, 50):
        d, a = emd_auction(x1, x2, 0.005, iters)
        # before the force-assign, unassigned = -1; the last round force-
        # assigns, so re-run with iters+0 and count assignments produced
        # by distinct targets instead: use inverse counting
        c = int(jnp.sum(a < 0))
        uniq = int(jnp.sum(jnp.zeros((B, n)).at[
            jnp.arange(B)[:, None], jnp.maximum(a, 0)].max(1.0)))
        counts.append((iters, c, B * n - uniq))
    print("iters -> (unassigned_after_force, duplicate_targets):")
    for it, c, dup in counts:
        print(f"  {it:3d}: {c:7d} {dup:7d}", flush=True)


if __name__ == "__main__":
    main()
