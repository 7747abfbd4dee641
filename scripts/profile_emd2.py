"""EMD round-phase experiments: resolve-phase scatter variants and bid
kernel alternatives."""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, fn, reps=3):
    t0 = time.perf_counter()
    r0 = fn()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1000:9.1f} ms  (first {t_first:.1f} s)",
          flush=True)
    return r0


# ----------------------------------------------------------------------
# resolve variants
# ----------------------------------------------------------------------

def resolve_flat(n, b, assignment, assignment_inv, price, target, inc):
    """Flat-index resolve: one scatter over [B*(n+1)] per primitive."""
    sentinel = jnp.int32(n)
    unass = assignment < 0
    rows = jnp.arange(b, dtype=jnp.int32)[:, None] * (n + 1)
    t = jnp.where(unass, target, sentinel)
    tf = (t + rows).reshape(-1)

    max_inc = jnp.full((b * (n + 1),), -jnp.inf, inc.dtype).at[tf].max(
        jnp.where(unass, inc, -jnp.inf).reshape(-1)
    ).reshape(b, n + 1)
    eligible = unass & (inc >= jnp.take_along_axis(max_inc, t, 1) - 1e-6)
    ef = jnp.where(eligible, t, sentinel) + rows
    bidder = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    winner = jnp.full((b * (n + 1),), sentinel, jnp.int32).at[
        ef.reshape(-1)
    ].min(bidder.reshape(-1)).reshape(b, n + 1)[:, :n]
    has_winner = winner < sentinel

    old = jnp.where(has_winner, assignment_inv, -1)
    oldf = (jnp.where(old >= 0, old, sentinel) + rows).reshape(-1)
    af = assignment.reshape(-1)
    a = jnp.pad(assignment, ((0, 0), (0, 1))).reshape(-1).at[oldf].set(
        -1, mode="drop").reshape(b, n + 1)[:, :n]
    obj = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    winc = jnp.where(has_winner,
                     jnp.take_along_axis(inc, jnp.where(has_winner, winner, 0), 1),
                     0.0)
    wf = (jnp.where(has_winner, winner, sentinel) + rows).reshape(-1)
    a = jnp.pad(a, ((0, 0), (0, 1))).reshape(-1).at[wf].set(
        obj.reshape(-1), mode="drop").reshape(b, n + 1)[:, :n]
    ai = jnp.where(has_winner, winner, assignment_inv)
    pr = price + winc
    return a, ai, pr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    b, n, iters = args.batch, args.n, args.iters

    from sparenet_tpu.ops.emd import _resolve_round

    rs = np.random.RandomState(0)
    price = jnp.zeros((b, n), jnp.float32)
    a0 = jnp.full((b, n), -1, jnp.int32)
    tgt = jnp.asarray(rs.randint(0, n, (b, n)), jnp.int32)
    inc = jnp.asarray(rs.rand(b, n), jnp.float32)

    @jax.jit
    def res_vmap(a0, ai0, p0, tgt, inc):
        def body(state, _):
            a, ai, pr = jax.vmap(functools.partial(_resolve_round, n, last=False))(
                *state, tgt, inc)
            return (a, ai, pr), None
        state, _ = jax.lax.scan(body, (a0, ai0, p0), None, length=iters)
        return jnp.sum(state[2]) + jnp.sum(state[0])

    @jax.jit
    def res_flat(a0, ai0, p0, tgt, inc):
        def body(state, _):
            a, ai, pr = resolve_flat(n, b, *state, tgt, inc)
            return (a, ai, pr), None
        state, _ = jax.lax.scan(body, (a0, ai0, p0), None, length=iters)
        return jnp.sum(state[2]) + jnp.sum(state[0])

    r1 = timed(f"{iters}x resolve (vmapped)",
               lambda: float(res_vmap(a0, a0, price, tgt, inc)))
    r2 = timed(f"{iters}x resolve (flat-index)",
               lambda: float(res_flat(a0, a0, price, tgt, inc)))
    print("checksums:", r1, r2)


if __name__ == "__main__":
    main()
