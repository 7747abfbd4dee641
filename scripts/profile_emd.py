"""Auction-EMD timing on TPU: full call, bid phase, resolve phase.

Usage: python scripts/profile_emd.py [--batch 8] [--n 16384] [--iters 50]
"""

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


def timed(name, fn, reps=3):
    t0 = time.perf_counter()
    fn()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1000:9.1f} ms  (first {t_first:.1f} s)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from sparenet_tpu.ops.emd import emd_auction, _resolve_round
    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas

    rs = np.random.RandomState(0)
    x1 = jnp.asarray(rs.rand(args.batch, args.n, 3), jnp.float32)
    x2 = jnp.asarray(rs.rand(args.batch, args.n, 3), jnp.float32)
    price = jnp.zeros((args.batch, args.n), jnp.float32)

    full = jax.jit(lambda a, b: jnp.sum(emd_auction(a, b, 0.005, args.iters)[0]))
    timed(f"emd_auction iters={args.iters}", lambda: float(full(x1, x2)))

    bids = jax.jit(lambda a, b, p: jnp.sum(emd_bids_pallas(a, b, p)[1]))
    timed("1x pallas bid round", lambda: float(bids(x1, x2, price)))

    @jax.jit
    def bids50(a, b, p):
        def body(pp, _):
            t, i = emd_bids_pallas(a, b, pp)
            return pp + 1e-6 * i, None
        pp, _ = jax.lax.scan(body, p, None, length=args.iters)
        return jnp.sum(pp)
    timed(f"{args.iters}x pallas bid rounds", lambda: float(bids50(x1, x2, price)))

    @jax.jit
    def resolve50(a0, ai0, p0, tgt, inc):
        def body(state, _):
            a, ai, pr = state
            a, ai, pr = jax.vmap(
                functools.partial(_resolve_round, args.n, last=False)
            )(a, ai, pr, tgt, inc)
            return (a, ai, pr), None
        state, _ = jax.lax.scan(body, (a0, ai0, p0), None, length=args.iters)
        return jnp.sum(state[2])
    a0 = jnp.full((args.batch, args.n), -1, jnp.int32)
    tgt = jnp.asarray(rs.randint(0, args.n, (args.batch, args.n)), jnp.int32)
    inc = jnp.asarray(rs.rand(args.batch, args.n), jnp.float32)
    timed(f"{args.iters}x resolve rounds",
          lambda: float(resolve50(a0, a0, price, tgt, inc)))

    d, asg = emd_auction(x1, x2, 0.005, args.iters)
    print("mean sqrt dist:", float(jnp.mean(jnp.sqrt(d))))

    # convergence curve: max-over-batch unassigned count per round
    from sparenet_tpu.ops.emd import _use_pallas_bids, _round_bids, \
        _resolve_round
    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas

    @jax.jit
    def curve(a, b):
        def round_fn(state, _):
            assignment, assignment_inv, price = state
            cnt = jnp.max(jnp.sum((assignment < 0).astype(jnp.int32), 1))
            tgt, raw_inc = emd_bids_pallas(a, b, price)
            inc = raw_inc + 0.005
            st = jax.vmap(functools.partial(_resolve_round, args.n,
                                            last=False))(
                assignment, assignment_inv, price, tgt, inc)
            return st, cnt
        state = (jnp.full((args.batch, args.n), -1, jnp.int32),
                 jnp.full((args.batch, args.n), -1, jnp.int32),
                 jnp.zeros((args.batch, args.n), jnp.float32))
        _, counts = jax.lax.scan(round_fn, state, None, length=args.iters)
        return counts
    counts = np.asarray(curve(x1, x2))
    print("max unassigned per round:", counts.tolist())


if __name__ == "__main__":
    main()
