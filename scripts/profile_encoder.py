"""Encoder (EdgeConvResFeat) phase profiling at bench scale (B=32,
N=3000): full encoder, kNN graphs alone, and full SpareNet forward."""

from __future__ import annotations

import argparse
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
    print(f"{name:40s} {min(ts)*1000:9.1f} ms  (first {t_first:.1f} s)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--distance-precision", default=None,
                    choices=["HIGHEST", "HIGH", "DEFAULT"],
                    help="override the pairwise-distance matmul precision")
    args = ap.parse_args()

    if args.bf16:
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    if args.distance_precision:
        from sparenet_tpu.ops import common
        common.set_distance_precision(args.distance_precision)

    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.ops.knn import knn_idx

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, args.n, 3) - 0.5, jnp.float32)

    enc = EdgeConvResFeat(use_selayer=True, train=False)
    vs = enc.init({"params": jax.random.PRNGKey(0)}, x)
    fwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x)))
    timed("encoder fwd", lambda: float(fwd(vs, x)))

    # kNN graphs at the 4 stage widths
    h = 4096
    widths = [3, h // 16, h // 16, h // 8]
    feats = [jnp.asarray(rs.rand(args.batch, args.n, c), jnp.float32)
             for c in widths]

    @jax.jit
    def knns(fs):
        return sum(jnp.sum(knn_idx(f, 8)) for f in fs)
    timed("4x kNN graphs alone", lambda: float(knns(feats)))

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, x)
    mfwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x)[2]))
    timed("full SpareNet fwd", lambda: float(mfwd(mv, x)))


if __name__ == "__main__":
    main()
