"""Renderer phase profiling: full fwd, bucket prep alone, splat kernel
alone, and backward, at GAN production scale (B=8, 8 views, 256^2, r=10).
"""

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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--radius", type=float, default=10.0)
    args = ap.parse_args()

    from sparenet_tpu.renderer import ComputeDepthMaps
    from sparenet_tpu.ops.pallas import p2i_pallas as pp

    rdr = ComputeDepthMaps(image_size=args.img)
    rs = np.random.RandomState(0)
    cloud = jnp.asarray(rs.rand(args.batch, args.n, 3) - 0.5, jnp.float32)
    radius = float(args.radius)

    fwd = jax.jit(lambda c: jnp.sum(rdr.render_all_views(c, [radius])))
    timed("render_all_views fwd", lambda: float(fwd(cloud)))

    def bwd_fn(c):
        return jnp.sum(rdr.render_all_views(c, [radius]) ** 2)
    bwd = jax.jit(lambda c: jnp.sum(jax.grad(bwd_fn)(c)))
    timed("render_all_views fwd+bwd", lambda: float(bwd(cloud)))

    # isolate prep vs kernel
    b, n, _ = cloud.shape
    v = rdr.num_views
    pix, feat = jax.vmap(lambda m: rdr._project(cloud, m))(rdr.matrices)
    binds = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    binds = (binds[None, :] * v + jnp.arange(v, dtype=jnp.int32)[:, None])
    points = pix.reshape(-1, 2)
    feats = feat.reshape(-1, 1)
    binds = binds.reshape(-1)
    nimg = b * v
    h = w = args.img

    prep = jax.jit(lambda p, f, bi: jax.tree_util.tree_map(
        jnp.sum, pp._prep_grouped(p, f, bi, radius, nimg, h, w)[:2]))
    timed("_prep_buckets alone",
          lambda: jax.block_until_ready(prep(points, feats, binds)) and None
          or float(prep(points, feats, binds)[0]))

    full_kernel = jax.jit(lambda p, f, bi: jnp.sum(
        pp.p2i_max_pallas(p, f, bi, radius, nimg, h, w)[0]))
    timed("prep + kernel (p2i_max_pallas)",
          lambda: float(full_kernel(points, feats, binds)))

    # prep outside, kernel inside jit: measures kernel + tile reshape
    prepped = jax.jit(
        lambda p, f, bi: pp._prep_grouped(p, f, bi, radius, nimg, h, w)[:2]
    )(points, feats, binds)
    prepped = jax.block_until_ready(prepped)

    projection = jax.jit(lambda c: jax.tree_util.tree_map(
        jnp.sum, jax.vmap(lambda m: rdr._project(c, m))(rdr.matrices)))
    timed("projection alone", lambda: float(projection(cloud)[0]))


if __name__ == "__main__":
    main()
