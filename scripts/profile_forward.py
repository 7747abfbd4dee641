"""Phase budget of the flagship SpareNet forward at bench settings
(B=32, 3000 -> 16384, bf16 matmul): encoder, decoder, expansion, MDS,
gather+residual refine, and the assembled forward.

Each phase is timed as its own jit with device-resident inputs and a
scalar output, async-dispatched and synced once (the tunnel adds ~40 ms
per host sync otherwise).
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


def timed(name, fn, reps=4):
    """float()-syncs every call: block_until_ready through the axon
    tunnel does not reliably wait, so each rep pays the ~40 ms transfer
    once; timings are comparable to each other, slightly inflated."""
    float(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()
    if not args.fp32:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.sparenet import SpareNetEncode, SpareNetDecode
    from sparenet_tpu.models.layers import PointNetRes
    from sparenet_tpu.ops.expansion_penalty import expansion_penalty
    from sparenet_tpu.ops.mds import minimum_density_sample, gather_points

    B = args.batch
    rs = np.random.RandomState(0)
    partial = jnp.asarray(rs.rand(B, 3000, 3) - 0.5, jnp.float32)
    coarse = jnp.asarray(rs.rand(B, 16384, 3) - 0.5, jnp.float32)
    mml = jnp.full((B,), 0.05, jnp.float32)

    # encoder
    enc = SpareNetEncode(use_selayer=True, encode="Residualnet",
                         train=False)
    ev = enc.init(jax.random.PRNGKey(0), partial)
    efwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x)))
    timed("encoder (EdgeConvRes + bottleneck)", lambda: efwd(ev, partial))

    # decoder
    style = jnp.asarray(rs.rand(B, 4096), jnp.float32)
    dec = SpareNetDecode(num_points=16384, n_primitives=32,
                         bottleneck_size=4096, use_adain="share",
                         use_selayer=True, train=False)
    dv = dec.init(jax.random.PRNGKey(0), style)
    dfwd = jax.jit(lambda v, s: jnp.sum(dec.apply(v, s)))
    timed("decoder (32-prim AdaIN folding)", lambda: dfwd(dv, style))

    # expansion penalty
    xfwd = jax.jit(lambda c: expansion_penalty(c, 32, 1.5)[0].sum() +
                   expansion_penalty(c, 32, 1.5)[2].sum())
    timed("expansion penalty (MST)", lambda: xfwd(coarse))

    # MDS at refine shape
    cat = jnp.concatenate([coarse, partial], axis=1)
    mfwd = jax.jit(lambda c: jnp.sum(
        minimum_density_sample(c, 16384, mml)))
    timed("MDS resample 16384-of-19384", lambda: mfwd(cat))

    # gather + residual refine
    res = PointNetRes(train=False)
    feat4 = jnp.concatenate(
        [cat[:, :16384], jnp.zeros((B, 16384, 1))], axis=-1)
    rv = res.init(jax.random.PRNGKey(0), feat4)
    rfwd = jax.jit(lambda v, f: jnp.sum(res.apply(v, f)))
    timed("residual refine (PointNetRes 16k)", lambda: rfwd(rv, feat4))

    # gather alone (XLA take_along_axis at refine shape)
    idx = jnp.asarray(rs.permutation(19384)[:16384][None].repeat(B, 0),
                      jnp.int32)
    cat4 = jnp.concatenate([cat, jnp.zeros((B, 19384, 1))], axis=-1)
    gfwd = jax.jit(lambda c, i: jnp.sum(gather_points(c, i)))
    timed("gather_points 16384-of-19384 x4ch", lambda: gfwd(cat4, idx))

    # whole refine block (expansion + concats + MDS + gather + residual)
    from sparenet_tpu.models.sparenet import SpareNetRefine
    ref = SpareNetRefine(num_points=16384, n_primitives=32,
                         use_selayer=True, train=False)
    refv = ref.init(jax.random.PRNGKey(0), coarse, partial)
    reffwd = jax.jit(
        lambda v, c, p: jnp.sum(ref.apply(v, c, p)[0]))
    timed("refine BLOCK (exp+MDS+gather+res)", lambda: reffwd(
        refv, coarse, partial))

    # assembled
    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, partial)
    ffwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x)[2]))
    t = timed("FULL forward", lambda: ffwd(mv, partial))
    print(f"-> {B / t:.1f} clouds/sec/chip", flush=True)


if __name__ == "__main__":
    main()
