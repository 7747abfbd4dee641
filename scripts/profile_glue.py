"""Self-consistent slope-timed decomposition of the flagship forward.

Times (all in ONE process, same method): the full forward, each
top-level stage (encoder / decoder / refine block), and the refine
block's own components. Reports the unaccounted glue at both levels:

  glue_top    = full - (encoder + decoder + 2*refine_block)
  glue_refine = refine_block - (expansion + MDS + gather + residual)

Slope method: R reps on R different inputs in one jit, (t4-t1)/3.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

R_HI = 4


def slope(name, build, inputs, reps=3):
    f1, fh = build(1), build(R_HI)
    float(f1(inputs[:1]))
    float(fh(inputs[:R_HI]))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(inputs[:1]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(inputs[:R_HI]))
        ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:44s} {per * 1000:8.1f} ms", flush=True)
    return per


def main():
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.sparenet import (
        SpareNetDecode, SpareNetEncode, SpareNetRefine)
    from sparenet_tpu.models.layers import PointNetRes
    from sparenet_tpu.ops.expansion_penalty import expansion_penalty
    from sparenet_tpu.ops.mds import gather_points, minimum_density_sample

    B = int(os.environ.get("B", "32"))
    rs = np.random.RandomState(0)
    xs = [jnp.asarray(rs.rand(B, 3000, 3) - 0.5, jnp.float32)
          for _ in range(R_HI)]
    coarses = [jnp.asarray(rs.rand(B, 16384, 3) - 0.5, jnp.float32)
               for _ in range(R_HI)]
    styles = [jnp.asarray(rs.rand(B, 4096), jnp.float32)
              for _ in range(R_HI)]

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, xs[0])

    def make_full(r):
        jf = jax.jit(lambda v, xl: sum(
            jnp.sum(model.apply(v, x)[2]) for x in xl))
        return lambda xl: jf(mv, xl)
    t_full = slope("FULL forward", make_full, xs)

    enc = SpareNetEncode(bottleneck_size=4096, hide_size=4096,
                         use_selayer=True, encode="Residualnet", train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])

    def make_enc(r):
        jf = jax.jit(lambda v, xl: sum(jnp.sum(enc.apply(v, x)) for x in xl))
        return lambda xl: jf(ev, xl)
    t_enc = slope("encoder (incl bottleneck)", make_enc, xs)

    dec = SpareNetDecode(num_points=16384, n_primitives=32,
                         bottleneck_size=4096, use_adain="share",
                         use_selayer=True, train=False)
    dv = dec.init({"params": jax.random.PRNGKey(0)}, styles[0])

    def make_dec(r):
        jf = jax.jit(lambda v, sl: sum(jnp.sum(dec.apply(v, s)) for s in sl))
        return lambda sl: jf(dv, sl)
    t_dec = slope("decoder", make_dec, styles)

    ref = SpareNetRefine(num_points=16384, n_primitives=32,
                         use_selayer=True, train=False)
    refv = ref.init(jax.random.PRNGKey(0), coarses[0], xs[0])
    pairs = [(c, x) for c, x in zip(coarses, xs)]

    def make_ref(r):
        jf = jax.jit(lambda v, pl: sum(
            jnp.sum(ref.apply(v, c, p)[0]) for c, p in pl))
        return lambda pl: jf(refv, pl)
    t_ref = slope("refine BLOCK", make_ref, pairs)

    def make_exp(r):
        jf = jax.jit(lambda cl: sum(
            jnp.sum(expansion_penalty(c, 512, 1.5)[0]) +
            jnp.sum(expansion_penalty(c, 512, 1.5)[2]) for c in cl))
        return jf
    t_exp = slope("  expansion penalty", make_exp, coarses)

    cats = [jnp.concatenate([c, x], axis=1) for c, x in zip(coarses, xs)]
    mml = jnp.full((B,), 0.05, jnp.float32)

    def make_mds(r):
        jf = jax.jit(lambda cl: sum(
            jnp.sum(minimum_density_sample(c, 16384, mml)) for c in cl))
        return jf
    t_mds = slope("  MDS 16384-of-19384", make_mds, cats)

    idx = jnp.asarray(rs.permutation(19384)[:16384][None].repeat(B, 0),
                      jnp.int32)
    cat4s = [jnp.concatenate([c, jnp.zeros((B, 19384, 1))], axis=-1)
             for c in cats]

    def make_gat(r):
        jf = jax.jit(lambda cl: sum(
            jnp.sum(gather_points(c, idx)) for c in cl))
        return jf
    t_gat = slope("  gather_points x4ch", make_gat, cat4s)

    res = PointNetRes(use_selayer=True, train=False)
    feat4s = [c[:, :16384] for c in cat4s]
    rv = res.init(jax.random.PRNGKey(0), feat4s[0])

    def make_res(r):
        jf = jax.jit(lambda v, fl: sum(jnp.sum(res.apply(v, f)) for f in fl))
        return lambda fl: jf(rv, fl)
    t_res = slope("  PointNetRes 16k", make_res, feat4s)

    comp = t_exp + t_mds + t_gat + t_res
    print(f"\nrefine block {t_ref*1e3:.1f} vs components {comp*1e3:.1f} "
          f"-> refine glue {(t_ref-comp)*1e3:.1f} ms")
    top = t_enc + t_dec + 2 * t_ref
    print(f"full {t_full*1e3:.1f} vs enc+dec+2*refine {top*1e3:.1f} "
          f"-> top glue {(t_full-top)*1e3:.1f} ms")
    print(f"-> {B / t_full:.1f} clouds/sec/chip (slope)")


if __name__ == "__main__":
    main()
