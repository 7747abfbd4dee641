"""Round-2 serving-mode perf pass: profile + candidate A/Bs.

Run with SPARENET_FAST_MATH=1 on the TPU (background, to natural
completion). Sections:

  1. serving-mode slope decomposition of the flagship forward
     (encoder / decoder / refine components) at B=32
  2. batched-MDS tuning: G in {1024, 2048, 4096}, top_k vs
     approx_min_k selection — time AND selection drift (gathered CD
     vs the exact greedy Pallas kernel) on REAL coarse clouds
  3. serving mean-MST-length estimator: per-primitive NN-mean * C vs
     the exact MST mml — value ratio, time, and the end-to-end effect
     on the MDS-gathered cloud
  4. end-to-end serving vs parity forward CD on the same weights
     (the total serving drift envelope)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert os.environ.get("SPARENET_FAST_MATH") == "1", "run with SPARENET_FAST_MATH=1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

R_HI = 4
B = int(os.environ.get("B", "32"))


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
    print(f"{name:52s} {per * 1000:8.1f} ms", flush=True)
    return per


def cd(a, b):
    from sparenet_tpu.ops.chamfer import chamfer_distance
    return float(jax.jit(chamfer_distance)(a, b))


def main():
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.sparenet import (
        SpareNetDecode, SpareNetEncode, SpareNetRefine)
    from sparenet_tpu.models.layers import PointNetRes
    from sparenet_tpu.ops.expansion_penalty import expansion_penalty
    from sparenet_tpu.ops.mds import (
        _mds_batched, gather_points, minimum_density_sample)
    from sparenet_tpu.ops import common as opc

    rs = np.random.RandomState(0)
    xs = [jnp.asarray(rs.rand(B, 3000, 3) - 0.5, jnp.float32)
          for _ in range(R_HI)]

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, xs[0])

    # REAL coarse/middle clouds for the refine-stage A/Bs
    @jax.jit
    def fwd_all(v, x):
        return model.apply(v, x)
    coarse, middle, refine0, _ = fwd_all(mv, xs[0])
    coarse = jax.block_until_ready(coarse)
    coarses = [coarse + 1e-4 * i for i in range(R_HI)]
    styles = [jnp.asarray(rs.rand(B, 4096), jnp.float32)
              for _ in range(R_HI)]

    print("== 1. serving-mode decomposition (B=%d) ==" % B, flush=True)

    def make_full(r):
        jf = jax.jit(lambda v, xl: sum(
            jnp.sum(model.apply(v, x)[2]) for x in xl))
        return lambda xl: jf(mv, xl)
    t_full = slope("FULL forward (serving)", make_full, xs)

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
    slope("decoder", make_dec, styles)

    ref = SpareNetRefine(num_points=16384, n_primitives=32,
                         use_selayer=True, train=False)
    refv = ref.init(jax.random.PRNGKey(0), coarses[0], xs[0])
    pairs = [(c, x) for c, x in zip(coarses, xs)]

    def make_ref(r):
        jf = jax.jit(lambda v, pl: sum(
            jnp.sum(ref.apply(v, c, p)[0]) for c, p in pl))
        return lambda pl: jf(refv, pl)
    slope("refine BLOCK", make_ref, pairs)

    def make_exp_mml(r):
        # mml output only (what serving eval actually consumes)
        jf = jax.jit(lambda cl: sum(
            jnp.sum(expansion_penalty(c, 512, 1.5)[2]) for c in cl))
        return jf
    slope("  expansion penalty (mml only)", make_exp_mml, coarses)

    cats = [jnp.concatenate([c, x], axis=1) for c, x in zip(coarses, xs)]
    _, _, mml_true = jax.jit(
        lambda c: expansion_penalty(c, 512, 1.5))(coarse)
    mml_true = jax.block_until_ready(mml_true)
    print("   true mml: mean %.5f  min %.5f  max %.5f"
          % (float(jnp.mean(mml_true)), float(jnp.min(mml_true)),
             float(jnp.max(mml_true))), flush=True)

    def make_mds(r):
        jf = jax.jit(lambda cl: sum(
            jnp.sum(minimum_density_sample(c, 16384, mml_true)) for c in cl))
        return jf
    slope("  MDS (current serving route)", make_mds, cats)

    idxp = jnp.asarray(rs.permutation(19384)[:16384][None].repeat(B, 0),
                       jnp.int32)
    cat4s = [jnp.concatenate([c, jnp.zeros((B, 19384, 1))], axis=-1)
             for c in cats]

    def make_gat(r):
        jf = jax.jit(lambda cl: sum(
            jnp.sum(gather_points(c, idxp)) for c in cl))
        return jf
    slope("  gather_points x4ch", make_gat, cat4s)

    res = PointNetRes(use_selayer=True, train=False)
    feat4s = [c[:, :16384] for c in cat4s]
    rv = res.init(jax.random.PRNGKey(0), feat4s[0])

    def make_res(r):
        jf = jax.jit(lambda v, fl: sum(jnp.sum(res.apply(v, f)) for f in fl))
        return lambda fl: jf(rv, fl)
    slope("  PointNetRes 16k", make_res, feat4s)

    # ---------------------------------------------------------------- 2.
    print("\n== 2. batched-MDS tuning (real clouds) ==", flush=True)
    cat = cats[0]

    idx_exact = jax.jit(lambda c, m: minimum_density_sample(
        c, 16384, m, impl="pallas"))(cat, mml_true)
    idx_exact = jax.block_until_ready(idx_exact)
    ref_cloud = jnp.take_along_axis(cat, idx_exact[..., None], axis=1)

    def drift(idx):
        got = jnp.take_along_axis(cat, idx[..., None], axis=1)
        ov = np.mean([len(set(np.asarray(idx[b]).tolist())
                          & set(np.asarray(idx_exact[b]).tolist())) / 16384
                      for b in range(min(B, 8))])
        return cd(got, ref_cloud), ov

    for g in (4096, 8192, 16383):
        t = slope("batched top_k G=%d" % g,
                  lambda r, g=g: jax.jit(lambda cl: sum(
                      jnp.sum(_mds_batched(c, 16384, mml_true, g=g))
                      for c in cl)), cats)
        d, ov = drift(_mds_batched(cat, 16384, mml_true, g=g))
        print("   G=%-5d CD vs exact %.2e  set overlap %.3f"
              % (g, d, ov), flush=True)

    # ---------------------------------------------------------------- 3.
    print("\n== 3. serving mml estimator (NN-mean) ==", flush=True)

    def nn_mean_mml(cloud, s=512):
        b, n, _ = cloud.shape
        prims = cloud.reshape(b * (n // s), s, 3)

        def one(p):
            d2 = (jnp.sum(p * p, -1)[:, None] + jnp.sum(p * p, -1)[None, :]
                  - 2.0 * jax.lax.dot_general(
                      p, p, (((1,), (1,)), ((), ())),
                      preferred_element_type=jnp.float32))
            d2 = d2 + jnp.eye(s, dtype=d2.dtype) * 1e9
            return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, -1), 0.0)))
        m = jax.vmap(one)(prims).reshape(b, n // s)
        return jnp.mean(m, -1)

    est = jax.jit(nn_mean_mml)(coarse)
    ratio = mml_true / est
    print("   mml/nn_mean ratio: mean %.4f  min %.4f  max %.4f  std %.4f"
          % (float(jnp.mean(ratio)), float(jnp.min(ratio)),
             float(jnp.max(ratio)), float(jnp.std(ratio))), flush=True)
    slope("nn_mean_mml", lambda r: jax.jit(lambda cl: sum(
        jnp.sum(nn_mean_mml(c)) for c in cl)), coarses)

    c_ratio = float(jnp.mean(ratio))
    mml_est = est * c_ratio
    idx_est = _mds_batched(cat, 16384, mml_true, g=1024)
    idx_est2 = _mds_batched(cat, 16384, mml_est, g=1024)
    got1 = jnp.take_along_axis(cat, idx_est[..., None], axis=1)
    got2 = jnp.take_along_axis(cat, idx_est2[..., None], axis=1)
    print("   batched-MDS CD(true mml vs est mml): %.2e  (vs exact: "
          "%.2e / %.2e)" % (cd(got1, got2), cd(got1, ref_cloud),
                            cd(got2, ref_cloud)), flush=True)

    # ---------------------------------------------------------------- 4.
    print("\n== 4. end-to-end serving vs parity CD ==", flush=True)
    refine_serving = fwd_all(mv, xs[0])[2]

    opc.set_fast_math(False)
    jax.config.update("jax_default_matmul_precision", "highest")

    @jax.jit
    def fwd_parity(v, x):
        return model.apply(v, x)[2]
    refine_parity = jax.block_until_ready(fwd_parity(mv, xs[0]))
    print("   CD(serving, parity) = %.3e" % cd(refine_serving, refine_parity),
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
