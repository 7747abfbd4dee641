"""p2i splat kernel variant micro-bench (prepped inputs, kernel only).

Variants: chunk size, vec width, per-tile vs per-image output blocks,
transcendental ablation.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH, _TW = 32, 128


def make_inputs(b, n, h, w, radius, chunk):
    """Grouped counting-sort prep at the given chunk size (mirrors
    p2i_pallas._prep_grouped but parameterized)."""
    from sparenet_tpu.ops.pallas import p2i_pallas as pp
    rs = np.random.RandomState(0)
    p = b * n
    points = jnp.asarray(
        np.stack([rs.rand(p) * h, rs.rand(p) * w], -1), jnp.float32)
    feats = jnp.asarray(rs.rand(p, 1) + 0.1, jnp.float32)
    binds = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)

    old_chunk = pp._CHUNK
    pp._CHUNK = chunk
    try:
        out = jax.jit(
            lambda pt, f, bi: pp._prep_grouped(pt, f, bi, radius, b, h, w)[:4]
        )(points, feats, binds)
    finally:
        pp._CHUNK = old_chunk
    entry_pid, valid, chunk_bucket, chunk_first = out
    th, tw = h // _TH, w // _TW
    nb = b * th * tw
    entry_pts = points[entry_pid]
    entry_feat = feats[entry_pid, 0]
    return (jax.device_put(entry_pts), jax.device_put(entry_feat[:, None]),
            jax.device_put(entry_pid[:, None]),
            jax.device_put(jnp.asarray(valid)[:, None]),
            jax.device_put(chunk_bucket), jax.device_put(chunk_first),
            th, tw, nb)


def kernel_pertile(radius, th, tw, vec, chunk, trans,
                   bucket_ref, first_ref, pts_ref, feat_ref, pid_ref,
                   valid_ref, val_ref):
    ci = pl.program_id(0)

    @pl.when(first_ref[ci] == 1)
    def _():
        val_ref[:] = jnp.zeros_like(val_ref)

    bkt = bucket_ref[ci]
    oy = ((bkt // tw) % th * _TH).astype(jnp.float32)
    ox = (bkt % tw * _TW).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, _TH, _TW), 1).astype(jnp.float32) + oy
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, _TH, _TW), 2).astype(jnp.float32) + ox

    def body(i, _):
        s = i * vec
        py = pts_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        px = pts_ref[pl.ds(s, vec), 1].reshape(vec, 1, 1)
        f = feat_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        ok = valid_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        dy = rows - py
        dx = cols - px
        r2 = dy * dy + dx * dx
        if trans:
            r = jnp.sqrt(r2)
            w_ = jnp.cos(r * (np.pi / radius)) * 0.5 + 0.5
        else:
            w_ = 1.0 - r2 * (1.0 / (radius * radius))
        wv = jnp.where((r2 <= radius * radius) & (ok > 0), w_ * f, -jnp.inf)
        best = jnp.max(wv, axis=0)
        cur = val_ref[0]
        val_ref[0] = jnp.where(best > cur, best, cur)
        return _

    jax.lax.fori_loop(0, chunk // vec, body, 0)


def kernel_perimg(radius, th, tw, kpi, vec, chunk, trans,
                  bucket_ref, first_ref, pts_ref, feat_ref, pid_ref,
                  valid_ref, val_ref):
    """Output block = ALL tiles of one image [kpi, TH, TW]; local tile
    selected by dynamic leading index."""
    ci = pl.program_id(0)
    bkt = bucket_ref[ci]
    loc = bkt % kpi

    @pl.when(first_ref[ci] == 1)
    def _():
        # each bucket's first chunk zeroes its own tile within the block
        val_ref[loc] = jnp.zeros((_TH, _TW), jnp.float32)
    oy = ((loc // tw) * _TH).astype(jnp.float32)
    ox = ((loc % tw) * _TW).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (1, _TH, _TW), 1).astype(jnp.float32) + oy
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, _TH, _TW), 2).astype(jnp.float32) + ox

    def body(i, _):
        s = i * vec
        py = pts_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        px = pts_ref[pl.ds(s, vec), 1].reshape(vec, 1, 1)
        f = feat_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        ok = valid_ref[pl.ds(s, vec), 0].reshape(vec, 1, 1)
        dy = rows - py
        dx = cols - px
        r2 = dy * dy + dx * dx
        if trans:
            r = jnp.sqrt(r2)
            w_ = jnp.cos(r * (np.pi / radius)) * 0.5 + 0.5
        else:
            w_ = 1.0 - r2 * (1.0 / (radius * radius))
        wv = jnp.where((r2 <= radius * radius) & (ok > 0), w_ * f, -jnp.inf)
        best = jnp.max(wv, axis=0)
        cur = val_ref[loc]
        val_ref[loc] = jnp.where(best > cur, best, cur)
        return _

    jax.lax.fori_loop(0, chunk // vec, body, 0)


def run_variant(name, b, n, h, w, radius, chunk, vec, perimg, trans):
    inputs = make_inputs(b, n, h, w, radius, chunk)
    (entry_pts, entry_feat, entry_pid, entry_valid,
     chunk_bucket, chunk_first, th, tw, nb) = inputs
    kpi = th * tw
    nc = chunk_bucket.shape[0]

    if perimg:
        kern = functools.partial(kernel_perimg, radius, th, tw, kpi, vec,
                                 chunk, trans)
        out_specs = (pl.BlockSpec((kpi, _TH, _TW),
                                  lambda ci, cb, cf: (cb[ci] // kpi, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((nb, _TH, _TW), jnp.float32),)
    else:
        kern = functools.partial(kernel_pertile, radius, th, tw, vec, chunk,
                                 trans)
        out_specs = (pl.BlockSpec((1, _TH, _TW),
                                  lambda ci, cb, cf: (cb[ci], 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((nb, _TH, _TW), jnp.float32),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, 2), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((chunk, 1), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((chunk, 1), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((chunk, 1), lambda ci, cb, cf: (ci, 0)),
        ],
        out_specs=out_specs,
    )

    @jax.jit
    def go(cb, cf, ep, ef, epid, ev):
        outs = pl.pallas_call(kern, grid_spec=grid_spec,
                              out_shape=out_shape)(cb, cf, ep, ef, epid, ev)
        return jnp.sum(outs[0])

    args = (chunk_bucket, chunk_first, entry_pts, entry_feat, entry_pid,
            entry_valid)
    t0 = time.perf_counter()
    r = float(go(*args))
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(go(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:8.1f} ms (chunks={nc}, "
          f"first {t_first:.0f} s, sum={r:.0f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)   # images (B*V)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--radius", type=float, default=10.0)
    args = ap.parse_args()
    b, n, h, w, radius = args.batch, args.n, args.img, args.img, args.radius

    for name, chunk, vec, perimg, trans in [
        ("base chunk512 vec8 pertile", 512, 8, False, True),
        ("chunk2048 vec8 pertile", 2048, 8, False, True),
        ("chunk2048 vec16 pertile", 2048, 16, False, True),
        ("chunk2048 vec8 perimg", 2048, 8, True, True),
        ("chunk512 vec8 perimg", 512, 8, True, True),
        ("chunk2048 vec8 pertile NOTRANS", 2048, 8, False, False),
        ("chunk2048 vec32 pertile", 2048, 32, False, True),
    ]:
        try:
            run_variant(name, b, n, h, w, radius, chunk, vec, perimg, trans)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
