"""Batch-greedy MDS vs the exact greedy Pallas kernel, on hardware.

Measures, at the production shape (B=32, 16384-of-19384):
  - runtime of _mds_batched at G in {256, 512, 1024, 2048} (slope-timed)
  - selection-set overlap vs mds_pallas
  - CD between the GATHERED selected clouds (the direct consumer of the
    indices) — the quantity that bounds downstream forward drift

Inputs mimic the refine stage: a blue-noise-ish "coarse" cloud (16384)
concatenated with a partial-view crop (3000), mml ~ NN spacing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.mds import _mds_batched, minimum_density_sample
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas

B, NPOINT = 32, 16384
N = 19384


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    # coarse: jittered grid points on a sphere-ish surface (structured)
    u = rng.uniform(0, 2 * np.pi, (B, 16384))
    v = rng.uniform(-1, 1, (B, 16384))
    r = 0.4 + 0.05 * rng.standard_normal((B, 16384))
    s = np.sqrt(1 - v ** 2)
    coarse = np.stack([r * s * np.cos(u), r * s * np.sin(u), r * v], -1)
    # partial: a crop of the same surface (z > 0), denser
    part = coarse[:, :3000].copy()
    part[..., 2] = np.abs(part[..., 2])
    cloud = np.concatenate([coarse, part], 1).astype(np.float32)
    mml = np.full((B,), 0.012, np.float32)  # ~ NN spacing of 16k on sphere
    return jnp.asarray(cloud), jnp.asarray(mml)


xyz, mml = make_inputs(0)


def timeit(fn, reps=4):
    @jax.jit
    def many(x, m):
        acc = jnp.int32(0)
        for i in range(reps):
            acc = acc + jnp.sum(fn(x + 1e-6 * i, m))
        return acc

    @jax.jit
    def one(x, m):
        return jnp.sum(fn(x, m))

    jax.block_until_ready(one(xyz, mml))
    jax.block_until_ready(many(xyz, mml))
    t0 = time.perf_counter(); jax.block_until_ready(one(xyz, mml))
    t1 = time.perf_counter(); jax.block_until_ready(many(xyz, mml))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps - 1) * 1e3


def chamfer_np(a, b):
    # mean over both directions of min sq dists, per batch row, averaged
    total = 0.0
    for i in range(a.shape[0]):
        d = ((a[i][:, None, :] - b[i][None, :, :]) ** 2).sum(-1)
        total += d.min(1).mean() + d.min(0).mean()
    return total / a.shape[0]


idx_ref = jax.jit(lambda x, m: mds_pallas(x, NPOINT, m))(xyz, mml)
t_ref = timeit(lambda x, m: mds_pallas(x, NPOINT, m))
print("pallas exact: %.1f ms" % t_ref, flush=True)

ref_np = np.asarray(idx_ref)
xyz_np = np.asarray(xyz)
sub = min(B, 8)  # CD is O(n^2) on host; subsample rows

for g in (256, 512, 1024, 2048):
    fn = lambda x, m: _mds_batched(x, NPOINT, m, g=g)
    idx = jax.jit(fn)(xyz, mml)
    ms = timeit(fn)
    got = np.asarray(idx)
    ov = np.mean([len(set(got[b]) & set(ref_np[b])) / NPOINT
                  for b in range(B)])
    uniq = all(len(set(got[b])) == NPOINT for b in range(B))
    ga = np.take_along_axis(xyz_np[:sub], got[:sub, :, None], 1)
    gb = np.take_along_axis(xyz_np[:sub], ref_np[:sub, :, None], 1)
    cd = chamfer_np(ga[:, ::4], gb[:, ::4])  # subsampled CD proxy
    print("batched g=%4d: %.1f ms (%.2fx)  overlap %.4f  uniq=%s  "
          "gathered-CD %.3e" % (g, ms, t_ref / ms, ov, uniq, cd), flush=True)

print("DONE", flush=True)
