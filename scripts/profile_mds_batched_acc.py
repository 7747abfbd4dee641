"""Accuracy triage for batch-greedy MDS: is its selection-set drift in
the same class as the existing float-rounding drift between exact
implementations, or materially worse?

Compares, on structured (sphere+crop) and uniform-random inputs:
  - overlap + full-res on-device gathered-cloud CD for:
      pallas-exact  vs xla-chunked-exact  (float-drift baseline)
      batched(g)    vs xla-chunked-exact
The CD is mean(d1)+mean(d2) of squared dists (reference metric units,
utils/misc.py:201-203) — the forward-parity contract is <= 1e-4.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.chamfer import chamfer_raw
from sparenet_tpu.ops.mds import _mds_batched, _mds_chunked
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas

B, NPOINT, N = 8, 16384, 19384


def sphere_inputs(seed):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, (B, 16384))
    v = rng.uniform(-1, 1, (B, 16384))
    r = 0.4 + 0.05 * rng.standard_normal((B, 16384))
    s = np.sqrt(1 - v ** 2)
    coarse = np.stack([r * s * np.cos(u), r * s * np.sin(u), r * v], -1)
    part = coarse[:, :3000].copy()
    part[..., 2] = np.abs(part[..., 2])
    cloud = np.concatenate([coarse, part], 1).astype(np.float32)
    return jnp.asarray(cloud), jnp.asarray(np.full((B,), 0.012, np.float32))


def uniform_inputs(seed):
    rng = np.random.default_rng(seed)
    cloud = rng.uniform(-0.5, 0.5, (B, N, 3)).astype(np.float32)
    return jnp.asarray(cloud), jnp.asarray(np.full((B,), 0.02, np.float32))


@jax.jit
def gathered_cd(xyz, ia, ib):
    a = jnp.take_along_axis(xyz, ia[..., None], axis=1)
    b = jnp.take_along_axis(xyz, ib[..., None], axis=1)
    d1, d2, _, _ = chamfer_raw(a, b)
    return jnp.mean(d1, 1) + jnp.mean(d2, 1)  # [B]


def report(tag, xyz, ia, ib):
    a, b = np.asarray(ia), np.asarray(ib)
    ov = np.mean([len(set(a[r]) & set(b[r])) / NPOINT for r in range(B)])
    cd = np.asarray(gathered_cd(xyz, ia, ib))
    print("%-34s overlap %.4f  CD mean %.3e max %.3e"
          % (tag, ov, cd.mean(), cd.max()), flush=True)


for name, make in (("sphere", sphere_inputs), ("uniform", uniform_inputs)):
    xyz, mml = make(0)
    exact = jax.jit(lambda x, m: _mds_chunked(x, NPOINT, m, chunk=64))(xyz, mml)
    pal = jax.jit(lambda x, m: mds_pallas(x, NPOINT, m))(xyz, mml)
    report(f"[{name}] pallas vs exact (baseline)", xyz, pal, exact)
    for g in (512, 1024, 2048):
        bat = jax.jit(lambda x, m, g=g: _mds_batched(x, NPOINT, m, g=g))(xyz, mml)
        report(f"[{name}] batched g={g} vs exact", xyz, bat, exact)
print("DONE", flush=True)
