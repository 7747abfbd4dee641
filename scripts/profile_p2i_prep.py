"""A/B the p2i grouped bucket prep (old counting-sort vs new
per-image lax.sort) at GAN scale: 64 images x 16384 pts, 256^2
images, [32,128] tiles -> kpi=16 buckets/image. Loads the OLD
implementation from git (HEAD~ snapshot written to /tmp/p2i_old.py
by the caller) and checks bit-exactness of every output.

Usage: git show <rev>:sparenet_tpu/ops/pallas/p2i_pallas.py \
         > /tmp/p2i_old.py && python scripts/profile_p2i_prep.py
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, reps=6):
    # the axon tunnel's block_until_ready is unreliable; force with a
    # scalar transfer (costs ~40 ms, paid equally by every variant)
    out = fn()
    float(sum(jnp.sum(o) for o in out[:4]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(sum(jnp.sum(o) for o in out[:4]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1000:9.1f} ms", flush=True)
    return out


def main():
    from sparenet_tpu.ops.pallas import p2i_pallas as pp

    spec = importlib.util.spec_from_file_location("p2i_old", "/tmp/p2i_old.py")
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)

    rs = np.random.RandomState(0)
    B, n0 = 64, 16384
    P = B * n0
    h = w = 256
    radius = 10.0
    points = jnp.asarray(rs.rand(P, 2) * 255.0, jnp.float32)
    feats = jnp.asarray(rs.rand(P, 1), jnp.float32)
    batch_inds = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n0)

    f_new = jax.jit(lambda p, f, bi: pp._prep_grouped(
        p, f, bi, radius, B, h, w))
    f_old = jax.jit(lambda p, f, bi: old._prep_grouped(
        p, f, bi, radius, B, h, w))
    f_gen = jax.jit(lambda p, f, bi: pp._prep_sorted(
        p, f, bi, radius, B, h, w))

    r_old = timed("old counting-sort grouped prep", lambda: f_old(
        points, feats, batch_inds))
    r_new = timed("new per-image-sort grouped prep", lambda: f_new(
        points, feats, batch_inds))
    timed("flat argsort general prep", lambda: f_gen(
        points, feats, batch_inds))

    for i, (a, b) in enumerate(zip(r_old, r_new)):
        same = bool(jnp.array_equal(a, b))
        print(f"output[{i}] shapes {a.shape}/{b.shape} exact={same}")
        assert same, f"output {i} mismatch"
    print("bit-exact: OK")


if __name__ == "__main__":
    main()
