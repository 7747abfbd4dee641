"""Debug the staged MDS: (1) where do mismatches start, (2) what does
the glue (compaction) cost vs the stage kernels."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_mds_staged import mds_staged
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
from sparenet_tpu.ops.mds import _mds_one


def main():
    rs = np.random.RandomState(0)

    # --- small-shape ground truth vs the XLA reference ---
    b, n, npoint = 4, 1280, 1024
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)
    ref_xla = np.asarray(jax.vmap(
        lambda p, m: _mds_one(p, npoint, m))(xyz, mml))
    got_v2 = np.asarray(mds_pallas(xyz, npoint, mml))
    got_st = np.asarray(mds_staged(xyz, npoint, mml, stage_len=256))
    print(f"small: v2 vs xla match {np.mean(ref_xla == got_v2)*100:.3f}%")
    print(f"small: staged vs xla match {np.mean(ref_xla == got_st)*100:.3f}%")
    mm = np.argwhere(ref_xla != got_st)
    if len(mm):
        r0, c0 = mm[0]
        print(f"first mismatch at row {r0} step {c0} "
              f"(stage {c0 // 256}): xla={ref_xla[r0, c0]} "
              f"staged={got_st[r0, c0]}")
        # mismatch counts per stage
        for s in range(npoint // 256):
            cnt = np.sum(ref_xla[:, s*256:(s+1)*256] !=
                         got_st[:, s*256:(s+1)*256])
            print(f"  stage {s}: {cnt} mismatches")

    # --- timing split at production shape ---
    b, n, npoint = 32, 19384, 16384
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)

    for sl in (16384, 8192, 4096, 2048):
        f = lambda: jax.block_until_ready(mds_staged(xyz, npoint, mml, sl))
        f()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        print(f"staged L={sl:6d}  {min(ts)*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
