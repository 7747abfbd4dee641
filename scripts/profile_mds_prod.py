"""Production-shape timing + XLA parity for the integrated staged MDS."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
from sparenet_tpu.ops.mds import _mds_one


def main():
    rs = np.random.RandomState(0)

    # small-shape exactness vs the XLA reference
    b, n, npoint = 4, 1280, 1024
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)
    ref = np.asarray(jax.vmap(lambda p, m: _mds_one(p, npoint, m))(xyz, mml))
    got = np.asarray(mds_pallas(xyz, npoint, mml))
    print(f"small-shape match vs XLA: {np.mean(ref == got)*100:.3f}%",
          flush=True)

    # production shape timing
    b, n, npoint = 32, 19384, 16384
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)
    f = lambda: jax.block_until_ready(mds_pallas(xyz, npoint, mml))
    f()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    print(f"production mds_pallas: {min(ts)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
