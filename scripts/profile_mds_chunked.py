"""A/B the validated chunked MDS vs the staged Pallas greedy kernel.

Production shape (B=32, 16384-of-19384) timings for the Pallas kernel
and _mds_chunked at several chunk sizes, a lax.top_k microbench (the
chunked path's per-round fixed cost), selection-set overlap vs the XLA
reference at mid shape, and a clustered-cloud regime to probe accepted-
prefix collapse.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
from sparenet_tpu.ops.mds import _mds_chunked, _mds_one


def timeit(f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    rs = np.random.RandomState(0)

    # --- mid-shape selection-set overlap vs XLA reference ---
    b, n, npoint = 4, 1280, 1024
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)
    ref = np.asarray(jax.vmap(lambda p, m: _mds_one(p, npoint, m))(xyz, mml))
    for g in (64, 256):
        got = np.asarray(_mds_chunked(xyz, npoint, mml, chunk=g))
        eq = np.mean(ref == got) * 100
        ov = np.mean([len(set(ref[i]) & set(got[i])) / npoint
                      for i in range(b)]) * 100
        uniq = all(len(set(got[i].tolist())) == npoint for i in range(b))
        print(f"mid-shape chunk={g}: index match {eq:.2f}%  "
              f"set overlap {ov:.3f}%  unique={uniq}", flush=True)

    # --- production shape ---
    b, n, npoint = 32, 19384, 16384
    xyz = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    mml = jnp.full((b,), 0.05, jnp.float32)

    t_pal = timeit(lambda: jax.block_until_ready(mds_pallas(xyz, npoint, mml)))
    print(f"production mds_pallas: {t_pal:.1f} ms", flush=True)

    # top_k per-round fixed cost
    tk = jax.jit(lambda t: jax.lax.top_k(-t, 257))
    tmp = jnp.asarray(rs.rand(b, n), jnp.float32)
    t_tk = timeit(lambda: jax.block_until_ready(tk(tmp)))
    print(f"lax.top_k [32,{n}] k=257: {t_tk:.2f} ms", flush=True)

    pal_set = [set(np.asarray(mds_pallas(xyz, npoint, mml))[i].tolist())
               for i in range(4)]
    for g in (128, 256, 512, 1024):
        f = lambda: jax.block_until_ready(_mds_chunked(xyz, npoint, mml, chunk=g))
        t_chk = timeit(f)
        got = np.asarray(_mds_chunked(xyz, npoint, mml, chunk=g))
        ov = np.mean([len(pal_set[i] & set(got[i].tolist())) / npoint
                      for i in range(4)]) * 100
        uniq = all(len(set(got[i].tolist())) == npoint for i in range(4))
        print(f"production chunked g={g}: {t_chk:.1f} ms "
              f"({t_pal / t_chk:.2f}x)  set overlap vs pallas {ov:.2f}%  "
              f"unique={uniq}", flush=True)

    # --- clustered regime (prefix-collapse probe): 8 tight gaussians ---
    centers = rs.randn(8, 3)
    pts = (centers[rs.randint(0, 8, (b, n))] +
           0.02 * rs.randn(b, n, 3)).astype(np.float32)
    xyzc = jnp.asarray(pts)
    # mml tracks the cloud's own density like the model's MST mml does
    mmlc = jnp.full((b,), 0.01, jnp.float32)
    t_palc = timeit(lambda: jax.block_until_ready(mds_pallas(xyzc, npoint, mmlc)))
    for g in (256,):
        t_chkc = timeit(
            lambda: jax.block_until_ready(_mds_chunked(xyzc, npoint, mmlc, chunk=g)))
        print(f"clustered: pallas {t_palc:.1f} ms, chunked g={g} "
              f"{t_chkc:.1f} ms ({t_palc / t_chkc:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
