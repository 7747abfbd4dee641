"""Decompose the batched-MDS round costs (round 5).

The stage-1b schedule benches contradicted the naive cost model
(update work + per-round constant): S=4096 (HALF of G=8192's update
work, same top_k count) benched SLOWER than G=8192 (234.0 vs 256.7).
Suspect: lax.top_k cost is strongly k-dependent at large k. This
script slope-times the three round ingredients separately at the
production shape (B=32, N=19456):

  - lax.top_k(-temp, k) for the takes the dial/schedules use,
  - the fused density update (einsum + exp2 + sum) for various G,
  - full variadic sort and int32-only sort (complement-trick pricing).

Slope timing: R reps inside one jit on R distinct inputs, (t4-t1)/3
(scripts/slope_time.py methodology).

Run ON TPU in background:  python scripts/r5/profile_mds_rounds.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 32, 19456


def slope(fn, inputs4):
    """fn maps one input -> scalar; time R=1 vs R=4 stacked."""
    @jax.jit
    def run1(xs):
        return fn(xs[0])

    @jax.jit
    def run4(xs):
        def body(acc, x):
            return acc + fn(x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    float(run1(inputs4))  # compile
    float(run4(inputs4))
    t0 = time.perf_counter(); float(run1(inputs4)); t1 = time.perf_counter()
    t2 = time.perf_counter(); float(run4(inputs4)); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / 3.0


def main():
    rs = np.random.RandomState(0)
    temps = jnp.asarray(rs.rand(4, B, N).astype(np.float32))
    xs = jnp.asarray(rs.rand(4, B, N, 3).astype(np.float32) - 0.5)

    print("== lax.top_k(-temp, k) [B=32, N=19456] ==", flush=True)
    for k in (2048, 4096, 6144, 8192, 9215, 12287, 14335):
        dt = slope(lambda t, k=k: jnp.sum(
            jax.lax.top_k(-t, k)[0][:, ::257]), temps)
        print(f"  k={k:6d}: {dt*1000:7.2f} ms", flush=True)

    print("== density update (einsum+exp2+sum) for G selected ==",
          flush=True)
    kde = jnp.full((B, 1), 7.3, jnp.float32)
    for g in (2048, 4096, 8192):
        sel = jnp.asarray(rs.randint(0, N, (B, g)).astype(np.int32))

        def upd(x, g=g, sel=sel):
            s = jnp.take_along_axis(x, sel[..., None], axis=1)
            arg = (jnp.einsum("bnd,bgd->bng", x, 2.0 * kde[..., None] * s)
                   - (jnp.sum(s * s, -1) * kde)[:, None, :])
            return jnp.sum(jnp.exp2(arg)[:, ::257, ::129])
        dt = slope(upd, xs)
        print(f"  G={g:6d}: {dt*1000:7.2f} ms", flush=True)

    print("== full sorts [B=32, N=19456] ==", flush=True)
    dt = slope(lambda t: jnp.sum(jnp.sort(t, axis=-1)[:, ::257]), temps)
    print(f"  f32 sort (values only): {dt*1000:7.2f} ms", flush=True)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    def vsort(t):
        v, i = jax.lax.sort((t, iota), num_keys=1)
        return jnp.sum(v[:, ::257]) + jnp.float32(jnp.sum(i[:, ::511]))
    dt = slope(vsort, temps)
    print(f"  variadic (f32 key, i32 payload): {dt*1000:7.2f} ms",
          flush=True)

    def isort(t):
        key = t.view(jnp.int32) if hasattr(t, "view") else t
        key = jax.lax.bitcast_convert_type(t, jnp.int32)
        return jnp.float32(jnp.sum(jnp.sort(key, axis=-1)[:, ::257]))
    dt = slope(isort, temps)
    print(f"  i32 sort (bitcast keys): {dt*1000:7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
