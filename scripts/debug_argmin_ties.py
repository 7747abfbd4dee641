"""Does jnp.argmin inside a Pallas TPU kernel break ties by lowest index
(XLA semantics)? And does an explicit two-pass argmin fix it + cost?"""

from __future__ import annotations

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


def _argmin_kernel(explicit: bool, x_ref, o_ref):
    x = x_ref[:]
    r, n = x.shape
    if explicit:
        m = jnp.min(x, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
        o_ref[:, 0] = jnp.min(jnp.where(x == m, lane, n), axis=1)
    else:
        o_ref[:, 0] = jnp.argmin(x, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("explicit",))
def pallas_argmin(x, explicit=False):
    r, n = x.shape
    return pl.pallas_call(
        functools.partial(_argmin_kernel, explicit),
        in_specs=[pl.BlockSpec((r, n), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.int32),
    )(x)[:, 0]


def main():
    rs = np.random.RandomState(0)
    # rows with duplicated minima at controlled positions
    r, n = 8, 2048
    x = rs.rand(r, n).astype(np.float32) + 1.0
    dup_pos = [(0, [5, 700]), (1, [100, 101]), (2, [0, 2047]),
               (3, [1500, 1600, 1700]), (4, [127, 128]),
               (5, [1, 1024]), (6, [300]), (7, [2000, 100])]
    for row, cols in dup_pos:
        for c in cols:
            x[row, c] = 0.5
    xj = jnp.asarray(x)

    want = np.argmin(x, axis=1)
    got_xla = np.asarray(jnp.argmin(xj, axis=1))
    got_pl = np.asarray(pallas_argmin(xj, explicit=False))
    got_ex = np.asarray(pallas_argmin(xj, explicit=True))
    print(f"numpy lowest-index: {want}")
    print(f"xla argmin:         {got_xla}")
    print(f"pallas argmin:      {got_pl}")
    print(f"pallas explicit:    {got_ex}", flush=True)

    # cost: time both in an MDS-like loop shape
    r2, n2 = 8, 19456
    big = jnp.asarray(rs.rand(r2, n2).astype(np.float32))

    def loop_kernel(explicit, x_ref, o_ref):
        x = x_ref[:]
        rr, nn = x.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (rr, nn), 1)

        def body(j, acc):
            y = x + acc[:, None].astype(jnp.float32) * 1e-9
            if explicit:
                m = jnp.min(y, axis=1, keepdims=True)
                i = jnp.min(jnp.where(y == m, lane, nn), axis=1)
            else:
                i = jnp.argmin(y, axis=1).astype(jnp.int32)
            return acc + i
        acc = jax.lax.fori_loop(0, 4096, body, jnp.zeros((r2,), jnp.int32))
        o_ref[:, 0] = acc

    for explicit in (False, True):
        f = jax.jit(lambda x: pl.pallas_call(
            functools.partial(loop_kernel, explicit),
            in_specs=[pl.BlockSpec((r2, n2), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r2, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r2, 128), jnp.int32),
        )(x)[:, 0])
        float(jnp.sum(f(big)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(f(big)))
            ts.append(time.perf_counter() - t0)
        print(f"4096-step argmin loop explicit={explicit}: "
              f"{min(ts)*1000:7.1f} ms ({min(ts)/4096*1e6:.2f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
