"""kNN kernel breakdown at bench scale: distance-accumulation-only vs
full select, per stage width (C = 3, 256, 256, 512), plus precision
ablation. Identifies whether the 4-graph 70 ms encoder cost is MXU
(distance) or VPU (selection) bound."""

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

jax.config.update("jax_default_matmul_precision", "bfloat16")


def timed(name, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1000:9.1f} ms", flush=True)


def dist_only_kernel(prec, x_ref, xt_ref, o_ref, d_scr):
    ci = pl.program_id(2)
    nc = pl.num_programs(2)
    xq = x_ref[0]
    yt = xt_ref[0]
    y2 = jnp.sum(yt * yt, axis=0, keepdims=True)
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)
    part = x2 + y2 - 2.0 * jax.lax.dot_general(
        xq, yt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(ci == 0)
    def _():
        d_scr[:] = part

    @pl.when(ci > 0)
    def _():
        d_scr[:] = d_scr[:] + part

    @pl.when(ci == nc - 1)
    def _():
        o_ref[0] = jnp.min(d_scr[:], axis=1)


def dist_only(x, prec):
    b, n, c = x.shape
    n_pad = -(-n // 128) * 128
    cc = min(256, -(-c // 128) * 128)
    c_pad = -(-c // cc) * cc
    q = 128
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    xt = jnp.transpose(xp, (0, 2, 1))
    out = pl.pallas_call(
        functools.partial(dist_only_kernel, prec),
        grid=(b, n_pad // q, c_pad // cc),
        in_specs=[
            pl.BlockSpec((1, q, cc), lambda bi, qi, ci: (bi, qi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, n_pad), lambda bi, qi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q), lambda bi, qi, ci: (bi, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((q, n_pad), jnp.float32)],
    )(xp, xt)
    return jnp.sum(out)


def main():
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas
    from sparenet_tpu.ops import common

    rs = np.random.RandomState(0)
    B, N = 32, 3000
    for c in (3, 256, 512):
        x = jnp.asarray(rs.rand(B, N, c) - 0.5, jnp.float32)
        f_full = jax.jit(lambda x: jnp.sum(knn_self_pallas(x, 8)))
        timed(f"full kNN C={c} (HIGHEST dist)", lambda: float(f_full(x)))
        for pname in ("HIGHEST", "DEFAULT"):
            prec = dict(HIGHEST=jax.lax.Precision.HIGHEST,
                        DEFAULT=jax.lax.Precision.DEFAULT)[pname]
            f_d = jax.jit(functools.partial(dist_only, prec=prec))
            timed(f"distance-only C={c} [{pname}]", lambda: float(f_d(x)))
        # knn_self_pallas is itself jitted and its cache key does NOT
        # include the precision global — clear so the re-trace sees it
        jax.clear_caches()
        common.set_distance_precision("DEFAULT")
        f_full2 = jax.jit(lambda x: jnp.sum(knn_self_pallas(x, 8)))
        timed(f"full kNN C={c} (DEFAULT dist)", lambda: float(f_full2(x)))
        common.set_distance_precision("HIGHEST")
        jax.clear_caches()


if __name__ == "__main__":
    main()
