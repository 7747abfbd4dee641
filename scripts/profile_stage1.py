"""Split the first EdgeConv stage (C=3 -> 256, B=32, N=3000, k=8) into
pieces to find the slow op: kNN alone, gather alone, factorized conv,
edge-tensor conv, max-over-k."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")


def timed(name, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    from sparenet_tpu.ops.knn import knn_idx, get_graph_feature

    rs = np.random.RandomState(0)
    B, N, k = 32, 3000, 8
    x3 = jnp.asarray(rs.rand(B, N, 3) - 0.5, jnp.float32)
    x256 = jnp.asarray(rs.rand(B, N, 256) - 0.5, jnp.float32)
    w6 = jnp.asarray(rs.rand(6, 256) * 0.01, jnp.float32)
    w3 = w6[:3]
    idx = knn_idx(x3, k)
    idx = jax.block_until_ready(idx)

    f_knn3 = jax.jit(lambda x: jnp.sum(knn_idx(x, k)))
    timed("knn_idx C=3", lambda: float(f_knn3(x3)))

    f_knn256 = jax.jit(lambda x: jnp.sum(knn_idx(x, k)))
    timed("knn_idx C=256", lambda: float(f_knn256(x256)))

    # narrow gather: [B,N,3] -> [B,N,k,3]
    f_g3 = jax.jit(lambda x, i: jnp.sum(
        jnp.take_along_axis(x[:, :, None, :], i[..., None], axis=1)))
    timed("gather C=3 (take_along_axis)", lambda: float(f_g3(x3, idx)))

    # wide gather: [B,N,256] -> [B,N,k,256]
    f_g256 = jax.jit(lambda x, i: jnp.sum(
        jnp.take_along_axis(x[:, :, None, :], i[..., None], axis=1)))
    timed("gather C=256", lambda: float(f_g256(x256, idx)))

    # edge features + conv (old path, given idx)
    def old(x, i):
        e = get_graph_feature(x, k=k, idx=i)                  # [B,N,k,6]
        return jnp.sum(jnp.max(e @ w6, axis=2))
    timed("old: edge feat + conv6->256 + max", lambda: float(
        jax.jit(old)(x3, idx)))

    # factorized (new path, given idx)
    def new(x, i):
        g1 = x @ w3
        g2 = x @ (w6[3:])
        gj = jnp.take_along_axis(g1[:, :, None, :], i[..., None], axis=1)
        return jnp.sum(jnp.max(gj + (g2 - g1)[:, :, None, :], axis=2))
    timed("new: matmul + wide gather + max", lambda: float(
        jax.jit(new)(x3, idx)))

    # max-over-k alone on [B,N,k,256]
    e = jnp.asarray(rs.rand(B, N, k, 256), jnp.float32)
    f_max = jax.jit(lambda e: jnp.sum(jnp.max(e, axis=2)))
    timed("max over k on [B,N,8,256]", lambda: float(f_max(e)))


if __name__ == "__main__":
    main()
