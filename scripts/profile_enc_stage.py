"""Encoder stage-variant A/B at bench scale (B=32, N=3000).

Per stage width C_in -> C_out, slope-times:
  knn     : knn_idx(feat) alone
  matmul  : g1/g2 per-point matmuls alone
  gather  : take_along_axis(g1)[B,N,k,C] + max over k, f32 and bf16
  dense   : current dense eval chain (gather -> bn affine -> se -> leaky -> max)
  commute : sign-commute single-gather path
            max_k leaky(s*(bn(e_k))) == leaky(s*(nbrmax(a*g1) + a*diff + b))
            (exact: BN eval affine per channel, SE positive, leaky increasing)

Run on the TPU (background, natural completion).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

B = int(os.environ.get("B", "32"))
N = int(os.environ.get("N", "3000"))
K = 8
R_HI = 4

# stage widths of EdgeConvResFeat at hide_size=4096
STAGES = [(3, 256), (256, 256), (256, 512), (512, 1024)]


def slope(name, fn, xs, reps=3):
    """fn(x_stack) -> scalar; time R=1 vs R=4 stacks, report slope."""
    cut = lambda s, r: jax.tree_util.tree_map(lambda t: t[:r], s)
    f1 = jax.jit(lambda s: fn(cut(s, 1)))
    fh = jax.jit(lambda s: fn(cut(s, R_HI)))
    float(f1(xs)); float(fh(xs))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(xs)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(xs)); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:46s} {per * 1000:8.1f} ms", flush=True)
    return per


def scan_sum(body):
    def run(stack):
        def step(acc, inp):
            return acc + body(inp), None
        out, _ = jax.lax.scan(step, jnp.float32(0), stack)
        return out
    return run


def main():
    from sparenet_tpu.ops.knn import knn_idx

    rs = np.random.RandomState(0)

    for ci, co in STAGES:
        print(f"== stage {ci} -> {co} ==", flush=True)
        xs = jnp.asarray(rs.rand(R_HI, B, N, ci) - 0.5, jnp.float32)
        w = jnp.asarray(rs.rand(2 * ci, co) * 0.05, jnp.float32)
        a = jnp.asarray(rs.randn(co) * 0.5, jnp.float32)   # bn eval scale (mixed sign)
        bb = jnp.asarray(rs.randn(co) * 0.1, jnp.float32)
        se = jnp.asarray(rs.rand(B, co) * 0.9 + 0.05, jnp.float32)

        # precompute idx stacks once (graph build not billed to gather variants)
        idx_fn = jax.jit(jax.vmap(lambda x: knn_idx(x, k=K)))
        idxs = idx_fn(xs)

        slope("knn", scan_sum(lambda x: jnp.sum(
            knn_idx(x, k=K).astype(jnp.float32))), xs)

        slope("matmul g1+g2", scan_sum(lambda x: jnp.sum(
            (x @ w[:ci]) + (x @ w[ci:]))), xs)

        def gmax(inp, dt):
            x, idx = inp
            g1 = (x @ w[:ci]).astype(dt)
            gj = jnp.take_along_axis(g1[:, :, None, :], idx[..., None], axis=1)
            return jnp.sum(jnp.max(gj, axis=2).astype(jnp.float32))
        slope("gather+max f32", scan_sum(lambda i: gmax(i, jnp.float32)),
              (xs, idxs))
        slope("gather+max bf16", scan_sum(lambda i: gmax(i, jnp.bfloat16)),
              (xs, idxs))

        def dense(inp, dt):
            x, idx = inp
            g1 = x @ w[:ci]
            g2 = x @ w[ci:]
            diff = (g2 - g1).astype(dt)
            g1 = g1.astype(dt)
            gj = jnp.take_along_axis(g1[:, :, None, :], idx[..., None], axis=1)
            e = gj + diff[:, :, None, :]
            e = (a.astype(dt) * e + bb.astype(dt))
            e = e * se[:, None, None, :].astype(dt)
            e = jnp.where(e >= 0, e, 0.2 * e)
            return jnp.sum(jnp.max(e, axis=2).astype(jnp.float32))
        slope("dense chain f32", scan_sum(lambda i: dense(i, jnp.float32)),
              (xs, idxs))
        slope("dense chain bf16", scan_sum(lambda i: dense(i, jnp.bfloat16)),
              (xs, idxs))

        def commute(inp, dt):
            x, idx = inp
            g1 = x @ w[:ci]
            g2 = x @ w[ci:]
            diff = g2 - g1
            g1s = (g1 * a).astype(dt)
            gj = jnp.take_along_axis(g1s[:, :, None, :], idx[..., None], axis=1)
            m = jnp.max(gj, axis=2).astype(jnp.float32)
            z = (m + a * diff + bb) * se[:, None, :]
            z = jnp.where(z >= 0, z, 0.2 * z)
            return jnp.sum(z)
        slope("commute f32", scan_sum(lambda i: commute(i, jnp.float32)),
              (xs, idxs))
        slope("commute bf16", scan_sum(lambda i: commute(i, jnp.bfloat16)),
              (xs, idxs))

        # numeric check: dense f32 vs commute f32 (scalar sums)
        d = float(jax.jit(lambda i: dense(i, jnp.float32))((xs[0], idxs[0])))
        c = float(jax.jit(lambda i: commute(i, jnp.float32))((xs[0], idxs[0])))
        print(f"   dense vs commute rel err: {abs(d - c) / abs(d):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
