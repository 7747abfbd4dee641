"""Same-process A/B: factorized EdgeConv1x1 vs dense Conv2d1x1 over
edge features, at the four encoder stage widths (B=32, N=3000, k=8)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timed(name, fn, reps=5):
    t0 = time.perf_counter()
    fn()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms  (first {t_first:.1f} s)",
          flush=True)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    if args.bf16:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from sparenet_tpu.models.layers import EdgeConv1x1, Conv2d1x1
    from sparenet_tpu.ops.knn import get_graph_feature, knn_idx

    rs = np.random.RandomState(0)
    h = 4096
    stages = [(3, h // 16), (h // 16, h // 16), (h // 16, h // 8),
              (h // 8, h // 4)]

    class Old(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x):
            e = get_graph_feature(x, k=8)
            e = Conv2d1x1(self.out, use_bias=False)(e)
            return jnp.max(e, axis=2)

    class New(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x):
            idx = knn_idx(x, k=8)
            e = EdgeConv1x1(self.out)(x, idx)
            return jnp.max(e, axis=2)

    for cin, cout in stages:
        x = jnp.asarray(rs.rand(args.batch, args.n, cin) - 0.5, jnp.float32)
        old = Old(cout)
        new = New(cout)
        vo = old.init(jax.random.PRNGKey(0), x)
        vn = {"params": {"EdgeConv1x1_0":
                         {"kernel": vo["params"]["Conv2d1x1_0"]["kernel"]}}}
        fo = jax.jit(lambda v, x: jnp.sum(old.apply(v, x)))
        fn_ = jax.jit(lambda v, x: jnp.sum(new.apply(v, x)))
        a = float(fo(vo, x))
        b = float(fn_(vn, x))
        rel = abs(a - b) / max(abs(a), 1e-6)
        print(f"stage {cin:5d}->{cout:5d}: parity rel err {rel:.2e}")
        timed(f"  old (edge-tensor matmul) {cin}->{cout}",
              lambda: float(fo(vo, x)))
        timed(f"  new (factorized)         {cin}->{cout}",
              lambda: float(fn_(vn, x)))


if __name__ == "__main__":
    main()
