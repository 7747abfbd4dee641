"""Validate + time the packed-key serving-mode kNN selection on TPU.

Correctness: packed selection ranks by the f32 distance truncated to
(23 - ceil(log2(n))) mantissa bits with lowest-index tie-break, so the
returned index SET may differ from exact argmin under near-ties. We
check (a) exact equality rate, (b) the distance regret: for each
(point, slot) the gathered packed-distance minus the exact j-th
smallest distance, which is the quantity that matters downstream
(max-commute consumes gathered feature rows of near-identical points).

Timing: exact vs packed one-chunk kernel at the encoder's shapes
(N=3072, C in {3, 256, 512, 1024}, k=8, B=32).

Run ON TPU (background, natural completion):
  python scripts/r3/validate_knn_packed.py
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

from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas

B, N, K = 32, 3072, 8


def pairwise_d(x):
    x2 = np.sum(x * x, axis=-1)
    d = x2[:, :, None] + x2[:, None, :] - 2.0 * np.einsum(
        "bnc,bmc->bnm", x, x)
    return d


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rs = np.random.RandomState(0)
    for c in (3, 256, 512, 1024):
        x_np = (rs.rand(B, N, c) - 0.5).astype(np.float32)
        x = jnp.asarray(x_np)

        f_exact = jax.jit(lambda y: knn_self_pallas(y, K, packed=False))
        f_pack = jax.jit(lambda y: knn_self_pallas(y, K, packed=True))
        i_e = np.asarray(f_exact(x))
        i_p = np.asarray(f_pack(x))

        eq = float((i_e == i_p).mean())
        # distance regret of the packed pick vs the exact j-th order stat
        d = pairwise_d(x_np.astype(np.float64))              # [B,N,N]
        de = np.take_along_axis(d, i_e, axis=-1)
        dp = np.take_along_axis(d, i_p, axis=-1)
        regret = dp - np.sort(de, axis=-1)
        dscale = float(np.median(de[..., -1]))               # k-th NN dist
        print(f"C={c:5d} idx-equal {eq*100:6.2f}%  "
              f"regret max {regret.max():.3e} mean {regret.mean():.3e} "
              f"(kth-NN d ~ {dscale:.3e})", flush=True)

        t_e = bench(f_exact, x)
        t_p = bench(f_pack, x)
        print(f"C={c:5d} exact {t_e:7.3f} ms   packed {t_p:7.3f} ms  "
              f"({t_e / t_p:.2f}x)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
