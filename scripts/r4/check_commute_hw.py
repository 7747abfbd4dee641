"""On-chip value parity of the pallas train-commute stage vs dense.

Interpret-mode tests (tests/test_train_commute.py) pin the math on CPU;
this check runs BOTH paths on the real chip at a production-like shape
and compares the encoder output, gradient norms per stage, and BN batch
statistics — the last line of defense against a Mosaic numerics
surprise before the commute default can ever flip.

Run ON TPU in background:  python scripts/r4/check_commute_hw.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.ops import common as opc

    rs = np.random.RandomState(0)
    b, n, h = 8, 3000, 4096
    x = jnp.asarray(rs.rand(b, n, 3) - 0.5, jnp.float32)
    tgt = jnp.asarray(rs.rand(b, h), jnp.float32)
    model = EdgeConvResFeat(k=8, hide_size=h, output_size=h,
                            use_selayer=True, train=True)

    opc.TRAIN_COMMUTE = False
    opc.TRAIN_COMMUTE_IMPL = "0"
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def run(impl):
        opc.TRAIN_COMMUTE = impl != "0"
        opc.TRAIN_COMMUTE_IMPL = impl

        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, mutable=["batch_stats"])
            return jnp.mean((out - tgt) ** 2), (out, upd["batch_stats"])

        (loss, (out, bs)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
        return (float(loss), np.asarray(out), jax.device_get(bs),
                jax.device_get(grads))

    l_d, out_d, bs_d, g_d = run("0")
    l_p, out_p, bs_p, g_p = run("pallas")

    ok = True
    rel = abs(l_p - l_d) / max(abs(l_d), 1e-12)
    print(f"loss dense {l_d:.8f} pallas {l_p:.8f} rel {rel:.2e}")
    ok &= rel < 1e-4
    od = float(np.max(np.abs(out_p - out_d)) / (np.abs(out_d).max() + 1e-12))
    print(f"encoder output max rel dev: {od:.2e}")
    ok &= od < 1e-3
    for (pd, ld), (pp, lp) in zip(
            jax.tree_util.tree_leaves_with_path(bs_d),
            jax.tree_util.tree_leaves_with_path(bs_p)):
        dev = float(np.max(np.abs(np.asarray(lp) - np.asarray(ld))))
        scale = float(np.abs(np.asarray(ld)).max()) + 1e-12
        if dev / scale > 2e-4:
            print(f"  STATS DEV {jax.tree_util.keystr(pd)}: {dev/scale:.2e}")
            ok = False
    gd = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g_d)])
    gp = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g_p)])
    cos = float(np.dot(gd, gp) / (np.linalg.norm(gd) * np.linalg.norm(gp)
                                  + 1e-30))
    rn = float(np.linalg.norm(gp - gd) / (np.linalg.norm(gd) + 1e-30))
    print(f"grad cosine {cos:.8f}  rel-norm-dev {rn:.2e}")
    ok &= cos > 0.9999 and rn < 5e-3
    print("COMMUTE_HW " + ("PASS" if ok else "FAIL"))


if __name__ == "__main__":
    main()
