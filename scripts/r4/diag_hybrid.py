"""Diagnose the hybrid-MDS quality gap on the converged checkpoint.

The serving envelope v2 shows serving+exactMDS is quality-neutral but
serving+hybridMDS is batched-level — contradicting the r4 lab thesis
(exact tail fixes the batched damage). Two hypotheses:

  H1: the damage on converged coarse clouds is NOT tail-concentrated
      (the batched prefix itself picks a structurally worse set);
  H2: mds_pallas_continue mis-executes on real hardware (it is gate-
      checked for compile/run only; its value parity tests are
      interpret-mode).

Discriminator: on REAL converged coarse+partial clouds, compare the
selection of hybrid(tail=pallas) vs hybrid(tail=xla) from the SAME
prefix state — they must agree index-for-index if the kernel is right
(H2 false). Then quantify per-variant quality as gathered-cloud CD vs
the exact greedy selection, and prefix-vs-tail damage attribution
(exact-prefix + batched-tail and vice versa are not directly
constructible, but overlap-with-exact per segment is).

Run ON TPU in background:
  python scripts/r4/diag_hybrid.py --weights <ckpt> [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.ops.chamfer import chamfer_distance
    from sparenet_tpu.ops.expansion_penalty import expansion_penalty
    from sparenet_tpu.ops import mds as mds_mod

    cfg = default_config()
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    ds = SyntheticDataset(cfg, VAL)
    items = [ds[i] for i in range(args.batch)]
    partial = jnp.asarray(
        np.stack([np.asarray(it[3]["partial_cloud"]) for it in items]),
        jnp.float32)

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.weights))
    state = payload["state"]
    variables = jax.device_put(
        {"params": state["params"], "batch_stats": state["batch_stats"]})

    # coarse cloud from the real model (parity mode)
    coarse = jax.jit(lambda v, x: model.apply(v, x)[0])(variables, partial)
    print("coarse:", coarse.shape, flush=True)

    base = jnp.concatenate([coarse, partial], axis=1)          # [B,19384,3]
    _, _, mml = jax.jit(
        lambda c: expansion_penalty(c, 16384 // 32, 1.5))(coarse)
    print("mml:", np.asarray(mml), flush=True)

    n = 16384

    def sel_cd(idx_a, idx_ref):
        """gathered-cloud CD between two selections + set overlap."""
        a = jnp.take_along_axis(base, jnp.asarray(idx_a)[..., None], axis=1)
        r = jnp.take_along_axis(base, jnp.asarray(idx_ref)[..., None], axis=1)
        cd = float(jax.jit(chamfer_distance)(a, r))
        ov = np.mean([len(set(np.asarray(idx_a)[b]) &
                          set(np.asarray(idx_ref)[b])) / n
                      for b in range(idx_a.shape[0])])
        return cd, ov

    exact = mds_mod.minimum_density_sample(base, n, mml, impl="pallas")
    exact = np.asarray(exact)

    variants = {}
    variants["batched"] = np.asarray(
        mds_mod._mds_batched(base, n, mml, g=8192))
    variants["hybrid_pallas"] = np.asarray(
        mds_mod._mds_hybrid(base, n, mml, g=8192, tail=2048,
                            tail_impl="pallas"))
    variants["hybrid_xla"] = np.asarray(
        mds_mod._mds_hybrid(base, n, mml, g=8192, tail=2048,
                            tail_impl="xla"))

    # H2 check: identical prefix state => tails must agree exactly
    agree = (variants["hybrid_pallas"] == variants["hybrid_xla"]).mean()
    print(f"hybrid pallas-vs-xla element agreement: {agree:.6f}", flush=True)
    tail_agree = (variants["hybrid_pallas"][:, -2048:]
                  == variants["hybrid_xla"][:, -2048:]).mean()
    print(f"  tail-only agreement: {tail_agree:.6f}", flush=True)

    for name, idx in variants.items():
        cd, ov = sel_cd(idx, exact)
        print(f"[{name:14s}] vs exact: gathered-CD {cd:.3e} "
              f"set-overlap {ov:.4f}", flush=True)

    # segment attribution: how much of the EXACT set does each segment
    # of the hybrid carry (prefix picks vs tail picks)?
    hp = variants["hybrid_pallas"]
    for b in range(min(2, hp.shape[0])):
        ex = set(exact[b])
        pref = set(hp[b][:n - 2048])
        tail = set(hp[b][n - 2048:])
        print(f"b{b}: prefix-in-exact {len(pref & ex) / len(pref):.4f}  "
              f"tail-in-exact {len(tail & ex) / len(tail):.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
