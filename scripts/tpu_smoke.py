#!/usr/bin/env python
"""TPU hardware gate: Mosaic-compile + run every Pallas kernel at
production shapes, plus one full SpareNet forward.

Run this (to natural completion — never kill it mid-execution, see the
verify skill) before committing anything that touches ops/pallas/.
Interpret-mode CPU tests do NOT catch Mosaic compile failures: round 1's
snapshot commit landed an [R, N] i1 loop-carry in the MDS stage kernel
that passed all 115 CPU tests and crashed the Mosaic compiler on chip
(VERDICT.md round 1, headline). This gate exists so that class of
regression can never land silently again.

Exit code 0 = every kernel compiled with Mosaic and ran on the chip.
Prints one PASS line per kernel with wall time (first-compile inflated).

Production shapes exercised (configs/sparenet.yaml parity):
  knn        B=32  n=3000   k=8      (EdgeConv encoder graph)
  chamfer    B=32  16384 vs 16384    (loss path)
  emd bids   B=8   n=16384           (one auction bid round)
  expansion  B=32  n=16384  prim=512 (MST + leaf prune)
  mds        B=2   n=19456->16384    (refine resample; 19384 padded)
  mds hybrid B=2   n=19456->16384    (batched prefix + compacted exact tail)
  p2i max    B=4   16384 pts -> 256x256 (renderer splat)
  sparenet   B=2 full forward 3000 -> 16384
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _run(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        import jax
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 — report and fail the gate
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        return False
    dt = time.perf_counter() - t0
    print(f"PASS {name} ({dt:.1f}s)", flush=True)
    return True


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)
    if backend in ("cpu", "gpu"):
        print("FAIL gate: not on TPU — this gate must run on hardware",
              flush=True)
        return 1

    rs = np.random.RandomState(0)
    ok = True

    from sparenet_tpu.ops import knn as knn_mod
    x_enc = jnp.asarray(rs.rand(32, 3000, 3) - 0.5, jnp.float32)
    ok &= _run("knn (32,3000,k=8)",
               lambda: jax.jit(lambda a: knn_mod.knn_idx(a, 8))(x_enc))

    from sparenet_tpu.ops.chamfer import chamfer_raw
    xa = jnp.asarray(rs.rand(32, 16384, 3) - 0.5, jnp.float32)
    xb = jnp.asarray(rs.rand(32, 16384, 3) - 0.5, jnp.float32)
    ok &= _run("chamfer (32,16384x16384)",
               lambda: jax.jit(lambda a, b: chamfer_raw(a, b)[0])(xa, xb))

    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas
    e1 = jnp.asarray(rs.rand(8, 16384, 3), jnp.float32)
    e2 = jnp.asarray(rs.rand(8, 16384, 3), jnp.float32)
    price = jnp.zeros((8, 16384), jnp.float32)
    ok &= _run("emd bids (8,16384)",
               lambda: jax.jit(emd_bids_pallas)(e1, e2, price))

    from sparenet_tpu.ops.expansion_penalty import expansion_penalty
    xc = jnp.asarray(rs.rand(32, 16384, 3) - 0.5, jnp.float32)
    ok &= _run("expansion (32,16384,prim=512)",
               lambda: jax.jit(
                   lambda a: expansion_penalty(a, 512, 1.5)[0])(xc))

    from sparenet_tpu.ops.mds import minimum_density_sample
    # refine path: coarse 16384 + partial 3000 = 19384, padded to 19456
    xm = jnp.asarray(rs.rand(2, 19456, 3) - 0.5, jnp.float32)
    mml = jnp.full((2,), 0.05, jnp.float32)
    ok &= _run("mds (2,19456->16384)",
               lambda: jax.jit(
                   lambda a, m: minimum_density_sample(a, 16384, m))(xm, mml))

    # hybrid serving path: batched prefix + compacted exact tail
    # (mds_pallas_continue — a separate Mosaic entry point)
    ok &= _run("mds hybrid (2,19456->16384,tail=2048)",
               lambda: jax.jit(
                   lambda a, m: minimum_density_sample(
                       a, 16384, m, impl="hybrid"))(xm, mml))

    # train-commute fused edge stats: fwd pass + table-accumulate
    # scatter VJP (both separate Mosaic entry points)
    from sparenet_tpu.ops.pallas.edge_train_pallas import edge_gather_stats
    ge = jnp.asarray(rs.rand(24, 3000, 1024) - 0.5, jnp.float32)
    ie = jnp.asarray(rs.randint(0, 3000, (24, 3000, 8)), jnp.int32)

    def _egs_loss(g):
        mx, mn, s1, s2 = edge_gather_stats(g, ie)
        return jnp.sum(mx) + jnp.sum(mn) * 0.5 + jnp.sum(s1) * 0.1 \
            + jnp.sum(s2) * 1e-3

    ok &= _run("edge stats fwd (24,3000,k=8,C=1024)",
               lambda: jax.jit(lambda g: edge_gather_stats(g, ie)[0])(ge))
    ok &= _run("edge stats vjp (24,3000,k=8,C=1024)",
               lambda: jax.jit(jax.grad(_egs_loss))(ge))

    from sparenet_tpu.ops.p2i import p2i
    pts = jnp.asarray(rs.rand(4 * 16384, 2) * 200 + 28, jnp.float32)
    feats = jnp.asarray(rs.rand(4 * 16384, 1), jnp.float32)
    binds = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 16384)
    bg = jnp.zeros((4, 256, 256, 1), jnp.float32)
    ok &= _run("p2i max (4x16384 -> 256x256)",
               lambda: jax.jit(
                   lambda p, f, bi, b: p2i(p, f, bi, b, 5.0,
                                           reduce="max"))(
                       pts, feats, binds, bg))

    from sparenet_tpu.models import SpareNetGenerator
    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    partial = jnp.asarray(rs.rand(2, 3000, 3) - 0.5, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)
    ok &= _run("sparenet forward (B=2)",
               lambda: jax.jit(
                   lambda v, p: model.apply(v, p)[2])(variables, partial))

    print("GATE " + ("PASS" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
