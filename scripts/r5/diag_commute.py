"""Root-cause the round-4 COMMUTE_HW FAIL (VERDICT r4 task #2).

The gate (scripts/r4/check_commute_hw.py, log at
docs/artifacts/r4/r4_stage4/commute_hw_parity.log) compared the DENSE
train encoder vs the pallas TRAIN_COMMUTE encoder end-to-end and saw
encoder-output max rel dev 6.1e-2 with clean loss (4e-5) and clean BN
batch stats. Hypothesis: the commute identity is exact only in real
arithmetic; its f32 rounding differs from the dense arm's by ~1e-6 per
stage, and the NEXT stage recomputes a kNN graph on those features —
near-tie neighbor selections flip DISCRETELY, and the flips cascade
through stages 2-4. That failure class is graph-tie sensitivity (the
reference's external knn_cuda wheel never had a bit-parity contract
either), not kernel wrongness.

This script separates the layers:

  A. kernel micro-parity: edge_gather_stats (Mosaic) vs a pure-jnp
     reference on identical inputs at stage shapes — fwd exact-ish
     (max/min bitwise, s1/s2 to reduction-order ulps) and VJP.
  B. same-graph stage parity: stage 1 sees the identical input in both
     arms -> identical graph; dev(x1) isolates identity+kernel numerics
     with no cascade.
  C. cascade attribution: per-stage kNN index disagreement counts and
     per-stage output devs between the free-running arms.
  D. pinned-graph e2e: re-run the pallas arm with the dense arm's
     graphs substituted -> if the output dev collapses to ulp scale,
     the e2e deviation is PURELY graph flips.
  E. triangulation: the XLA commute arm (same identity, no Mosaic
     kernels) vs dense — if it deviates like the pallas arm, the
     kernels are exonerated.

Run ON TPU in background:  python scripts/r5/diag_commute.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def kernel_micro_parity():
    from sparenet_tpu.ops.pallas.edge_train_pallas import edge_gather_stats
    from sparenet_tpu.ops.knn import knn_idx

    rs = np.random.RandomState(1)
    b, n, c, k = 8, 3000, 256, 8
    table = jnp.asarray(rs.randn(b, n, c), jnp.float32)
    pts = jnp.asarray(rs.rand(b, n, 3), jnp.float32)
    idx = jax.jit(lambda p: knn_idx(p, k=k))(pts)

    def ref(tb, ix):
        rows = jnp.take_along_axis(tb[:, :, None, :],
                                   ix[..., None], axis=1)    # [B,M,k,C]
        return (jnp.max(rows, 2), jnp.min(rows, 2),
                jnp.sum(rows, 2), jnp.sum(rows * rows, 2))

    outs_k = jax.jit(lambda t, i: edge_gather_stats(t, i))(table, idx)
    outs_r = jax.jit(ref)(table, idx)
    names = ("max", "min", "sum", "sumsq")
    ok = True
    for nm, a, bb in zip(names, outs_k, outs_r):
        a, bb = np.asarray(a), np.asarray(bb)
        dev = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-12)
        exact = " (bitwise)" if (a == bb).all() else ""
        print(f"  fwd {nm}: max rel dev {dev:.2e}{exact}", flush=True)
        ok &= dev < 1e-5

    # VJP: continuous random table + distinct kNN indices -> unique
    # extremal winners, so jnp-max grad routing matches the kernel's
    # first-extremal-slot convention
    ct = tuple(jnp.asarray(rs.randn(b, n, c), jnp.float32)
               for _ in range(4))

    def loss_k(t):
        o = edge_gather_stats(t, idx)
        return sum(jnp.vdot(a, b) for a, b in zip(o, ct))

    def loss_r(t):
        o = ref(t, idx)
        return sum(jnp.vdot(a, b) for a, b in zip(o, ct))

    gk = np.asarray(jax.jit(jax.grad(loss_k))(table))
    gr = np.asarray(jax.jit(jax.grad(loss_r))(table))
    dev = np.abs(gk - gr).max() / (np.abs(gr).max() + 1e-12)
    cos = float(np.vdot(gk, gr) /
                (np.linalg.norm(gk) * np.linalg.norm(gr) + 1e-30))
    print(f"  vjp: max rel dev {dev:.2e}  cosine {cos:.9f}", flush=True)
    ok &= dev < 1e-4 and cos > 0.999999
    print(f"A. KERNEL MICRO-PARITY {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    import sparenet_tpu.models.layers as L
    from sparenet_tpu.ops import common as opc

    print("== A. kernel micro-parity ==", flush=True)
    a_ok = kernel_micro_parity()

    rs = np.random.RandomState(0)
    b, n, h = 8, 3000, 4096
    x = jnp.asarray(rs.rand(b, n, 3) - 0.5, jnp.float32)
    model = L.EdgeConvResFeat(k=8, hide_size=h, output_size=h,
                              use_selayer=True, train=True)

    opc.TRAIN_COMMUTE = False
    opc.TRAIN_COMMUTE_IMPL = "0"
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def run(impl, pinned=None):
        opc.TRAIN_COMMUTE = impl != "0"
        opc.TRAIN_COMMUTE_IMPL = impl
        orig = L.knn_idx
        if pinned is not None:
            calls = []

            def fake_knn(feat, k):
                calls.append(0)
                return pinned[(len(calls) - 1) % 4]

            L.knn_idx = fake_knn
        try:
            @jax.jit
            def fwd(params):
                out, aux = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, mutable=["batch_stats", "intermediates"])
                inter = aux["intermediates"]
                return (out,
                        [inter[f"x{i}"][0] for i in range(1, 5)],
                        [inter[f"nbr{i}"][0] for i in range(1, 5)])

            out, xs, nbrs = fwd(variables["params"])
        finally:
            L.knn_idx = orig
        return (np.asarray(out), [np.asarray(v) for v in xs],
                [np.asarray(v) for v in nbrs])

    print("== B/C. free-running arms: per-stage devs + graph flips ==",
          flush=True)
    out_d, xs_d, nbr_d = run("0")
    out_p, xs_p, nbr_p = run("pallas")

    for i in range(4):
        dev = np.abs(xs_p[i] - xs_d[i]).max() / (np.abs(xs_d[i]).max()
                                                 + 1e-12)
        flips = int((nbr_p[i] != nbr_d[i]).sum())
        tot = nbr_d[i].size
        print(f"  stage {i+1}: out max rel dev {dev:.2e}   "
              f"graph flips {flips}/{tot} ({flips/tot:.2%})", flush=True)
    dev_e2e = np.abs(out_p - out_d).max() / (np.abs(out_d).max() + 1e-12)
    print(f"  encoder out max rel dev {dev_e2e:.2e} "
          f"(the round-4 gate saw 6.12e-02)", flush=True)
    b_ok = (np.abs(xs_p[0] - xs_d[0]).max()
            / (np.abs(xs_d[0]).max() + 1e-12)) < 1e-4
    print(f"B. SAME-GRAPH STAGE-1 PARITY {'PASS' if b_ok else 'FAIL'}",
          flush=True)

    print("== D. pinned-graph e2e (dense graphs into the pallas arm) ==",
          flush=True)
    pinned = [jnp.asarray(v) for v in nbr_d]
    out_pp, xs_pp, _ = run("pallas", pinned=pinned)
    for i in range(4):
        dev = np.abs(xs_pp[i] - xs_d[i]).max() / (np.abs(xs_d[i]).max()
                                                  + 1e-12)
        print(f"  stage {i+1}: out max rel dev {dev:.2e}", flush=True)
    dev_pin = np.abs(out_pp - out_d).max() / (np.abs(out_d).max() + 1e-12)
    print(f"  encoder out max rel dev {dev_pin:.2e}", flush=True)
    d_ok = dev_pin < 1e-3
    print(f"D. PINNED-GRAPH E2E {'PASS' if d_ok else 'FAIL'}", flush=True)

    print("== E. XLA commute arm (no Mosaic kernels) ==", flush=True)
    out_x, xs_x, nbr_x = run("xla")
    for i in range(4):
        dev = np.abs(xs_x[i] - xs_d[i]).max() / (np.abs(xs_d[i]).max()
                                                 + 1e-12)
        flips = int((nbr_x[i] != nbr_d[i]).sum())
        print(f"  stage {i+1}: out max rel dev {dev:.2e}   "
              f"graph flips {flips}/{nbr_d[i].size}", flush=True)
    dev_x = np.abs(out_x - out_d).max() / (np.abs(out_d).max() + 1e-12)
    print(f"  encoder out max rel dev {dev_x:.2e}", flush=True)

    verdict = ("GRAPH-FLIP CASCADE (kernels exact)"
               if (a_ok and b_ok and d_ok) else "KERNEL/IDENTITY DEFECT")
    print(f"DIAG VERDICT: {verdict}", flush=True)


if __name__ == "__main__":
    main()
