"""Training-step throughput for the flagship SpareNet (VERDICT r2 #9).

The framework is a *training* framework: this records clouds/s for the
jitted SpareNet train step (loss + grad + adam update, runner-identical
assembly) at production shapes, for both training metrics, so training
throughput regressions are visible round-over-round.

  python scripts/bench_train.py            # chamfer + emd, B=32
  B=24 METRIC=chamfer python scripts/bench_train.py

Run ON TPU (background, natural completion). Reference recipe:
configs/sparenet.yaml metric=emd batch 24 (BASELINE.md training row);
runner step: /root/reference/runners/sparenet_runner.py:42-55.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    batch = int(os.environ.get("B", "32"))
    metrics = (os.environ["METRIC"].split(",")
               if "METRIC" in os.environ else ["chamfer", "emd"])
    # WEIGHTS=<orbax dir>: measure the TRAINED regime — the EMD metric
    # is auction-round bound and regime-dependent (GAN_PROFILE.md), so
    # the random-init number is its worst case, not its typical cost
    weights = os.environ.get("WEIGHTS", "")

    import jax
    import jax.numpy as jnp

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.models import define_G
    from sparenet_tpu.runners.base import apply_updates, make_optimizer
    from sparenet_tpu.runners.sparenet import completion_loss

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    # flagship production config (configs/sparenet.yaml): SE layers ON.
    # Round-3 STATUS numbers before 2026-08-19 were measured with the
    # bare default (no SE) — a slightly lighter generator.
    cfg.NETWORK.use_selayer = True
    # ... and 32 primitives (sparenet.yaml; the tree default is the
    # reference base_config's 16) — numbers before 2026-08-20 benched
    # the lighter 16-primitive decoder. 32 also matches the round-4
    # converged checkpoint consumed via WEIGHTS.
    cfg.NETWORK.n_primitives = 32
    cfg.TRAIN.batch_size = batch
    # SERVING_ALIGNED=1: bench the documented serving-aligned training
    # mode (cfg.TRAIN.serving_aligned — batched MDS in the train refine
    # loop; see docs/SERVING_ENVELOPE.md §4)
    aligned = os.environ.get("SERVING_ALIGNED", "0") == "1"
    cfg.TRAIN.serving_aligned = aligned

    rs = np.random.RandomState(0)
    partial = jnp.asarray(rs.rand(batch, 3000, 3) - 0.5, jnp.float32)
    gt = jnp.asarray(rs.rand(batch, 16384, 3) - 0.5, jnp.float32)

    model = define_G(cfg, train=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)
    if weights:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(weights))
        variables = jax.device_put(
            {"params": payload["state"]["params"],
             "batch_stats": payload["state"]["batch_stats"]})
        print(json.dumps({"note": f"trained regime: {weights}"}),
              flush=True)
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])

    for metric in metrics:
        cfg.NETWORK.metric = metric

        def step(params, batch_stats, opt_state, partial, gt):
            def loss_fn(p):
                (coarse, middle, refine, lm), upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, partial,
                    mutable=["batch_stats"])
                loss, c_l, r_l = completion_loss(
                    cfg, coarse, middle, refine, lm, gt)
                return loss, (upd["batch_stats"], c_l, r_l)

            (loss, (bs, _, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = apply_updates(
                tx, grads, opt_state, params, jnp.float32(1e-4))
            return loss, params, bs, opt_state

        jstep = jax.jit(step)
        p, bs, o = variables["params"], variables.get("batch_stats", {}), opt_state
        # warmup/compile
        loss, p, bs, o = jstep(p, bs, o, partial, gt)
        float(loss)
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, p, bs, o = jstep(p, bs, o, partial, gt)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": f"sparenet_train_{metric}",
            "value": round(batch / dt, 2),
            "unit": "clouds/sec/chip",
            "step_ms": round(dt * 1000, 1),
            "batch": batch,
            "regime": "trained" if weights else "init",
            "mode": "serving_aligned" if aligned else "parity",
            # the train-commute encoder arm in effect (0 = dense)
            "train_commute": __import__(
                "sparenet_tpu.ops.common", fromlist=["x"]
            ).TRAIN_COMMUTE_IMPL,
        }), flush=True)


if __name__ == "__main__":
    main()
