"""cfg.TRAIN.serving_aligned — the documented serving-aligned training
mode (round 4 measured it ad hoc via SPARENET_MDS_IMPL=batched; round 5
promotes it, docs/SERVING_ENVELOPE.md §4): the TRAIN model's refine
resample runs the batch-greedy MDS while eval models keep exact
reference semantics (MDS_cuda.cu:104-211)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cfg(aligned):
    from sparenet_tpu.configs.defaults import default_config

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.metric = "chamfer"
    cfg.DATASET.n_outpoints = 256
    cfg.CONST.n_input_points = 64
    cfg.NETWORK.n_primitives = 4
    cfg.TRAIN.batch_size = 2
    cfg.TRAIN.serving_aligned = aligned
    return cfg


def test_define_g_threads_the_knob():
    from sparenet_tpu.models import define_G

    cfg = _cfg(True)
    assert define_G(cfg, train=True).mds_impl == "batched"
    # eval model unaffected: parity-mode eval keeps exact greedy
    assert define_G(cfg, train=False).mds_impl == "auto"
    cfg2 = _cfg(False)
    assert define_G(cfg2, train=True).mds_impl == "auto"

    cfg_msn = _cfg(True)
    cfg_msn.NETWORK.model_type = "MSN"
    assert define_G(cfg_msn, train=True).mds_impl == "batched"


def test_aligned_train_step_runs_and_differs_only_by_selection():
    """One tiny train step in both modes: finite loss/grads in each;
    the aligned step really uses the batched selection (selection sets
    differ from exact greedy at this temperature)."""
    from sparenet_tpu.models import define_G
    from sparenet_tpu.runners.sparenet import completion_loss

    rs = np.random.RandomState(0)
    partial = jnp.asarray(rs.rand(2, 64, 3) - 0.5, jnp.float32)
    gt = jnp.asarray(rs.rand(2, 256, 3) - 0.5, jnp.float32)

    losses = {}
    for aligned in (False, True):
        cfg = _cfg(aligned)
        model = define_G(cfg, train=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, partial)

        def loss_fn(p):
            (c, m, r, lm), _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                partial, mutable=["batch_stats"])
            loss, _, _ = completion_loss(cfg, c, m, r, lm, gt)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"])
        assert np.isfinite(float(loss))
        gnorm = float(
            jnp.sqrt(sum(jnp.vdot(g, g)
                         for g in jax.tree_util.tree_leaves(grads))).real)
        assert np.isfinite(gnorm) and gnorm > 0
        losses[aligned] = float(loss)
    # both modes train on the same data; the losses are close but NOT
    # identical (different selection sets feed the refiner)
    assert losses[True] != pytest.approx(losses[False], abs=0)
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.5)
