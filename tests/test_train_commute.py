"""TRAIN-mode commuted EdgeConv stage: exactness vs the dense path.

The factorized stage (SPARENET_TRAIN_COMMUTE, models/layers.py) must be
a pure speed/memory trade: same parameter tree, same outputs, same
batch-stat EMA updates, same gradients as the dense [B, N, k, C] chain
(up to f32 sum association; gradient tie-routing at exact max ties is
first-winner vs jnp.max's split — measure-zero on random data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparenet_tpu.models.layers import EdgeConvResFeat
from sparenet_tpu.ops import common as opc

B, N, K, H = 2, 48, 8, 128


def _build(rng, use_selayer):
    model = EdgeConvResFeat(k=K, hide_size=H, output_size=H,
                            use_selayer=use_selayer, train=True)
    x = jnp.asarray(rng.rand(B, N, 3) - 0.5, jnp.float32)
    return model, x


def _apply(model, variables, x):
    out, upd = model.apply(variables, x, mutable=["batch_stats"])
    return out, upd["batch_stats"]


@pytest.mark.parametrize("use_selayer", [False, True])
def test_train_commute_matches_dense(monkeypatch, rng, use_selayer):
    model, x = _build(rng, use_selayer)

    monkeypatch.setattr(opc, "TRAIN_COMMUTE", False)
    monkeypatch.setattr(opc, "TRAIN_COMMUTE_IMPL", "0")
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out_d, bs_d = _apply(model, variables, x)

    monkeypatch.setattr(opc, "TRAIN_COMMUTE", True)
    monkeypatch.setattr(opc, "TRAIN_COMMUTE_IMPL", "xla")
    v_c = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(v_c)
            == jax.tree_util.tree_structure(variables)), \
        "param/stat tree must be interchangeable between the paths"
    out_c, bs_c = _apply(model, variables, x)

    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=2e-4, atol=2e-5)
    for (pd, ld), (pc, lc) in zip(
            jax.tree_util.tree_leaves_with_path(bs_d),
            jax.tree_util.tree_leaves_with_path(bs_c)):
        assert pd == pc
        np.testing.assert_allclose(np.asarray(lc), np.asarray(ld),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pd))


@pytest.mark.parametrize("use_selayer", [False, True])
def test_train_commute_grads_match(monkeypatch, rng, use_selayer):
    model, x = _build(rng, use_selayer)
    monkeypatch.setattr(opc, "TRAIN_COMMUTE", False)
    monkeypatch.setattr(opc, "TRAIN_COMMUTE_IMPL", "0")
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    tgt = jnp.asarray(rng.rand(B, H), jnp.float32)

    def loss_fn(params, commute):
        monkeypatch.setattr(opc, "TRAIN_COMMUTE", commute)
        monkeypatch.setattr(opc, "TRAIN_COMMUTE_IMPL",
                            "xla" if commute else "0")
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"])
        return jnp.mean((out - tgt) ** 2)

    l_d, g_d = jax.value_and_grad(lambda p: loss_fn(p, False))(
        variables["params"])
    l_c, g_c = jax.value_and_grad(lambda p: loss_fn(p, True))(
        variables["params"])
    np.testing.assert_allclose(float(l_c), float(l_d), rtol=1e-5)
    for (pd, ld), (pc, lc) in zip(
            jax.tree_util.tree_leaves_with_path(g_d),
            jax.tree_util.tree_leaves_with_path(g_c)):
        assert pd == pc
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(ld), rtol=5e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pd))


def test_edge_gather_vjps(rng):
    """gather_rows_sum/scaled_max custom VJPs vs jax's native grads."""
    from sparenet_tpu.ops.edge_gather import (gather_rows_scaled_max,
                                              gather_rows_sum)
    g = jnp.asarray(rng.rand(2, 16, 8), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 16, (2, 16, 4)), jnp.int32)

    def ref_sum(g):
        return jnp.sum(jnp.take_along_axis(
            g[:, :, None, :], idx[..., None], axis=1), axis=2)

    def ref_max(g):
        return jnp.max(jnp.take_along_axis(
            g[:, :, None, :], idx[..., None], axis=1), axis=2)

    co = jnp.asarray(rng.rand(2, 16, 8), jnp.float32)
    for fn, ref in ((gather_rows_sum, ref_sum),
                    (gather_rows_scaled_max, ref_max)):
        v, vjp = jax.vjp(lambda gg: fn(gg, idx), g)
        v_r, vjp_r = jax.vjp(ref, g)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_r),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vjp(co)[0]),
                                   np.asarray(vjp_r(co)[0]),
                                   rtol=1e-5, atol=1e-6)


def test_edge_gather_stats_kernel_interpret(rng):
    """Pallas fused stats kernel (interpret mode) vs XLA reference:
    forward values and VJP routing must match ops/edge_gather.py
    conventions (first-slot extrema routing, broadcast sum, 2*row*g
    for sumsq)."""
    from sparenet_tpu.ops.pallas.edge_train_pallas import edge_gather_stats

    B_, N_, M_, K_, C_ = 2, 40, 24, 8, 136   # C not a lane multiple
    g = jnp.asarray(rng.rand(B_, N_, C_), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N_, (B_, M_, K_)), jnp.int32)

    def ref(gg):
        gj = jnp.take_along_axis(gg[:, :, None, :], idx[..., None], axis=1)
        return (jnp.max(gj, 2), jnp.min(gj, 2), jnp.sum(gj, 2),
                jnp.sum(gj * gj, 2))

    outs = edge_gather_stats(g, idx, True)
    refs = ref(g)
    for o, r, name in zip(outs, refs, ("max", "min", "sum", "sumsq")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    # VJP: compare against the same composite loss through the XLA ref
    co = [jnp.asarray(rng.rand(B_, M_, C_), jnp.float32) for _ in range(4)]

    def loss_k(gg):
        mx, mn, s1, s2 = edge_gather_stats(gg, idx, True)
        return jnp.sum(mx * co[0]) + jnp.sum(mn * co[1]) \
            + jnp.sum(s1 * co[2]) + jnp.sum(s2 * co[3])

    def loss_r(gg):
        mx, mn, s1, s2 = ref(gg)
        return jnp.sum(mx * co[0]) + jnp.sum(mn * co[1]) \
            + jnp.sum(s1 * co[2]) + jnp.sum(s2 * co[3])

    gk = jax.grad(loss_k)(g)
    gr = jax.grad(loss_r)(g)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)
