"""Model-zoo smoke tests: shapes, determinism, gradient flow.

Tiny problem sizes; the architecture scales only through config fields.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparenet_tpu.models import (
    AtlasNet, GRNet, MSN, SpareNetGenerator, PatchDiscriminator, ProjectionD,
)

B, N_IN, N_OUT, PRIMS = 2, 128, 256, 4


def _init_apply(model, partial, rngs):
    variables = model.init(rngs, partial)
    return variables


def test_atlasnet_shapes(rng):
    partial = jnp.asarray(rng.rand(B, N_IN, 3), jnp.float32)
    model = AtlasNet(num_points=N_OUT, bottleneck_size=64, n_primitives=PRIMS)
    keys = {"params": jax.random.PRNGKey(0), "grid": jax.random.PRNGKey(1)}
    variables = model.init(keys, partial)
    out, updates = model.apply(
        variables, partial, rngs={"grid": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (B, N_OUT, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert "batch_stats" in updates


def test_msn_shapes(rng):
    partial = jnp.asarray(rng.rand(B, N_IN, 3), jnp.float32)
    model = MSN(num_points=N_OUT, bottleneck_size=64, n_primitives=PRIMS)
    keys = {"params": jax.random.PRNGKey(0), "grid": jax.random.PRNGKey(1)}
    variables = model.init(keys, partial)
    (coarse, refine, loss_mst), _ = model.apply(
        variables, partial, rngs={"grid": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert coarse.shape == (B, N_OUT, 3)
    assert refine.shape == (B, N_OUT, 3)
    assert float(loss_mst) >= 0


@pytest.mark.parametrize("use_adain", ["share", "no_share", "no_use"])
def test_sparenet_modes(rng, use_adain):
    partial = jnp.asarray(rng.rand(B, N_IN, 3), jnp.float32)
    model = SpareNetGenerator(
        num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=128,
        hide_size=128, use_adain=use_adain, encode="Pointfeat",
        use_selayer=True,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)
    (coarse, middle, refine, loss_mst), _ = model.apply(
        variables, partial, mutable=["batch_stats"]
    )
    assert coarse.shape == middle.shape == refine.shape == (B, N_OUT, 3)
    assert np.isfinite(np.asarray(refine)).all()


def test_sparenet_residualnet_encoder(rng):
    partial = jnp.asarray(rng.rand(B, 64, 3), jnp.float32)
    model = SpareNetGenerator(
        num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=128,
        hide_size=128, use_adain="share", encode="Residualnet",
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)
    (coarse, middle, refine, _), _ = model.apply(
        variables, partial, mutable=["batch_stats"]
    )
    assert refine.shape == (B, N_OUT, 3)


def test_sparenet_grad_flows(rng):
    partial = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, N_OUT, 3), jnp.float32)
    model = SpareNetGenerator(
        num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=64,
        hide_size=64, use_adain="share", encode="Pointfeat",
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)

    def loss_fn(params):
        (c, m, r, lm), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            partial, mutable=["batch_stats"],
        )
        return jnp.mean((r - gt) ** 2) + 0.1 * lm

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_sparenet_remat_grads_exact(rng):
    """cfg.TPU.remat must be a pure memory/time trade: same params tree,
    bit-identical loss and gradients vs the un-rematted model."""
    partial = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(2, N_OUT, 3), jnp.float32)

    def build(remat):
        return SpareNetGenerator(
            num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=64,
            hide_size=64, use_adain="share", encode="Residualnet",
            use_selayer=True, remat=remat,
        )

    variables = build(False).init({"params": jax.random.PRNGKey(0)}, partial)

    def loss_fn(params, remat):
        (c, m, r, lm), _ = build(remat).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            partial, mutable=["batch_stats"],
        )
        return jnp.mean((r - gt) ** 2) + 0.1 * lm

    # remat-on init produces the identical parameter structure
    v_r = build(True).init({"params": jax.random.PRNGKey(0)}, partial)
    assert (jax.tree_util.tree_structure(v_r["params"])
            == jax.tree_util.tree_structure(variables["params"]))

    l0, g0 = jax.value_and_grad(loss_fn)(variables["params"], False)
    l1, g1 = jax.value_and_grad(loss_fn)(variables["params"], True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grnet_shapes(rng):
    partial = jnp.asarray(rng.rand(B, N_IN, 3) * 1.4 - 0.7, jnp.float32)
    model = GRNet(n_sampling_points=64, gridding_scale=16)
    keys = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(keys, partial)
    (sparse, dense), _ = model.apply(
        variables, partial, rngs={"sample": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert sparse.shape == (B, 64, 3)
    assert dense.shape == (B, 512, 3)
    assert np.isfinite(np.asarray(dense)).all()


def test_patch_discriminator(rng):
    img = jnp.asarray(rng.rand(B, 64, 64, 16), jnp.float32)
    model = PatchDiscriminator()
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    (validity, feats), _ = model.apply(
        variables, img, feat=True, mutable=["batch_stats", "spectral"]
    )
    assert validity.shape == (B, 1)
    assert len(feats) == 4
    assert feats[0].shape == (B, 32, 32, 16)


def test_projection_discriminator(rng):
    img = jnp.asarray(rng.rand(B, 64, 64, 16), jnp.float32)
    y = jnp.asarray([0, 3], jnp.int32)
    model = ProjectionD(num_classes=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, y=y,
    )
    validity, _ = model.apply(
        variables, img, y=y,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats", "spectral"],
    )
    assert validity.shape == (B, 1)


def test_spectral_norm_updates(rng):
    """u must change across applications when update_stats=True."""
    img = jnp.asarray(rng.rand(1, 32, 32, 4), jnp.float32)
    model = PatchDiscriminator()
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    _, upd = model.apply(variables, img, mutable=["batch_stats", "spectral"])
    u0 = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u1 = jax.tree_util.tree_leaves(upd["spectral"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


def test_sparenet_eval_fast_full_model_parity(rng, monkeypatch):
    """EVAL_FAST must not change the full eval-mode SpareNet forward
    (integration check on top of the encoder-level parity test)."""
    from sparenet_tpu.ops import common as opc

    partial = jnp.asarray(rng.rand(B, 64, 3), jnp.float32)
    model = SpareNetGenerator(
        num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=128,
        hide_size=128, use_adain="share", encode="Residualnet",
        use_selayer=True, train=False,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)

    monkeypatch.setattr(opc, "ENC_COMMUTE", False)  # isolate EVAL_FAST
    monkeypatch.setattr(opc, "EVAL_FAST", False)
    ref = model.apply(variables, partial)
    monkeypatch.setattr(opc, "EVAL_FAST", True)
    fast = model.apply(variables, partial)
    # coarse (pre-refine) is a continuous function of the encoder and
    # must match tightly; the refine stages run MDS, whose greedy
    # argmin can flip on near-tied densities under ~1e-7 reassociation
    # wobble (same envelope as documented for the exp2 dot-form Pallas
    # kernel) — so downstream outputs are checked set-wise via chamfer
    # rather than pointwise.
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-5)
    from sparenet_tpu.ops.chamfer import chamfer_distance
    for a, b in zip(ref[1:3], fast[1:3]):
        assert float(chamfer_distance(a, b)) < 1e-9
    np.testing.assert_allclose(np.asarray(fast[3]), np.asarray(ref[3]),
                               rtol=1e-4, atol=1e-7)


def test_edgeconv_eval_fast_path_parity(rng, monkeypatch):
    """The eval-mode extrema formulation must match the dense
    [B, N, k, C] edge-tensor path (models/layers.py EdgeConv fast path).

    Randomized running stats and sign-mixed BN scales exercise both the
    e_max (scale >= 0) and e_min (scale < 0) selection branches; SE is
    on so the degree-weighted global edge mean is checked too.
    """
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.ops import common as opc

    x = jnp.asarray(rng.rand(2, 64, 3) * 2 - 1, jnp.float32)
    enc = EdgeConvResFeat(hide_size=64, output_size=64,
                          use_selayer=True, train=False)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)

    # randomize BN affine params + running stats (defaults are identity)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rs = np.random.RandomState(1)
    leaves = [jnp.asarray(rs.randn(*l.shape) * 0.5, l.dtype)
              if l.dtype == jnp.float32 else l for l in leaves]
    # variance-like leaves must be positive: shift batch_stats vars
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    bs = jax.tree_util.tree_map(lambda v: jnp.abs(v) + 0.1,
                                variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    monkeypatch.setattr(opc, "ENC_COMMUTE", False)  # isolate EVAL_FAST
    monkeypatch.setattr(opc, "EVAL_FAST", False)
    ref = enc.apply(variables, x)
    monkeypatch.setattr(opc, "EVAL_FAST", True)
    fast = enc.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edgeconv_commute_path_parity(rng, monkeypatch):
    """The eval-mode max-commute formulation (single pre-scaled gather,
    EdgeConv1x1._commute) must match the dense [B, N, k, C] path.

    Randomized running stats give sign-mixed BN eval scales — negative
    scales are handled by pre-negation inside the scaled gather; SE on
    checks the z_mean squeeze statistic."""
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.ops import common as opc

    x = jnp.asarray(rng.rand(2, 64, 3) * 2 - 1, jnp.float32)
    enc = EdgeConvResFeat(hide_size=64, output_size=64,
                          use_selayer=True, train=False)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)

    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rs = np.random.RandomState(1)
    leaves = [jnp.asarray(rs.randn(*l.shape) * 0.5, l.dtype)
              if l.dtype == jnp.float32 else l for l in leaves]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    bs = jax.tree_util.tree_map(lambda v: jnp.abs(v) + 0.1,
                                variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    monkeypatch.setattr(opc, "ENC_COMMUTE", False)
    ref = enc.apply(variables, x)
    monkeypatch.setattr(opc, "ENC_COMMUTE", True)
    fast = enc.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sparenet_enc_commute_full_model_parity(rng, monkeypatch):
    """ENC_COMMUTE must not change the full eval-mode SpareNet forward
    (same contract as the EVAL_FAST integration test)."""
    from sparenet_tpu.ops import common as opc

    partial = jnp.asarray(rng.rand(B, 64, 3), jnp.float32)
    model = SpareNetGenerator(
        num_points=N_OUT, n_primitives=PRIMS, bottleneck_size=128,
        hide_size=128, use_adain="share", encode="Residualnet",
        use_selayer=True, train=False,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)

    monkeypatch.setattr(opc, "ENC_COMMUTE", False)
    ref = model.apply(variables, partial)
    monkeypatch.setattr(opc, "ENC_COMMUTE", True)
    fast = model.apply(variables, partial)
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-5)
    from sparenet_tpu.ops.chamfer import chamfer_distance
    for a, b in zip(ref[1:3], fast[1:3]):
        assert float(chamfer_distance(a, b)) < 1e-9
    np.testing.assert_allclose(np.asarray(fast[3]), np.asarray(ref[3]),
                               rtol=1e-4, atol=1e-7)


def test_define_g_mml_calibration_plumbing():
    # NETWORK.mml_calibration = 0 keeps each family's own class default;
    # > 0 overrides it (serving-mode knob, docs/SERVING_ENVELOPE.md)
    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.models import define_G

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    assert define_G(cfg, train=False).mml_calibration == 1.33
    cfg.NETWORK.mml_calibration = 2.5
    assert define_G(cfg, train=False).mml_calibration == 2.5
    cfg.NETWORK.model_type = "MSN"
    assert define_G(cfg, train=False).mml_calibration == 2.5
    cfg.NETWORK.mml_calibration = 0.0
    assert define_G(cfg, train=False).mml_calibration == 5.65
