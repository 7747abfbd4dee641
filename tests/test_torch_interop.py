"""Reference-checkpoint interop tests (utils/torch_import).

Two layers of guarantees:
  - structural: convert(export(init)) reproduces the flax variable tree
    exactly, for every SpareNet config family — so a real reference
    state_dict with those keys/shapes maps onto the model;
  - numeric: each transform orientation (Linear / 1x1 Conv1d / edge-
    feature Conv2d / BatchNorm) is checked against actual torch (CPU)
    semantics, so the mapping is right, not just shape-compatible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparenet_tpu.models import SpareNetGenerator
from sparenet_tpu.utils.torch_import import (
    convert_netG_state_dict,
    export_netG_state_dict,
)

torch = pytest.importorskip("torch")

PRIMS = 4


def _model(use_adain, encode, use_selayer):
    return SpareNetGenerator(
        num_points=256, n_primitives=PRIMS, bottleneck_size=128,
        hide_size=128, use_adain=use_adain, encode=encode,
        use_selayer=use_selayer, train=False,
    )


@pytest.mark.parametrize("use_adain,encode,use_selayer", [
    ("share", "Residualnet", True),
    ("share", "Pointfeat", False),
    ("no_share", "Pointfeat", True),
    ("no_use", "Pointfeat", True),
])
def test_export_convert_roundtrip(rng, use_adain, encode, use_selayer):
    model = _model(use_adain, encode, use_selayer)
    x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    ref = {"params": variables["params"],
           "batch_stats": variables["batch_stats"]}

    kw = dict(use_adain=use_adain, encode=encode, use_selayer=use_selayer,
              n_primitives=PRIMS)
    sd = export_netG_state_dict(ref, **kw)
    # reference-registered dummies are present for strict torch loads
    assert "conv1.weight" in sd and sd["conv1.weight"].shape == (64, 3, 1)
    assert "refine.residual.bn7.running_var" in sd
    assert "refine.residual.bn1.num_batches_tracked" in sd

    back = convert_netG_state_dict(sd, **kw)
    assert (jax.tree_util.tree_structure(back) ==
            jax.tree_util.tree_structure(ref))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("family", ["atlasnet", "msn"])
def test_atlasnet_msn_roundtrip(rng, family):
    from sparenet_tpu.models import MSN, AtlasNet
    from sparenet_tpu.utils.torch_import import (
        convert_atlasnet_state_dict, convert_msn_state_dict,
        export_atlasnet_state_dict, export_msn_state_dict,
    )

    if family == "atlasnet":
        model = AtlasNet(num_points=256, bottleneck_size=64,
                         n_primitives=PRIMS)
        exp, conv = export_atlasnet_state_dict, convert_atlasnet_state_dict
    else:
        model = MSN(num_points=256, bottleneck_size=64, n_primitives=PRIMS)
        exp, conv = export_msn_state_dict, convert_msn_state_dict

    x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    keys = {"params": jax.random.PRNGKey(0), "grid": jax.random.PRNGKey(1)}
    variables = model.init(keys, x)
    ref = {"params": variables["params"],
           "batch_stats": variables["batch_stats"]}

    sd = exp(ref, n_primitives=PRIMS)
    assert "encoder.feat_extractor.conv1.weight" in sd
    assert "decoder.0.conv1.weight" in sd
    if family == "msn":
        assert "res.bn7.running_var" in sd  # registered-but-unused dummy
    back = conv(sd, n_primitives=PRIMS)
    assert (jax.tree_util.tree_structure(back) ==
            jax.tree_util.tree_structure(ref))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_accepts_module_prefix_and_rejects_unknown(rng):
    model = _model("share", "Pointfeat", False)
    x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    kw = dict(use_adain="share", encode="Pointfeat", use_selayer=False,
              n_primitives=PRIMS)
    sd = export_netG_state_dict(variables, **kw)

    prefixed = {"module." + k: v for k, v in sd.items()}
    back = convert_netG_state_dict(prefixed, **kw)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["encoder"]["Linear_0"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["Linear_0"]["kernel"]))

    sd["decoder.bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_netG_state_dict(sd, **kw)


def test_checkpoint_load_reference_pth(rng, tmp_path):
    """checkpoint_load imports a reference-layout .pth (net_G only;
    optimizer state stays fresh, reference utils/misc.py:96-104)."""
    from sparenet_tpu.configs import default_config
    from sparenet_tpu.runners.base import TrainState
    from sparenet_tpu.utils.checkpoint import checkpoint_load

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.use_adain = "share"
    cfg.NETWORK.encode = "Pointfeat"
    cfg.NETWORK.use_selayer = False
    cfg.NETWORK.n_primitives = PRIMS

    model = _model("share", "Pointfeat", False)
    x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    sd = export_netG_state_dict(
        variables, use_adain="share", encode="Pointfeat",
        use_selayer=False, n_primitives=PRIMS)
    path = tmp_path / "ckpt-best.pth"
    torch.save(
        {"epoch_index": 7,
         "best_metrics": {"ChamferDistance": 1.5},
         "net_G": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        path)

    template = TrainState(
        params=jax.tree_util.tree_map(jnp.zeros_like, variables["params"]),
        batch_stats=jax.tree_util.tree_map(
            jnp.zeros_like, variables["batch_stats"]),
        opt_state=(), rng=jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32))
    cfg.CONST.weights = str(path)
    epoch, best, state = checkpoint_load(cfg, template)
    assert epoch == 7
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["Linear_0"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["Linear_0"]["kernel"]))


def test_linear_and_conv1d_orientation_vs_torch(rng):
    """flax Dense with a converted torch weight must equal the torch
    layer (channel-last vs channel-first accounted for)."""
    from sparenet_tpu.models.layers import Conv1d, Linear
    from sparenet_tpu.utils.torch_import import _to_flax

    x = rng.rand(2, 5, 7).astype(np.float32)           # [B, N, Cin]

    tlin = torch.nn.Linear(7, 3)
    want = tlin(torch.from_numpy(x)).detach().numpy()
    lin = Linear(3)
    v = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {"params": {
        "kernel": _to_flax("lin_w", tlin.weight.detach().numpy()),
        "bias": tlin.bias.detach().numpy()}}
    got = np.asarray(lin.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    tconv = torch.nn.Conv1d(7, 3, 1)
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    conv = Conv1d(3)
    v = {"params": {
        "kernel": _to_flax("conv1d_w", tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy()}}
    got = np.asarray(conv.apply(v, jnp.asarray(x)))    # [B, N, 3]
    np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                               rtol=1e-5, atol=1e-6)


def test_edgeconv_kernel_orientation_vs_torch(rng):
    """EdgeConv1x1 with a converted torch Conv2d weight must equal the
    reference's conv over edge features concat(x_j - x_i, x_i)
    (models/sparenet_generator.py:880-906, edge channel order diff
    first, then x_i)."""
    from sparenet_tpu.models.layers import EdgeConv1x1
    from sparenet_tpu.utils.torch_import import _to_flax

    b, n, c, k, out = 2, 10, 4, 3, 6
    x = rng.rand(b, n, c).astype(np.float32)
    idx = rng.randint(0, n, size=(b, n, k)).astype(np.int32)

    tconv = torch.nn.Conv2d(2 * c, out, kernel_size=1, bias=False)
    xj = np.take_along_axis(x[:, :, None, :],
                            idx[..., None].astype(np.int64), axis=1)
    edge = np.concatenate([xj - x[:, :, None, :],
                           np.broadcast_to(x[:, :, None, :], xj.shape)],
                          axis=-1)                      # [B,N,k,2c]
    te = torch.from_numpy(edge.transpose(0, 3, 1, 2))   # [B,2c,N,k]
    want = tconv(te).detach().numpy().transpose(0, 2, 3, 1)

    conv = EdgeConv1x1(out)
    v = {"params": {"kernel": _to_flax(
        "conv2d_w", tconv.weight.detach().numpy())}}
    got = np.asarray(conv.apply(v, jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_vs_torch(rng):
    from sparenet_tpu.models.layers import batch_norm_1d

    x = rng.rand(2, 5, 6).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(6).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.rand(6).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.running_mean.copy_(
            torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.running_var.copy_(
            torch.from_numpy((rng.rand(6) + 0.5).astype(np.float32)))
    want = tbn(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()

    bn = batch_norm_1d(train=False)
    v = {"params": {"scale": tbn.weight.detach().numpy(),
                    "bias": tbn.bias.detach().numpy()},
         "batch_stats": {"mean": tbn.running_mean.numpy(),
                         "var": tbn.running_var.numpy()}}
    got = np.asarray(bn.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                               rtol=1e-5, atol=1e-6)
