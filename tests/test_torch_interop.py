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


# ---------------------------------------------------------------------------
# GRNet (models/grnet_generator.py:8-114)


class _TorchGRNetStack(object):
    """torch replica of the reference GRNet's parametrized layers
    (grnet_generator.py:12-67) at a reduced gridding scale, with the
    reference's attribute names so state_dict keys match."""

    def __new__(cls, scale):
        import torch.nn as tnn

        flat = 256 * (scale // 16) ** 3
        m = torch.nn.Module()
        chans = [(1, 32), (32, 64), (64, 128), (128, 256)]
        for i, (ci, co) in enumerate(chans):
            setattr(m, f"conv{i + 1}", tnn.Sequential(
                tnn.Conv3d(ci, co, kernel_size=4, padding=2),
                tnn.BatchNorm3d(co), tnn.LeakyReLU(0.2),
                tnn.MaxPool3d(kernel_size=2)))
        m.fc5 = tnn.Sequential(tnn.Linear(flat, 2048), tnn.ReLU())
        m.fc6 = tnn.Sequential(tnn.Linear(2048, flat), tnn.ReLU())
        dchans = [(256, 128), (128, 64), (64, 32), (32, 1)]
        for i, (ci, co) in enumerate(dchans):
            setattr(m, f"dconv{i + 7}", tnn.Sequential(
                tnn.ConvTranspose3d(ci, co, kernel_size=4, stride=2,
                                    bias=False, padding=1),
                tnn.BatchNorm3d(co), tnn.ReLU()))
        m.fc11 = tnn.Sequential(tnn.Linear(1792, 1792), tnn.ReLU())
        m.fc12 = tnn.Sequential(tnn.Linear(1792, 448), tnn.ReLU())
        m.fc13 = tnn.Sequential(tnn.Linear(448, 112), tnn.ReLU())
        m.fc14 = tnn.Linear(112, 24)
        # non-trivial BN running stats so eval-mode BN is exercised
        for mod in m.modules():
            if isinstance(mod, (tnn.BatchNorm3d,)):
                with torch.no_grad():
                    mod.running_mean.uniform_(-0.3, 0.3)
                    mod.running_var.uniform_(0.5, 1.5)
        return m.eval()


def test_grnet_roundtrip(rng):
    from sparenet_tpu.models.grnet import GRNet
    from sparenet_tpu.utils.torch_import import (
        convert_grnet_state_dict, export_grnet_state_dict)

    model = GRNet(n_sampling_points=16, gridding_scale=32, train=False)
    x = jnp.asarray(rng.rand(1, 32, 3) - 0.5, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    ref = {"params": variables["params"],
           "batch_stats": variables["batch_stats"]}

    sd = export_grnet_state_dict(ref)
    assert "conv1.0.weight" in sd and sd["conv1.0.weight"].shape == (32, 1, 4, 4, 4)
    assert "dconv7.0.weight" in sd and sd["dconv7.0.weight"].shape == (256, 128, 4, 4, 4)
    assert "fc14.weight" in sd

    back = convert_grnet_state_dict(sd)
    assert (jax.tree_util.tree_structure(back) ==
            jax.tree_util.tree_structure(ref))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_grnet_state_dict_loads_into_model(rng):
    """A synthesized reference state_dict converts strictly and matches
    the flax model's variable tree (paths AND shapes)."""
    from sparenet_tpu.models.grnet import GRNet
    from sparenet_tpu.utils.torch_import import convert_grnet_state_dict

    scale = 32
    tm = _TorchGRNetStack(scale)
    got = convert_grnet_state_dict(tm.state_dict(), strict=True)

    model = GRNet(n_sampling_points=16, gridding_scale=scale, train=False)
    x = jnp.asarray(rng.rand(1, 32, 3) - 0.5, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    ref = {"params": variables["params"],
           "batch_stats": variables["batch_stats"]}
    assert (jax.tree_util.tree_structure(got) ==
            jax.tree_util.tree_structure(ref))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        assert np.asarray(a).shape == np.asarray(b).shape

    # and the model runs with the converted weights
    out_sparse, out_dense = model.apply(
        got, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out_dense.shape == (1, 16 * 8, 3)
    assert np.all(np.isfinite(np.asarray(out_dense)))


def test_grnet_unet_forward_parity_vs_torch(rng):
    """Full U-Net stack (conv1-4, fc5/6, dconv7-10) forward parity:
    converted weights reproduce the torch replica's outputs on the same
    voxel volume, including the fc flatten permutation and the
    ConvTranspose tap flip."""
    from sparenet_tpu.models.grnet import _ConvBlock, _DeconvBlock
    from sparenet_tpu.models.layers import Linear
    from sparenet_tpu.utils.torch_import import convert_grnet_state_dict

    scale = 32
    tm = _TorchGRNetStack(scale)
    v = convert_grnet_state_dict(tm.state_dict(), strict=True)

    vol = rng.rand(1, 1, scale, scale, scale).astype(np.float32)

    with torch.no_grad():
        t64 = torch.from_numpy(vol)
        t32 = tm.conv1(t64)
        t16 = tm.conv2(t32)
        t8 = tm.conv3(t16)
        t4 = tm.conv4(t8)
        feat = tm.fc5(t4.reshape(1, -1))
        t4r = tm.fc6(feat).reshape(t4.shape) + t4
        t8r = tm.dconv7(t4r) + t8
        t16r = tm.dconv8(t8r) + t16
        t32r = tm.dconv9(t16r) + t32
        t64r = tm.dconv10(t32r) + t64

    def sub(name):
        return {"params": v["params"][name],
                "batch_stats": v["batch_stats"][name]}

    jvol = jnp.asarray(vol.transpose(0, 2, 3, 4, 1))     # NDHWC
    f32 = _ConvBlock(32, train=False).apply(sub("_ConvBlock_0"), jvol)
    f16 = _ConvBlock(64, train=False).apply(sub("_ConvBlock_1"), f32)
    f8 = _ConvBlock(128, train=False).apply(sub("_ConvBlock_2"), f16)
    f4 = _ConvBlock(256, train=False).apply(sub("_ConvBlock_3"), f8)
    lin0 = {"params": v["params"]["Linear_0"]}
    lin1 = {"params": v["params"]["Linear_1"]}
    jfeat = jax.nn.relu(Linear(2048).apply(lin0, f4.reshape(1, -1)))
    f4r = jax.nn.relu(
        Linear(f4.size).apply(lin1, jfeat)).reshape(f4.shape) + f4
    f8r = _DeconvBlock(128, train=False).apply(sub("_DeconvBlock_0"), f4r) + f8
    f16r = _DeconvBlock(64, train=False).apply(sub("_DeconvBlock_1"), f8r) + f16
    f32r = _DeconvBlock(32, train=False).apply(sub("_DeconvBlock_2"), f16r) + f32
    f64r = _DeconvBlock(1, train=False).apply(sub("_DeconvBlock_3"), f32r) + jvol

    pairs = [(t32, f32), (t4, f4), (t4r, f4r), (t16r, f16r), (t64r, f64r)]
    for t, f in pairs:
        tn = t.numpy().transpose(0, 2, 3, 4, 1)          # -> NDHWC
        np.testing.assert_allclose(np.asarray(f), tn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jfeat), feat.numpy(),
                               atol=2e-4, rtol=1e-4)
