"""Reference-checkpoint interop for SpareNetGenerator weights.

Converts between the reference's torch ``net_G`` state_dict layout
(models/sparenet_generator.py; saved as ``checkpoint["net_G"]`` by
utils/misc.py:80-109, possibly under DataParallel's ``module.`` prefix)
and this framework's flax ``{"params", "batch_stats"}`` variables — so
pretrained reference checkpoints run here, and checkpoints trained here
can be exported back into the reference's tooling.

Layout rules (verified against the reference source):
  - torch Linear weight [out, in]        <-> flax Dense kernel [in, out]
  - torch 1x1 Conv1d/2d [out, in, 1(,1)] <-> flax Dense kernel [in, out]
  - EdgeConv1x1 factorized kernel [2c, out] is exactly the transposed
    1x1 Conv2d weight over edge features concat(x_j - x_i, x_i)
    (models/sparenet_generator.py:880-906): rows [:c] multiply the diff
    channels, rows [c:] the x_i channels.
  - BatchNorm: weight/bias/running_mean/running_var <->
    scale/bias + batch_stats mean/var.
  - The reference's 32 per-primitive decoders (nn.ModuleList,
    models/sparenet_generator.py:313-350) are one vmapped module here:
    per-primitive tensors stack along a leading [P, ...] axis.

Keys with no flax counterpart (ignored on import, synthesized with
their reference defaults on export): the generator's unused top-level
``conv1`` (models/sparenet_generator.py:43), PointNetRes's registered-
but-unused ``bn7`` (:86, forward :645), AdaptiveInstanceNorm1d's dummy
``running_mean/var`` buffers (:931-933), and every BN's
``num_batches_tracked``.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

__all__ = [
    "convert_netG_state_dict",
    "export_netG_state_dict",
    "convert_atlasnet_state_dict",
    "export_atlasnet_state_dict",
    "convert_msn_state_dict",
    "export_msn_state_dict",
    "convert_grnet_state_dict",
    "export_grnet_state_dict",
    "load_reference_checkpoint",
]

_DEC_BOTTLENECK = 1026


# ---------------------------------------------------------------------------
# value transforms (torch -> flax; each has an exact inverse)
# ---------------------------------------------------------------------------

def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


_GRNET_BOTTLENECK_CH = 256  # conv4 output channels (grnet_generator.py:31)


def _flat_perm(n: int, c: int = _GRNET_BOTTLENECK_CH) -> np.ndarray:
    """Flatten-order permutation for GRNet's fc bottleneck: maps the
    flax channel-last flat index (x, y, z, c) to the torch channel-first
    flat index (c, x, y, z) of the same [C, s, s, s] volume
    (grnet_generator.py:84-87 ``view(-1, 16384)``). ``c`` defaults to the
    reference conv4 width; pass the variant's width to convert a variant
    checkpoint."""
    s = round((n // c) ** (1.0 / 3.0))
    assert c * s ** 3 == n, (
        f"bottleneck size {n} is not {c}*s^3; for GRNet variants with a "
        f"different conv4 width pass c explicitly to _flat_perm")
    i = np.arange(n)
    x, r = divmod(i, s * s * c)
    y, r = divmod(r, s * c)
    z, cc = divmod(r, c)
    return ((cc * s + x) * s + y) * s + z


def _to_flax(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "lin_w":
        return v.T
    if kind in ("conv1d_w", "conv2d_w"):
        return v.reshape(v.shape[0], v.shape[1]).T
    if kind == "conv3d_w":
        # torch [out, in, kx, ky, kz] -> flax [kx, ky, kz, in, out]
        return v.transpose(2, 3, 4, 1, 0)
    if kind == "deconv3d_w":
        # torch ConvTranspose3d [in, out, kx, ky, kz] -> flax
        # ConvTranspose (transpose_kernel=False, padding="SAME")
        # [kx, ky, kz, in, out] with SPATIALLY FLIPPED taps (verified
        # numerically against torch: tests/test_torch_interop.py)
        return v[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1).copy()
    if kind == "fc_in_w":
        # fc5: torch rows index the channel-first flatten; flax kernel
        # rows index the channel-last flatten
        return v.T[_flat_perm(v.shape[1])]
    if kind == "fc_out_w":
        return v[_flat_perm(v.shape[0])].T
    if kind == "fc_out_b":
        return v[_flat_perm(v.shape[0])]
    return v  # "id"


def _to_torch(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "lin_w":
        return v.T
    if kind == "conv1d_w":
        return v.T[:, :, None]
    if kind == "conv2d_w":
        return v.T[:, :, None, None]
    if kind == "conv3d_w":
        return v.transpose(4, 3, 0, 1, 2)
    if kind == "deconv3d_w":
        return v.transpose(3, 4, 0, 1, 2)[:, :, ::-1, ::-1, ::-1].copy()
    if kind == "fc_in_w":
        return v[np.argsort(_flat_perm(v.shape[0]))].T
    if kind == "fc_out_w":
        return v.T[np.argsort(_flat_perm(v.shape[1]))]
    if kind == "fc_out_b":
        return v[np.argsort(_flat_perm(v.shape[0]))]
    return v


# ---------------------------------------------------------------------------
# the mapping table
# ---------------------------------------------------------------------------

class _Rules:
    """Accumulates (collection, flax_path, torch_key_template, kind,
    stacked) entries; ``{p}`` in a template is the primitive index."""

    def __init__(self):
        self.entries: list[tuple[str, tuple[str, ...], str, str, bool]] = []

    def add(self, col, fpath, tkey, kind, stacked=False):
        self.entries.append((col, tuple(fpath), tkey, kind, stacked))

    def dense(self, fpath, tkey, stacked=False, bias=True, kind="lin_w"):
        self.add("params", fpath + ("kernel",), tkey + ".weight", kind,
                 stacked)
        if bias:
            self.add("params", fpath + ("bias",), tkey + ".bias", "id",
                     stacked)

    def bn(self, fpath, tkey, stacked=False):
        self.add("params", fpath + ("scale",), tkey + ".weight", "id",
                 stacked)
        self.add("params", fpath + ("bias",), tkey + ".bias", "id", stacked)
        self.add("batch_stats", fpath + ("mean",), tkey + ".running_mean",
                 "id", stacked)
        self.add("batch_stats", fpath + ("var",), tkey + ".running_var",
                 "id", stacked)

    def se(self, fpath, tkey, stacked=False):
        self.dense(fpath + ("Linear_0",), tkey + ".fc.0", stacked, bias=False)
        self.dense(fpath + ("Linear_1",), tkey + ".fc.2", stacked, bias=False)


def _grid_decoder_rules(r: _Rules, froot, troot, use_selayer, stacked):
    """GridDecoder (models/sparenet_generator.py:962-1062, non-sine)."""
    for i in range(4):
        r.dense(froot + (f"Conv1d_{i}",), f"{troot}.conv{i + 1}",
                stacked, kind="conv1d_w")
    for i in range(3):
        r.bn(froot + (f"BatchNorm_{i}",), f"{troot}.bn{i + 1}", stacked)
        if use_selayer:
            r.se(froot + (f"SELayer_{i}",), f"{troot}.se{i + 1}", stacked)


def netG_rules(use_adain: str = "share", encode: str = "Residualnet",
               use_selayer: bool = True) -> _Rules:
    """The full SpareNetGenerator key mapping for one configuration."""
    r = _Rules()

    # --- encoder (SpareNetEncode, models/sparenet_generator.py:85-120)
    if encode == "Residualnet":
        f = ("encoder", "EdgeConvResFeat_0")
        t = "encoder.feat_extractor"
        for i in range(4):  # edge convs 1-4 (Conv2d over edge features)
            r.dense(f + (f"EdgeConv1x1_{i}",), f"{t}.conv{i + 1}",
                    bias=False, kind="conv2d_w")
            r.bn(f + (f"BatchNorm_{i}",), f"{t}.bn{i + 1}")
            if use_selayer:
                r.se(f + (f"SELayer_{i}",), f"{t}.se{i + 1}")
        for i in range(3):  # residual shortcuts
            r.dense(f + (f"Conv1d_{i}",), f"{t}.resconv{i + 1}",
                    bias=False, kind="conv1d_w")
        r.dense(f + ("Conv1d_3",), f"{t}.conv5", bias=False, kind="conv1d_w")
        r.bn(f + ("BatchNorm_4",), f"{t}.bn5")
    else:  # Pointfeat (PointNetfeat, models/sparenet_generator.py:245-286)
        f = ("encoder", "PointNetfeat_0")
        t = "encoder.feat_extractor"
        for i in range(3):
            r.dense(f + (f"Conv1d_{i}",), f"{t}.conv{i + 1}",
                    kind="conv1d_w")
            r.bn(f + (f"BatchNorm_{i}",), f"{t}.bn{i + 1}")
        if use_selayer:
            for i in range(2):
                r.se(f + (f"SELayer_{i}",), f"{t}.se{i + 1}")
    r.dense(("encoder", "Linear_0"), "encoder.linear")
    r.bn(("encoder", "BatchNorm_0"), "encoder.bn")

    # --- decoder (SpareNetDecode, models/sparenet_generator.py:289-391)
    if use_adain == "share":
        r.dense(("decoder", "Linear_0"), "decoder.mlp.0")
        r.dense(("decoder", "Linear_1"), "decoder.mlp.2")
        _grid_decoder_rules(r, ("decoder", "VmapGridDecoder_0"),
                            "decoder.decoder.{p}.dec", use_selayer, True)
    elif use_adain == "no_share":
        f = ("decoder", "Vmap_AdaInPointGenCon_0")
        r.dense(f + ("Linear_0",), "decoder.decoder.{p}.mlp.0", True)
        r.dense(f + ("Linear_1",), "decoder.decoder.{p}.mlp.2", True)
        _grid_decoder_rules(r, f + ("GridDecoder_0",),
                            "decoder.decoder.{p}.dec", use_selayer, True)
    elif use_adain == "no_use":
        f = ("decoder", "VmapPointGenCon_0")
        t = "decoder.decoder.{p}"
        for i in range(4):
            r.dense(f + (f"Conv1d_{i}",), f"{t}.conv{i + 1}", True,
                    kind="conv1d_w")
        for i in range(3):
            r.bn(f + (f"BatchNorm_{i}",), f"{t}.bn{i + 1}", True)
            if use_selayer:
                r.se(f + (f"SELayer_{i}",), f"{t}.se{i + 1}", True)
    else:
        raise ValueError(f"unknown use_adain mode {use_adain!r}")

    # --- refine (shared between both passes; PointNetRes,
    #     models/sparenet_generator.py:582-646)
    _pointnet_res_rules(r, ("refine", "PointNetRes_0"), "refine.residual",
                        use_selayer)
    return r


def atlasnet_rules() -> _Rules:
    """AtlasNet (models/atlasnet_generator.py:14-58): PointEncoder
    (PointNetfeat hide=1024, no SE) + 32x PointGenCon(bottleneck 1026,
    no SE) over random grids."""
    r = _Rules()
    _point_encoder_rules(r)
    _point_gen_con_rules(r, ("VmapPointGenCon_0",), "decoder.{p}",
                         use_selayer=False)
    return r


def msn_rules() -> _Rules:
    """MSN (models/msn_generator.py:14-82): AtlasNet + PointNetRes
    residual refiner (``res``, no SE)."""
    r = atlasnet_rules()
    _pointnet_res_rules(r, ("PointNetRes_0",), "res", use_selayer=False)
    return r


def grnet_rules() -> _Rules:
    """GRNet (models/grnet_generator.py:8-114): 4 Conv3d blocks, fc
    bottleneck, 4 ConvTranspose3d blocks, 4 point-feature MLP layers.
    Voxel layouts agree (gridding flattens x-major on both sides,
    gridding.cu:22-25), so conv kernels map by transpose alone; the fc
    bottleneck weights additionally absorb the channel-first vs
    channel-last flatten permutation (kinds ``fc_in_w``/``fc_out_w``)."""
    r = _Rules()
    for i in range(4):
        r.dense((f"_ConvBlock_{i}", "Conv_0"), f"conv{i + 1}.0",
                kind="conv3d_w")
        r.bn((f"_ConvBlock_{i}", "BatchNorm_0"), f"conv{i + 1}.1")
    r.add("params", ("Linear_0", "kernel"), "fc5.0.weight", "fc_in_w")
    r.add("params", ("Linear_0", "bias"), "fc5.0.bias", "id")
    r.add("params", ("Linear_1", "kernel"), "fc6.0.weight", "fc_out_w")
    r.add("params", ("Linear_1", "bias"), "fc6.0.bias", "fc_out_b")
    for i in range(4):
        r.dense((f"_DeconvBlock_{i}", "ConvTranspose_0"), f"dconv{i + 7}.0",
                bias=False, kind="deconv3d_w")
        r.bn((f"_DeconvBlock_{i}", "BatchNorm_0"), f"dconv{i + 7}.1")
    for j, t in enumerate(("fc11.0", "fc12.0", "fc13.0", "fc14")):
        r.dense((f"Linear_{j + 2}",), t)
    return r


def _point_encoder_rules(r: _Rules):
    """PointEncoder (models/atlasnet_generator.py:61-76)."""
    f = ("PointEncoder_0", "PointNetfeat_0")
    t = "encoder.feat_extractor"
    for i in range(3):
        r.dense(f + (f"Conv1d_{i}",), f"{t}.conv{i + 1}", kind="conv1d_w")
        r.bn(f + (f"BatchNorm_{i}",), f"{t}.bn{i + 1}")
    r.dense(("PointEncoder_0", "Linear_0"), "encoder.linear")
    r.bn(("PointEncoder_0", "BatchNorm_0"), "encoder.bn")


def _point_gen_con_rules(r: _Rules, froot, troot, use_selayer):
    """PointGenCon (models/sparenet_generator.py:463-527)."""
    for i in range(4):
        r.dense(froot + (f"Conv1d_{i}",), f"{troot}.conv{i + 1}", True,
                kind="conv1d_w")
    for i in range(3):
        r.bn(froot + (f"BatchNorm_{i}",), f"{troot}.bn{i + 1}", True)
        if use_selayer:
            r.se(froot + (f"SELayer_{i}",), f"{troot}.se{i + 1}", True)


def _pointnet_res_rules(r: _Rules, froot, troot, use_selayer):
    """PointNetRes (models/sparenet_generator.py:582-646); bn7 is
    registered but unused in forward."""
    for i in range(7):
        r.dense(froot + (f"Conv1d_{i}",), f"{troot}.conv{i + 1}",
                kind="conv1d_w")
    for i in range(6):
        r.bn(froot + (f"BatchNorm_{i}",), f"{troot}.bn{i + 1}")
    if use_selayer:
        for j, i in enumerate((1, 2, 4, 5, 6)):  # se3 does not exist
            r.se(froot + (f"SELayer_{j}",), f"{troot}.se{i}")


# keys legitimately present in a reference state_dict with no flax
# counterpart (see module docstring)
_IGNORED = re.compile(
    r"^(conv1\.(weight|bias)"
    r"|(refine\.residual|res)\.bn7\..*"
    r"|.*\.adain[0-9]\.(running_mean|running_var)"
    r"|.*\.num_batches_tracked)$"
)


def _set(tree: dict, path: tuple, value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _get(tree: dict, path: tuple):
    for k in path:
        tree = tree[k]
    return tree


def _convert(state_dict: dict, rules: _Rules, n_primitives: int,
             strict: bool) -> dict[str, Any]:
    """torch state_dict -> flax variables, per a mapping table.

    Accepts torch tensors or numpy arrays; strips DataParallel's
    ``module.`` prefix. With ``strict`` raises on any key that is
    neither mapped nor known-ignorable."""
    sd = {re.sub(r"^module\.", "", k): _np(v) for k, v in state_dict.items()}
    out: dict[str, dict] = {"params": {}, "batch_stats": {}}
    consumed = set()
    for col, fpath, tkey, kind, stacked in rules.entries:
        if stacked:
            keys = [tkey.format(p=p) for p in range(n_primitives)]
            v = np.stack([_to_flax(kind, sd[k]) for k in keys])
            consumed.update(keys)
        else:
            v = _to_flax(kind, sd[tkey])
            consumed.add(tkey)
        _set(out[col], fpath, v.astype(np.float32))
    if strict:
        leftover = [k for k in sd
                    if k not in consumed and not _IGNORED.match(k)]
        if leftover:
            raise ValueError(
                f"unmapped reference keys (config mismatch?): {leftover[:8]}"
                + ("..." if len(leftover) > 8 else ""))
    return out


class _Export:
    """flax variables -> torch state_dict, per a mapping table; model
    wrappers add the reference's registered-but-unused tensors."""

    def __init__(self, variables: dict, rules: _Rules, n_primitives: int):
        self.sd: dict[str, np.ndarray] = {}
        self.bn_prefixes: set[str] = set()
        for col, fpath, tkey, kind, stacked in rules.entries:
            v = np.asarray(_get(variables[col], fpath), np.float32)
            if stacked:
                for p in range(n_primitives):
                    self.sd[tkey.format(p=p)] = _to_torch(kind, v[p])
            else:
                self.sd[tkey] = _to_torch(kind, v)
            if tkey.endswith(".running_var"):
                self.bn_prefixes.add(tkey[: -len(".running_var")])

    def dummy_bn(self, prefix: str, nf: int, affine: bool = True):
        if affine:
            self.sd[f"{prefix}.weight"] = np.ones(nf, np.float32)
            self.sd[f"{prefix}.bias"] = np.zeros(nf, np.float32)
        self.sd[f"{prefix}.running_mean"] = np.zeros(nf, np.float32)
        self.sd[f"{prefix}.running_var"] = np.ones(nf, np.float32)
        self.bn_prefixes.add(prefix)

    def finish(self) -> dict[str, np.ndarray]:
        for prefix in self.bn_prefixes:
            if not prefix.endswith(tuple(f"adain{i}" for i in (1, 2, 3))):
                self.sd[f"{prefix}.num_batches_tracked"] = \
                    np.zeros((), np.int64)
        return self.sd


def convert_netG_state_dict(state_dict: dict, *, use_adain: str = "share",
                            encode: str = "Residualnet",
                            use_selayer: bool = True,
                            n_primitives: int = 32,
                            strict: bool = True) -> dict[str, Any]:
    """torch ``net_G`` state_dict -> flax variables for
    ``SpareNetGenerator`` (same config flags as the model)."""
    return _convert(state_dict,
                    netG_rules(use_adain, encode, use_selayer),
                    n_primitives, strict)


def export_netG_state_dict(variables: dict, *, use_adain: str = "share",
                           encode: str = "Residualnet",
                           use_selayer: bool = True,
                           n_primitives: int = 32) -> dict[str, np.ndarray]:
    """flax ``SpareNetGenerator`` variables -> a state_dict the
    reference's ``net_G.load_state_dict`` accepts (strict=True),
    including its registered-but-unused tensors at their defaults."""
    ex = _Export(variables, netG_rules(use_adain, encode, use_selayer),
                 n_primitives)
    ex.sd["conv1.weight"] = np.zeros((64, 3, 1), np.float32)
    ex.sd["conv1.bias"] = np.zeros(64, np.float32)
    ex.dummy_bn("refine.residual.bn7", 3)
    if use_adain in ("share", "no_share"):
        b = _DEC_BOTTLENECK
        for p in range(n_primitives):
            for i, nf in enumerate((b, b // 2, b // 4)):
                ex.dummy_bn(f"decoder.decoder.{p}.dec.adain{i + 1}", nf,
                            affine=False)
    return ex.finish()


def convert_atlasnet_state_dict(state_dict: dict, *,
                                n_primitives: int = 32,
                                strict: bool = True) -> dict[str, Any]:
    """torch ``AtlasNet`` state_dict -> flax variables (note: our
    AtlasNet samples its random grids via an explicit 'grid' rng, so
    converted weights plug straight in)."""
    return _convert(state_dict, atlasnet_rules(), n_primitives, strict)


def export_atlasnet_state_dict(variables: dict, *, n_primitives: int = 32
                               ) -> dict[str, np.ndarray]:
    return _Export(variables, atlasnet_rules(), n_primitives).finish()


def convert_msn_state_dict(state_dict: dict, *, n_primitives: int = 32,
                           strict: bool = True) -> dict[str, Any]:
    """torch ``MSN`` state_dict -> flax variables."""
    return _convert(state_dict, msn_rules(), n_primitives, strict)


def export_msn_state_dict(variables: dict, *, n_primitives: int = 32
                          ) -> dict[str, np.ndarray]:
    ex = _Export(variables, msn_rules(), n_primitives)
    ex.dummy_bn("res.bn7", 3)
    return ex.finish()


def convert_grnet_state_dict(state_dict: dict, *, strict: bool = True,
                             **_ignored) -> dict[str, Any]:
    """torch ``GRNet`` state_dict -> flax variables (the conversion is
    exact: forward outputs match torch to float tolerance,
    tests/test_torch_interop.py)."""
    return _convert(state_dict, grnet_rules(), 1, strict)


def export_grnet_state_dict(variables: dict, **_ignored
                            ) -> dict[str, np.ndarray]:
    return _Export(variables, grnet_rules(), 1).finish()


_CONVERTERS = {
    "SpareNet": convert_netG_state_dict,
    "AtlasNet": convert_atlasnet_state_dict,
    "MSN": convert_msn_state_dict,
    "GRNet": convert_grnet_state_dict,
}


def load_reference_checkpoint(path: str, model_type: str = "SpareNet",
                              **convert_kwargs) -> dict[str, Any]:
    """Load a reference ``ckpt-*.pth`` (utils/misc.py:96-104 layout:
    {epoch_index, best_metrics, net_G}) or a bare state_dict, and
    convert the generator weights to flax variables."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    sd = payload.get("net_G", payload) if isinstance(payload, dict) else payload
    return _CONVERTERS[model_type](sd, **convert_kwargs)
