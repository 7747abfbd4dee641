"""PointNet classifier for Frechet Pointcloud Distance activations.

TPU-native rebuild of Frechet/pointnet.py:14-100 (the original PointNet
classifier with STN3d input transform). Channel-last: clouds [B, N, 3].

The reference's pretrained checkpoint (Frechet/cls_model_39.pth) is a
missing large blob (reference .MISSING_LARGE_BLOBS); ``load_torch_state``
converts such a torch state_dict into this module's params if one is
provided, and ``sparenet_tpu.frechet.train_classifier`` can train a
replacement on ShapeNet categories.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bn(train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 alignment
    (Frechet/pointnet.py:14-48)."""

    train: bool = True

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        h = nn.relu(_bn(self.train)(nn.Dense(64)(x)))
        h = nn.relu(_bn(self.train)(nn.Dense(128)(h)))
        h = nn.relu(_bn(self.train)(nn.Dense(1024)(h)))
        h = jnp.max(h, axis=1)
        h = nn.relu(_bn(self.train)(nn.Dense(512)(h)))
        h = nn.relu(_bn(self.train)(nn.Dense(256)(h)))
        h = nn.Dense(9)(h)
        iden = jnp.eye(3, dtype=h.dtype).reshape(9)
        return (h + iden).reshape(b, 3, 3)


class PointNetFeat(nn.Module):
    """Global 1024-d feature after the STN transform
    (Frechet/pointnet.py:51-80)."""

    train: bool = True

    @nn.compact
    def __call__(self, x):
        trans = STN3d(train=self.train)(x)
        x = jnp.einsum("bnc,bcd->bnd", x, trans)
        h = nn.relu(_bn(self.train)(nn.Dense(64)(x)))
        h = nn.relu(_bn(self.train)(nn.Dense(128)(h)))
        h = _bn(self.train)(nn.Dense(1024)(h))
        return jnp.max(h, axis=1), trans


class PointNetCls(nn.Module):
    """Classifier emitting the 1808-d FPD activation vector
    (Frechet/pointnet.py:82-100): concat(x1[1024], x2[512], x3[256],
    logits[k]) with k=16 -> 1808 dims."""

    k: int = 16
    train: bool = True

    @nn.compact
    def __call__(self, x):
        x1, trans = PointNetFeat(train=self.train)(x)
        x2 = nn.relu(_bn(self.train)(nn.Dense(512)(x1)))
        x3 = nn.relu(_bn(self.train)(nn.Dense(256)(x2)))
        x4 = nn.Dense(self.k)(x3)
        actv = jnp.concatenate([x1, x2, x3, x4], axis=1)
        # reference applies log_softmax over dim 0 (a quirk kept there);
        # we return plain logits — only `actv` feeds the FPD.
        return x4, trans, actv


_TORCH_TO_FLAX = None  # populated lazily in load_torch_state


def load_torch_state(state_dict: dict, k: int = 16):
    """Convert a reference cls_model torch state_dict (numpy arrays) to
    this module's variables, for FPD parity when the pretrained blob is
    available."""
    import re

    def dense(prefix):
        w = np.asarray(state_dict[prefix + ".weight"])
        out = {"kernel": w.T}
        if prefix + ".bias" in state_dict:
            out["bias"] = np.asarray(state_dict[prefix + ".bias"])
        return out

    def conv1d(prefix):
        w = np.asarray(state_dict[prefix + ".weight"])[:, :, 0]  # [out,in]
        return {"kernel": w.T,
                "bias": np.asarray(state_dict[prefix + ".bias"])}

    def bn(prefix):
        return (
            {"scale": np.asarray(state_dict[prefix + ".weight"]),
             "bias": np.asarray(state_dict[prefix + ".bias"])},
            {"mean": np.asarray(state_dict[prefix + ".running_mean"]),
             "var": np.asarray(state_dict[prefix + ".running_var"])},
        )

    params, stats = {}, {}

    def put(flax_path, dense_params, bn_pair=None):
        params[flax_path] = dense_params
        if bn_pair is not None:
            bpath = flax_path.replace("Dense", "BatchNorm")
            params[bpath], stats[bpath] = bn_pair

    # STN3d: Dense_0..5 / BatchNorm_0..4 inside PointNetFeat_0/STN3d_0
    stn = "PointNetFeat_0/STN3d_0"
    for i, (src, kind) in enumerate([
            ("feat.stn.conv1", "c"), ("feat.stn.conv2", "c"),
            ("feat.stn.conv3", "c"), ("feat.stn.fc1", "d"),
            ("feat.stn.fc2", "d")]):
        layer = conv1d(src) if kind == "c" else dense(src)
        params[f"{stn}/Dense_{i}"] = layer
        bnp, bns = bn("feat.stn.bn%d" % (i + 1))
        params[f"{stn}/BatchNorm_{i}"] = bnp
        stats[f"{stn}/BatchNorm_{i}"] = bns
    params[f"{stn}/Dense_5"] = dense("feat.stn.fc3")

    feat = "PointNetFeat_0"
    for i, src in enumerate(["feat.conv1", "feat.conv2", "feat.conv3"]):
        params[f"{feat}/Dense_{i}"] = conv1d(src)
        bnp, bns = bn("feat.bn%d" % (i + 1))
        params[f"{feat}/BatchNorm_{i}"] = bnp
        stats[f"{feat}/BatchNorm_{i}"] = bns

    for i, src in enumerate(["fc1", "fc2"]):
        params[f"Dense_{i}"] = dense(src)
        bnp, bns = bn("bn%d" % (i + 1))
        params[f"BatchNorm_{i}"] = bnp
        stats[f"BatchNorm_{i}"] = bns
    params["Dense_2"] = dense("fc3")

    def nest(flat):
        tree = {}
        for path, leaf in flat.items():
            node = tree
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = {k2: jnp.asarray(v) for k2, v in leaf.items()}
        return tree

    return {"params": nest(params), "batch_stats": nest(stats)}
