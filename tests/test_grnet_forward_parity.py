"""Full-model GRNet forward parity vs torch on shared weights.

Extends the U-Net-only parity test (tests/test_torch_interop.py::
test_grnet_unet_forward_parity_vs_torch) to the WHOLE GRNet forward
(models/grnet_generator.py:66-113): gridding -> U-Net -> gridding
reverse -> point sampling -> cubic feature sampling x3 scales -> offset
MLP -> dense cloud. The torch-side pipeline composes the torch layer
stack with numpy replicas of the CUDA op formulas (gridding.cu:29-179,
gridding_reverse.cu:30-103, cubic_feature_sampling.cu:29-102).

RandomPointSampling randomness differs by construction (the reference
uses torch.randperm, the rebuild a Gumbel top-k — neither reproduces
the other, nor itself across runs), so the sampled sparse cloud is
ANCHORED: the torch-side tail is fed the flax sparse cloud, isolating
weight/op parity; the sampling itself is validated by membership (every
flax sparse point appears in the torch-side candidate set).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sparenet_tpu.models.grnet import GRNet
from sparenet_tpu.ops.chamfer import chamfer_raw
from sparenet_tpu.utils.torch_import import convert_grnet_state_dict
from tests.test_torch_interop import _TorchGRNetStack

SCALE, N_IN, N_SAMP, B = 32, 48, 16, 2


def np_gridding(cloud, scale):
    """cloud [N, 3] in [-1, 1] -> grid [s, s, s] (gridding.cu:29-179,
    wrapper rescale cuda/gridding/__init__.py:36-50)."""
    half = scale // 2
    p = cloud * half
    grid = np.zeros((scale, scale, scale), np.float32)
    for pt in p:
        if pt.sum() == 0:
            continue
        lo = np.floor(pt).astype(int)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    corner = lo + [cx, cy, cz]
                    w = np.prod(1 - np.abs(pt - corner))
                    ix = corner + half
                    if ((ix >= 0) & (ix < scale)).all():
                        grid[ix[0], ix[1], ix[2]] += w
    return grid


def np_gridding_reverse(grid, scale):
    """grid [s, s, s] -> cloud [s^3, 3] in [-1, 1]
    (gridding_reverse.cu:30-103): each interior voxel (x, y, z) emits
    the weight-normalized centroid of its 8 cell vertices
    (x-1-dx, ...), zero when the weight mass is < 1e-6."""
    s = scale
    half = s // 2
    gp = np.pad(grid, ((1, 0), (1, 0), (1, 0)))
    w = np.empty((s, s, s, 8), np.float64)
    verts = np.empty((s, s, s, 8, 3), np.float64)
    ax = np.arange(s)
    vx, vy, vz = np.meshgrid(ax, ax, ax, indexing="ij")
    c = 0
    for dx in (1, 0):
        for dy in (1, 0):
            for dz in (1, 0):
                w[..., c] = gp[1 - dx:s + 1 - dx,
                               1 - dy:s + 1 - dy,
                               1 - dz:s + 1 - dz]
                verts[..., c, 0] = vx - dx - half
                verts[..., c, 1] = vy - dy - half
                verts[..., c, 2] = vz - dz - half
                c += 1
    wsum = w.sum(-1)
    safe = np.where(wsum < 1e-6, 1.0, wsum)
    pts = (w[..., None] * verts).sum(-2) / safe[..., None]
    interior = (vx > 0) & (vy > 0) & (vz > 0)
    keep = interior & (wsum >= 1e-6)
    pts = np.where(keep[..., None], pts, 0.0)
    return (pts.reshape(s ** 3, 3) * (2.0 / s)).astype(np.float32)


def np_cubic_sampling(cloud, vol_cf):
    """cloud [n, 3] in [-1, 1], vol_cf [C, s, s, s] (torch channel-first)
    -> [n, 8, C] (cubic_feature_sampling.cu:29-102; wrapper rescale to
    [0, s], cuda/cubic_feature_sampling/__init__.py:39-42)."""
    c, s = vol_cf.shape[0], vol_cf.shape[1]
    p = cloud * (s / 2) + (s / 2)
    out = np.zeros((cloud.shape[0], 8, c), np.float32)
    for i, pt in enumerate(p):
        lo = np.floor(pt).astype(int)
        v = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corner = lo + [dx, dy, dz]
                    if ((corner >= 0) & (corner < s)).all():
                        out[i, v] = vol_cf[:, corner[0], corner[1], corner[2]]
                    v += 1
    return out


def test_grnet_full_forward_parity(rng):
    tm = _TorchGRNetStack(SCALE)
    variables = convert_grnet_state_dict(tm.state_dict(), strict=True)

    partial = (rng.rand(B, N_IN, 3) * 1.4 - 0.7).astype(np.float32)
    model = GRNet(n_sampling_points=N_SAMP, gridding_scale=SCALE,
                  train=False)
    sparse_f, dense_f = model.apply(
        variables, jnp.asarray(partial),
        rngs={"sample": jax.random.PRNGKey(7)})
    sparse_f = np.asarray(sparse_f)
    dense_f = np.asarray(dense_f)

    # ---- torch-side pipeline on the same weights -----------------------
    vol = np.stack([np_gridding(p, SCALE) for p in partial])
    with torch.no_grad():
        t64 = torch.from_numpy(vol[:, None])                 # [B,1,s,s,s]
        t32 = tm.conv1(t64)
        t16 = tm.conv2(t32)
        t8 = tm.conv3(t16)
        t4 = tm.conv4(t8)
        feat = tm.fc5(t4.reshape(B, -1))                     # CF flatten
        t4r = tm.fc6(feat).reshape(t4.shape) + t4
        t8r = tm.dconv7(t4r) + t8
        t16r = tm.dconv8(t8r) + t16
        t32r = tm.dconv9(t16r) + t32
        t64r = tm.dconv10(t32r) + t64

    cloud_t = np.stack([np_gridding_reverse(g, SCALE)
                        for g in t64r[:, 0].numpy()])

    # sampling validity: every flax sparse point must be a member of the
    # torch-side candidate set concat(partial, cloud) — same U-Net + ops
    # composition, so candidates agree to float tolerance
    for b in range(B):
        cand = np.concatenate([partial[b], cloud_t[b]], axis=0)
        d = np.min(np.sum((cand[None] - sparse_f[b][:, None]) ** 2, -1), 1)
        assert float(d.max()) < 1e-7
        # sampled points are non-zero (valid) and unique
        assert np.abs(sparse_f[b]).sum(-1).min() > 0
        assert len({tuple(q) for q in sparse_f[b].round(6).tolist()}) == N_SAMP

    # ---- anchored tail: torch cubic sampling + MLP on the FLAX sparse --
    feats = []
    for volr in (t32r, t16r, t8r):
        f = np.stack([np_cubic_sampling(sparse_f[b], volr[b].numpy())
                      for b in range(B)])                    # [B,n,8,C]
        feats.append(f.reshape(B, N_SAMP, -1))
    pf = torch.from_numpy(np.concatenate(feats, axis=-1))    # [B,n,1792]
    with torch.no_grad():
        pf = tm.fc11(pf)
        pf = tm.fc12(pf)
        pf = tm.fc13(pf)
        offsets = tm.fc14(pf).reshape(B, N_SAMP * 8, 3).numpy()
    dense_a = np.repeat(sparse_f, 8, axis=1) + offsets

    np.testing.assert_allclose(dense_f, dense_a, atol=3e-4, rtol=1e-4)

    # BASELINE contract on the anchored end-to-end output
    d1, d2, _, _ = chamfer_raw(jnp.asarray(dense_f), jnp.asarray(dense_a))
    cd = float(jnp.max(jnp.mean(d1, 1) + jnp.mean(d2, 1)))
    assert cd <= 1e-4
