"""Functional torch replicas of the reference generators, driven by an
exported reference-layout state_dict (utils/torch_import.py).

These evaluate the reference architectures (eval mode, channel-first
[B, C, N]) with plain torch.nn.functional calls, reading weights by the
reference attribute names (models/sparenet_generator.py,
atlasnet_generator.py, msn_generator.py) — no nn.Module tree needed.
Used by tests/test_forward_parity.py to assert that converting a net_G
state_dict into the flax models reproduces full-model forwards.

Non-parametric glue (expansion-penalty MST statistics, greedy MDS) is
reimplemented here in NUMPY from the reference formulas
(expansion_penalty_cuda.cu:45-149, MDS_cuda.cu:104-211) so the torch
path is independent of sparenet_tpu's ops; kNN uses the reference's own
exact pairwise-topk fallback formula (sparenet_generator.py:871-875).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, k):
    v = sd[k]
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(np.asarray(v))


def conv1d(sd, name, x, bias=True):
    return F.conv1d(x, _t(sd, name + ".weight"),
                    _t(sd, name + ".bias") if bias else None)


def conv2d(sd, name, x, bias=False):
    return F.conv2d(x, _t(sd, name + ".weight"),
                    _t(sd, name + ".bias") if bias else None)


def linear(sd, name, x):
    return F.linear(x, _t(sd, name + ".weight"), _t(sd, name + ".bias"))


def bn_eval(sd, name, x):
    return F.batch_norm(
        x, _t(sd, name + ".running_mean"), _t(sd, name + ".running_var"),
        _t(sd, name + ".weight"), _t(sd, name + ".bias"),
        training=False, eps=1e-5)


def se(sd, name, x):
    """SELayer/SELayer1D (sparenet_generator.py:741-790): global avg pool
    over all non-(batch, channel) dims, fc.0 -> relu -> fc.2 -> sigmoid."""
    y = x.mean(dim=tuple(range(2, x.dim())))
    y = F.relu(F.linear(y, _t(sd, name + ".fc.0.weight")))
    y = torch.sigmoid(F.linear(y, _t(sd, name + ".fc.2.weight")))
    return x * y.reshape(y.shape + (1,) * (x.dim() - 2))


def adain(x, weight, bias, eps=1e-5):
    """AdaptiveInstanceNorm1d (sparenet_generator.py:909-956): instance
    stats per (sample, channel) over points, biased variance."""
    mean = x.mean(dim=2, keepdim=True)
    var = x.var(dim=2, unbiased=False, keepdim=True)
    xn = (x - mean) / torch.sqrt(var + eps)
    return xn * weight[:, :, None] + bias[:, :, None]


def knn_idx_t(x, k):
    """Reference exact kNN fallback (sparenet_generator.py:871-875);
    x [B, C, N] -> idx [B, N, k]."""
    inner = -2 * torch.matmul(x.transpose(2, 1), x)
    xx = torch.sum(x ** 2, dim=1, keepdim=True)
    pairwise = -xx - inner - xx.transpose(2, 1)
    return pairwise.topk(k=k, dim=-1)[1]


def graph_feature(x, k):
    """Edge features concat(x_j - x_i, x_i) (sparenet_generator.py:880-906);
    x [B, C, N] -> [B, 2C, N, k]."""
    b, c, n = x.shape
    idx = knn_idx_t(x, k)                                     # [B, N, k]
    xt = x.transpose(2, 1)                                    # [B, N, C]
    xj = torch.gather(
        xt.unsqueeze(2).expand(b, n, k, c), 1,
        idx.unsqueeze(-1).expand(b, n, k, c))
    xi = xt.unsqueeze(2).expand(b, n, k, c)
    e = torch.cat([xj - xi, xi], dim=-1)                      # [B, N, k, 2C]
    return e.permute(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def pointnetfeat(sd, prefix, x, use_selayer=False):
    """PointNetfeat (sparenet_generator.py:245-286): 3 convs + BN (+SE),
    global max pool. x [B, 3, N] -> [B, hide]."""
    for i in (1, 2):
        x = conv1d(sd, f"{prefix}.conv{i}", x)
        x = bn_eval(sd, f"{prefix}.bn{i}", x)
        if use_selayer:
            x = se(sd, f"{prefix}.se{i}", x)
        x = F.relu(x)
    x = conv1d(sd, f"{prefix}.conv3", x)
    x = bn_eval(sd, f"{prefix}.bn3", x)
    return x.max(dim=2)[0]


def edgeconv_res_feat(sd, prefix, x, k=8, use_selayer=False):
    """EdgeConvResFeat (sparenet_generator.py:123-242): 4 EdgeConv stages
    with conv residual shortcuts, concat, conv5, max+avg pool.
    x [B, 3, N] -> [B, output]."""

    def stage(feat, i):
        e = graph_feature(feat, k)                            # [B,2C,N,k]
        e = conv2d(sd, f"{prefix}.conv{i}", e)
        e = bn_eval(sd, f"{prefix}.bn{i}", e)
        if use_selayer:
            e = se(sd, f"{prefix}.se{i}", e)
        e = F.leaky_relu(e, 0.2)
        return e.max(dim=3)[0]                                # [B,C,N]

    x1 = stage(x, 1)
    x2 = stage(x1, 2) + conv1d(sd, f"{prefix}.resconv1", x1, bias=False)
    x3 = stage(x2, 3) + conv1d(sd, f"{prefix}.resconv2", x2, bias=False)
    x4 = stage(x3, 4) + conv1d(sd, f"{prefix}.resconv3", x3, bias=False)
    xc = torch.cat([x1, x2, x3, x4], dim=1)
    xc = conv1d(sd, f"{prefix}.conv5", xc, bias=False)
    xc = bn_eval(sd, f"{prefix}.bn5", xc)
    xc = F.leaky_relu(xc, 0.2)
    return torch.cat([xc.max(dim=2)[0], xc.mean(dim=2)], dim=1)


def encoder_head(sd, feat):
    feat = linear(sd, "encoder.linear", feat)
    feat = bn_eval(sd, "encoder.bn", feat[:, :, None])[:, :, 0]
    return F.relu(feat)


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------

def split_adain(params, sizes):
    """assign_adain_params (sparenet_generator.py:831-849): per layer,
    mean(=bias) then std(=weight), consumed in registration order."""
    out, off = [], 0
    for nf in sizes:
        bias = params[:, off:off + nf]
        weight = params[:, off + nf:off + 2 * nf]
        out.append((weight, bias))
        off += 2 * nf
    return out


def grid_decoder(sd, prefix, grid, adain_params, sizes, use_selayer=False):
    """GridDecoder non-sine (sparenet_generator.py:962-1062):
    [conv -> AdaIN -> BN -> (SE) -> relu] x3, conv4 + tanh.
    grid [B, 2, S] -> [B, 3, S]."""
    style = split_adain(adain_params, sizes)
    x = grid
    for i, (w, b) in enumerate(style, start=1):
        x = conv1d(sd, f"{prefix}.conv{i}", x)
        x = adain(x, w, b)
        x = bn_eval(sd, f"{prefix}.bn{i}", x)
        if use_selayer:
            x = se(sd, f"{prefix}.se{i}", x)
        x = F.relu(x)
    return torch.tanh(conv1d(sd, f"{prefix}.conv4", x))


def point_gen_con(sd, prefix, x, use_selayer=False):
    """PointGenCon (sparenet_generator.py:463-527). x [B, Cin, S] ->
    [B, 3, S]."""
    for i in (1, 2, 3):
        x = conv1d(sd, f"{prefix}.conv{i}", x)
        x = bn_eval(sd, f"{prefix}.bn{i}", x)
        if use_selayer:
            x = se(sd, f"{prefix}.se{i}", x)
        x = F.relu(x)
    return torch.tanh(conv1d(sd, f"{prefix}.conv4", x))


def pointnet_res(sd, prefix, x, use_selayer=False):
    """PointNetRes (sparenet_generator.py:582-646). x [B, 4, N] ->
    [B, 3, N]; se3 does not exist, bn7 is registered but unused."""

    def block(v, i):
        v = conv1d(sd, f"{prefix}.conv{i}", v)
        v = bn_eval(sd, f"{prefix}.bn{i}", v)
        if use_selayer and i != 3:
            v = se(sd, f"{prefix}.se{i}", v)
        return F.relu(v)

    x = block(x, 1)
    pointfeat = x
    x = block(x, 2)
    x = conv1d(sd, f"{prefix}.conv3", x)
    x = bn_eval(sd, f"{prefix}.bn3", x)
    g = x.max(dim=2, keepdim=True)[0].expand(-1, -1, x.shape[2])
    x = torch.cat([g, pointfeat], dim=1)
    x = block(x, 4)
    x = block(x, 5)
    x = block(x, 6)
    return torch.tanh(conv1d(sd, f"{prefix}.conv7", x))


# ---------------------------------------------------------------------------
# non-parametric reference ops, in numpy (independent reimplementation)
# ---------------------------------------------------------------------------

def mst_stats_np(cloud, primitive_size):
    """Prim's MST per contiguous primitive (expansion_penalty_cuda.cu:45-57):
    cloud [N, 3] -> mean over primitives of (sum of MST edge lengths /
    (S - 1)) (expansion_penalty_module.py:40)."""
    n = cloud.shape[0]
    s = primitive_size
    means = []
    for p0 in range(0, n, s):
        pts = cloud[p0:p0 + s].astype(np.float64)
        visited = np.zeros(s, bool)
        visited[0] = True
        cur = np.linalg.norm(pts - pts[0], axis=1)
        total = 0.0
        for _ in range(s - 1):
            cur[visited] = np.inf
            nxt = int(np.argmin(cur))
            total += cur[nxt]
            visited[nxt] = True
            cur = np.minimum(cur, np.linalg.norm(pts - pts[nxt], axis=1))
        means.append(total / (s - 1))
    return float(np.mean(means))


def mds_np(cloud, npoint, mean_mst_length, heavy_from=8192):
    """Greedy minimum-density sampling (MDS_cuda.cu:104-211): selection 0
    is point 0; density += w * exp(-d^2 / t), t = 5 * mml^2, w doubled
    for index >= heavy_from; selected densities pinned to 1e9."""
    n = cloud.shape[0]
    t = 5.0 * mean_mst_length * mean_mst_length
    w = np.where(np.arange(n) >= heavy_from, 2.0, 1.0).astype(np.float32)
    temp = np.zeros(n, np.float32)
    temp[0] = 1e9
    idxs = np.zeros(npoint, np.int32)
    last = 0
    for j in range(1, npoint):
        d2 = np.sum((cloud - cloud[last]) ** 2, axis=1)
        temp = temp + w * np.exp(-d2 / t).astype(np.float32)
        nxt = int(np.argmin(temp))
        temp[nxt] = 1e9
        idxs[j] = nxt
        last = nxt
    return idxs


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def sparenet_refine_pass(sd, cloud_np, partial, *, num_points,
                         primitive_size, use_selayer,
                         prefix="refine.residual", idx=None):
    """One SpareNetRefine pass (sparenet_generator.py:530-579) on a
    given cloud: MST stats -> flag concat -> MDS resample -> gather ->
    residual delta. cloud_np/partial [B, N(_in), 3] numpy ->
    (refined [B, num_points, 3], idx, mml). Pass ``idx`` to pin the MDS
    selection (pure weight-parity mode — greedy MDS on a degenerate
    cloud is all-ties and any 1-ulp numerics difference reorders it)."""
    b = cloud_np.shape[0]
    mml = np.array(
        [mst_stats_np(cloud_np[i], primitive_size) for i in range(b)],
        np.float32)
    base = np.concatenate([
        np.concatenate(
            [cloud_np, np.zeros(cloud_np.shape[:2] + (1,), np.float32)], 2),
        np.concatenate(
            [partial, np.ones(partial.shape[:2] + (1,), np.float32)], 2),
    ], axis=1)
    if idx is None:
        idx = np.stack([
            mds_np(base[i, :, :3], num_points, mml[i]) for i in range(b)])
    gathered = np.take_along_axis(base, idx[..., None], axis=1)
    gt = torch.from_numpy(gathered.transpose(0, 2, 1).copy())  # [B,4,N]
    with torch.no_grad():
        delta = pointnet_res(sd, prefix, gt, use_selayer)
        out = (gt[:, :3, :] + delta).transpose(2, 1).contiguous()
    return out.numpy(), idx, mml


def sparenet_forward(sd, partial, *, num_points, n_primitives, use_adain,
                     encode, use_selayer, grid):
    """Full SpareNetGenerator eval forward
    (models/sparenet_generator.py:63-82). partial [B, N_in, 3] numpy ->
    (coarse, middle, refine [B, N, 3], loss info dict) numpy."""
    b = partial.shape[0]
    x = torch.from_numpy(partial.transpose(0, 2, 1))          # [B, 3, N]

    with torch.no_grad():
        if encode == "Residualnet":
            feat = edgeconv_res_feat(sd, "encoder.feat_extractor", x,
                                     use_selayer=use_selayer)
        else:
            feat = pointnetfeat(sd, "encoder.feat_extractor", x,
                                use_selayer=use_selayer)
        style = encoder_head(sd, feat)

        s = num_points // n_primitives
        g = torch.from_numpy(
            np.broadcast_to(grid.T[None], (b, 2, s)).copy())  # [B, 2, S]
        sizes = (1026, 513, 256)
        outs = []
        if use_adain == "share":
            h = F.relu(linear(sd, "decoder.mlp.0", style))
            ap = linear(sd, "decoder.mlp.2", h)
            for p in range(n_primitives):
                outs.append(grid_decoder(
                    sd, f"decoder.decoder.{p}.dec", g, ap, sizes,
                    use_selayer))
        elif use_adain == "no_share":
            for p in range(n_primitives):
                h = F.relu(linear(sd, f"decoder.decoder.{p}.mlp.0", style))
                ap = linear(sd, f"decoder.decoder.{p}.mlp.2", h)
                outs.append(grid_decoder(
                    sd, f"decoder.decoder.{p}.dec", g, ap, sizes,
                    use_selayer))
        else:  # no_use: concat style onto the grid
            y = style[:, :, None].expand(-1, -1, s)
            gy = torch.cat([g, y], dim=1)
            for p in range(n_primitives):
                outs.append(point_gen_con(
                    sd, f"decoder.decoder.{p}", gy, use_selayer))
        coarse = torch.cat(outs, dim=2).transpose(2, 1)       # [B, N, 3]

    coarse_np = coarse.numpy()
    middle, idx1, mml1 = sparenet_refine_pass(
        sd, coarse_np, partial, num_points=num_points, primitive_size=s,
        use_selayer=use_selayer)
    refine, idx2, mml2 = sparenet_refine_pass(
        sd, middle, partial, num_points=num_points, primitive_size=s,
        use_selayer=use_selayer)
    return (coarse_np, middle, refine,
            {"idx1": idx1, "idx2": idx2, "mml1": mml1, "mml2": mml2})


def atlasnet_forward(sd, partial, *, num_points, n_primitives, grids):
    """AtlasNet eval forward (models/atlasnet_generator.py:38-58).
    grids [P, B, S, 2] numpy -> completion [B, N, 3] numpy."""
    b = partial.shape[0]
    x = torch.from_numpy(partial.transpose(0, 2, 1))
    with torch.no_grad():
        feat = pointnetfeat(sd, "encoder.feat_extractor", x)
        style = encoder_head(sd, feat)
        outs = []
        for p in range(n_primitives):
            g = torch.from_numpy(grids[p].transpose(0, 2, 1))  # [B,2,S]
            y = style[:, :, None].expand(-1, -1, g.shape[2])
            outs.append(point_gen_con(sd, f"decoder.{p}",
                                      torch.cat([g, y], dim=1)))
        out = torch.cat(outs, dim=2).transpose(2, 1)
    return out.numpy()


def msn_forward(sd, partial, *, num_points, n_primitives, grids):
    """MSN eval forward (models/msn_generator.py:42-82)."""
    s = num_points // n_primitives
    coarse = atlasnet_forward(sd, partial, num_points=num_points,
                              n_primitives=n_primitives, grids=grids)
    refine, idx, mml = sparenet_refine_pass(
        sd, coarse, partial, num_points=num_points, primitive_size=s,
        use_selayer=False, prefix="res")
    return coarse, refine, idx, mml
