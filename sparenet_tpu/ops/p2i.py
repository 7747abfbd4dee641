"""p2i: differentiable point -> image feature splatting (sum & max reduce).

TPU-native equivalent of ``cuda/p2i_op`` (p2i_sum.h:7-131,
p2i_max.h:7-143, utility.h:82-100, __init__.py:99-131).

Each point paints pixels within euclidean ``kernel_radius`` R using the
cosine kernel ``w = cos(r * pi / R) * 0.5 + 0.5``. ``sum`` accumulates
w * feature over the background; ``max`` keeps the per-pixel maximum of
w * feature vs the background, tracking the winning point id per
(batch, pixel, channel) for the backward pass.

TPU design: the CUDA kernels iterate pixels per point under spin locks;
here each point expands a static (2 * ceil(R) + 2)^2 pixel window and the
contributions become one deterministic XLA scatter-add / scatter-max (no
locks — scatters are deterministic on TPU). Backward passes are custom
VJPs implementing the reference's analytic formulas, including the
``max(r, 1e-10)`` guard at r = 0 (p2i_sum.h:113-127, p2i_max.h:121-138).

Image layout: channel-last [B, H, W, C]. Points are [P, 2] in (y, x)
pixel coordinates (the ±1 -> pixel mapping of the reference wrapper lives
in the renderer, sparenet_tpu/renderer).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["p2i_sum", "p2i_max", "p2i"]


def _window(points: jnp.ndarray, radius: float, h: int, w: int):
    """Candidate pixels per point.

    Returns (py_idx, px_idx [P, K, K] int32, dy, dx, r [P, K, K], valid mask)
    where K = 2 * ceil(R) + 2 covers floor(p - R) .. ceil(p + R).
    """
    k = 2 * int(math.ceil(radius)) + 2
    base = jnp.floor(points - radius).astype(jnp.int32)          # [P, 2]
    offs = jnp.arange(k, dtype=jnp.int32)
    py = base[:, 0:1] + offs                                      # [P, K]
    px = base[:, 1:2] + offs                                      # [P, K]
    pyg = py[:, :, None]                                          # [P, K, 1]
    pxg = px[:, None, :]                                          # [P, 1, K]
    dy = pyg.astype(points.dtype) - points[:, 0, None, None]
    dx = pxg.astype(points.dtype) - points[:, 1, None, None]
    r = jnp.sqrt(dy * dy + dx * dx)
    valid = (
        (pyg >= 0) & (pyg < h) & (pxg >= 0) & (pxg < w) & (r <= radius)
    )
    pyb = jnp.broadcast_to(pyg, (points.shape[0], k, k))
    pxb = jnp.broadcast_to(pxg, (points.shape[0], k, k))
    dy = jnp.broadcast_to(dy, pyb.shape)
    dx = jnp.broadcast_to(dx, pyb.shape)
    r = jnp.broadcast_to(r, pyb.shape)
    return pyb, pxb, dy, dx, r, valid


def _cos_weight(r, radius):
    return jnp.cos(r * jnp.pi / radius) * 0.5 + 0.5


# --------------------------------------------------------------------------
# sum reduce
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def p2i_sum(points, point_features, batch_inds, background, kernel_radius):
    """points [P,2] (y,x) px coords; features [P,C]; batch_inds [P] int32;
    background [B,H,W,C] -> [B,H,W,C]."""
    background = jnp.asarray(background)
    b, h, w, c = background.shape
    py, px, dy, dx, r, valid = _window(points, kernel_radius, h, w)
    weight = _cos_weight(r, kernel_radius)
    bvalid = (batch_inds >= 0) & (batch_inds < b)
    valid = valid & bvalid[:, None, None]
    contrib = (weight * valid)[..., None] * point_features[:, None, None, :]
    bi = jnp.broadcast_to(batch_inds[:, None, None], py.shape)
    # route invalid contributions to a dropped row
    bi = jnp.where(valid, bi, b)
    return background.at[bi, py, px].add(contrib, mode="drop")


def _p2i_sum_fwd(points, point_features, batch_inds, background, kernel_radius):
    out = p2i_sum(points, point_features, batch_inds, background, kernel_radius)
    return out, (points, point_features, batch_inds, background.shape)


def _p2i_sum_bwd(kernel_radius, res, g):
    points, point_features, batch_inds, bg_shape = res
    b, h, w, c = bg_shape
    py, px, dy, dx, r, valid = _window(points, kernel_radius, h, w)
    bvalid = (batch_inds >= 0) & (batch_inds < b)
    valid = valid & bvalid[:, None, None]
    weight = _cos_weight(r, kernel_radius)

    bi = jnp.broadcast_to(batch_inds[:, None, None], py.shape)
    bi = jnp.where(valid, jnp.clip(bi, 0, b - 1), 0)
    og = g[bi, py * valid, px * valid]                 # [P, K, K, C]
    og = og * valid[..., None]

    pf_grad = jnp.sum(og * weight[..., None], axis=(1, 2))
    # grad of the kernel weight -> point coords (p2i_sum.h:107-127)
    wg = jnp.sum(og * point_features[:, None, None, :], axis=-1)  # [P,K,K]
    kfac = (
        wg
        * jnp.sin(r * jnp.pi / kernel_radius)
        * 0.5 * jnp.pi / kernel_radius
        / jnp.maximum(r, 1e-10)
    ) * valid
    pt_grad = jnp.stack(
        [jnp.sum(kfac * dy, axis=(1, 2)), jnp.sum(kfac * dx, axis=(1, 2))],
        axis=-1,
    )
    return pt_grad, pf_grad, None, g


p2i_sum.defvjp(_p2i_sum_fwd, _p2i_sum_bwd)


# --------------------------------------------------------------------------
# max reduce
# --------------------------------------------------------------------------

def _p2i_max_forward(points, point_features, batch_inds, background, kernel_radius):
    background = jnp.asarray(background)
    b, h, w, c = background.shape
    p = points.shape[0]
    py, px, dy, dx, r, valid = _window(points, kernel_radius, h, w)
    weight = _cos_weight(r, kernel_radius)
    bvalid = (batch_inds >= 0) & (batch_inds < b)
    valid = valid & bvalid[:, None, None]

    wv = weight[..., None] * point_features[:, None, None, :]     # [P,K,K,C]
    neg_inf = jnp.array(-jnp.inf, background.dtype)
    wv_m = jnp.where(valid[..., None], wv, neg_inf)

    bi = jnp.broadcast_to(batch_inds[:, None, None], py.shape)
    bi = jnp.where(valid, bi, b)
    out = background.at[bi, py, px].max(wv_m, mode="drop")

    # winner ids: smallest point id whose (strictly > background) value
    # equals the pixel max. CUDA updates only on current < weighted
    # (p2i_max.h:52-58), so values merely equal to the background leave
    # id = -1.
    gathered = out[jnp.where(valid, bi, 0), py * valid, px * valid]
    bg_g = background[jnp.where(valid, bi, 0), py * valid, px * valid]
    is_winner = valid[..., None] & (wv >= gathered) & (wv > bg_g)
    pid = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[:, None, None, None], is_winner.shape
    )
    big = jnp.int32(2**31 - 1)
    ids = jnp.full((b, h, w, c), big, jnp.int32).at[
        jnp.where(is_winner, bi[..., None], b), py[..., None] * is_winner,
        px[..., None] * is_winner,
        jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), is_winner.shape),
    ].min(jnp.where(is_winner, pid, big), mode="drop")
    out_point_ids = jnp.where(ids == big, -1, ids)
    return out, out_point_ids


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def p2i_max(points, point_features, batch_inds, background, kernel_radius):
    """Max-reduce splat -> [B,H,W,C] (winner ids are internal, used by VJP)."""
    out, _ = _p2i_max_forward(points, point_features, batch_inds, background,
                              kernel_radius)
    return out


def _p2i_max_fwd(points, point_features, batch_inds, background, kernel_radius):
    out, ids = _p2i_max_forward(points, point_features, batch_inds, background,
                                kernel_radius)
    return out, (points, point_features, ids)


def _p2i_max_bwd(kernel_radius, res, g):
    points, point_features, ids = res
    b, h, w, c = g.shape
    p = points.shape[0]
    won = ids >= 0
    safe_id = jnp.where(won, ids, 0)

    yy = jnp.arange(h, dtype=points.dtype)[None, :, None, None]
    xx = jnp.arange(w, dtype=points.dtype)[None, None, :, None]
    py = points[:, 0][safe_id]
    px = points[:, 1][safe_id]
    dy = yy - py
    dx = xx - px
    r = jnp.sqrt(dy * dy + dx * dx)
    weight = _cos_weight(r, kernel_radius)

    gm = g * won
    sid = jnp.where(won, safe_id, p)                  # row p = dropped
    # feature grads: scatter-add g * w at (winner id, channel)
    ch = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), g.shape)
    pf_grad = jnp.zeros((p + 1, c), point_features.dtype).at[sid, ch].add(
        gm * weight
    )[:p]

    f_at = point_features[safe_id, ch]
    wg = gm * f_at
    kfac = (
        wg * jnp.sin(r * jnp.pi / kernel_radius)
        * 0.5 * jnp.pi / kernel_radius
        / jnp.maximum(r, 1e-10)
    )
    pt_grad = jnp.zeros((p + 1, 2), points.dtype).at[sid].add(
        jnp.stack([kfac * dy, kfac * dx], axis=-1)
    )[:p]

    bg_grad = jnp.where(won, 0.0, g)
    return pt_grad, pf_grad, None, bg_grad


p2i_max.defvjp(_p2i_max_fwd, _p2i_max_bwd)


def p2i(points, point_features, batch_inds, background, kernel_radius,
        kernel_kind_str="cos", reduce="sum"):
    """Dispatcher matching the reference wrapper signature
    (cuda/p2i_op/__init__.py:99-131), taking points already in (y, x)
    pixel coordinates."""
    assert kernel_kind_str == "cos"
    if reduce == "sum":
        return p2i_sum(points, point_features, batch_inds, background,
                       kernel_radius)
    if reduce == "max":
        return p2i_max(points, point_features, batch_inds, background,
                       kernel_radius)
    raise ValueError(f"Invalid reduce value: {reduce}")
