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
contributions become deterministic XLA scatters (no locks). The point
axis is processed in fixed-size chunks under ``lax.scan`` carrying the
image, bounding the windowed intermediates to a constant memory budget
(a 16k-point x 8-view x radius-10 splat would otherwise materialize
multi-GB tensors). Backward passes are custom VJPs implementing the
reference's analytic formulas, including the ``max(r, 1e-10)`` guard at
r = 0 (p2i_sum.h:113-127, p2i_max.h:121-138).

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

# max windowed contributions materialized at once (elems ~= budget * K^2)
_CHUNK_BUDGET = 1 << 23


def _window_k(radius: float) -> int:
    return 2 * int(math.ceil(radius)) + 2


def _point_chunks(p: int, radius: float) -> int:
    k = _window_k(radius)
    chunk = max(1, _CHUNK_BUDGET // (k * k))
    return min(p, chunk)


def _window(points: jnp.ndarray, radius: float, h: int, w: int):
    """Candidate pixels per point.

    Returns (py_idx, px_idx [P, K, K] int32, dy, dx, r [P, K, K], valid)
    where K = 2 * ceil(R) + 2 covers floor(p - R) .. ceil(p + R).
    """
    k = _window_k(radius)
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
    shape = (points.shape[0], k, k)
    return (jnp.broadcast_to(pyg, shape), jnp.broadcast_to(pxg, shape),
            jnp.broadcast_to(dy, shape), jnp.broadcast_to(dx, shape),
            jnp.broadcast_to(r, shape), valid)


def _cos_weight(r, radius):
    # Taylor-in-r^2 evaluation of cos(pi r / R) * 0.5 + 0.5, f32-exact on
    # r <= R (see pallas/p2i_pallas.cos_weight_sq) — keeps every splat
    # path (XLA and Pallas kernel) bit-consistent while dodging the
    # sqrt+cos pair that dominates the kernel's hot loop.
    from .pallas.p2i_pallas import cos_weight_sq
    s = r / radius
    return cos_weight_sq(s * s)


def _chunked(points, point_features, batch_inds, radius, init, step):
    """Run `step(carry, (pts, feats, binds))` over fixed-size point chunks."""
    p = points.shape[0]
    chunk = _point_chunks(p, radius)
    pad = (-p) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    fts = jnp.pad(point_features, ((0, pad), (0, 0)))
    # padded points carry batch index -1 -> dropped
    bis = jnp.pad(batch_inds, (0, pad), constant_values=-1)
    n_chunks = pts.shape[0] // chunk
    pts = pts.reshape(n_chunks, chunk, 2)
    fts = fts.reshape(n_chunks, chunk, -1)
    bis = bis.reshape(n_chunks, chunk)
    offs = jnp.arange(n_chunks) * chunk
    carry, _ = jax.lax.scan(step, init, (pts, fts, bis, offs))
    return carry


# --------------------------------------------------------------------------
# sum reduce
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def p2i_sum(points, point_features, batch_inds, background, kernel_radius):
    """points [P,2] (y,x) px coords; features [P,C]; batch_inds [P] int32;
    background [B,H,W,C] -> [B,H,W,C]."""
    background = jnp.asarray(background)
    b, h, w, c = background.shape

    def step(out, chunk):
        pts, fts, bis, _ = chunk
        py, px, dy, dx, r, valid = _window(pts, kernel_radius, h, w)
        weight = _cos_weight(r, kernel_radius)
        bvalid = (bis >= 0) & (bis < b)
        valid = valid & bvalid[:, None, None]
        contrib = (weight * valid)[..., None] * fts[:, None, None, :]
        bi = jnp.broadcast_to(bis[:, None, None], py.shape)
        bi = jnp.where(valid, bi, b)                     # drop row
        return out.at[bi, py, px].add(contrib, mode="drop"), None

    return _chunked(points, point_features, batch_inds, kernel_radius,
                    background, step)


def _p2i_sum_fwd(points, point_features, batch_inds, background, kernel_radius):
    out = p2i_sum(points, point_features, batch_inds, background, kernel_radius)
    return out, (points, point_features, batch_inds, jnp.shape(background))


def _p2i_sum_bwd(kernel_radius, res, g):
    points, point_features, batch_inds, bg_shape = res
    b, h, w, c = bg_shape
    p = points.shape[0]

    def step(carry, chunk):
        pf_g, pt_g = carry
        pts, fts, bis, off = chunk
        py, px, dy, dx, r, valid = _window(pts, kernel_radius, h, w)
        bvalid = (bis >= 0) & (bis < b)
        valid = valid & bvalid[:, None, None]
        weight = _cos_weight(r, kernel_radius)
        bi = jnp.where(valid, jnp.clip(
            jnp.broadcast_to(bis[:, None, None], py.shape), 0, b - 1), 0)
        og = g[bi, py * valid, px * valid] * valid[..., None]   # [pc,K,K,C]

        pf_chunk = jnp.sum(og * weight[..., None], axis=(1, 2))
        wg = jnp.sum(og * fts[:, None, None, :], axis=-1)
        kfac = (
            wg * jnp.sin(r * jnp.pi / kernel_radius)
            * 0.5 * jnp.pi / kernel_radius
            / jnp.maximum(r, 1e-10)
        ) * valid
        pt_chunk = jnp.stack(
            [jnp.sum(kfac * dy, axis=(1, 2)), jnp.sum(kfac * dx, axis=(1, 2))],
            axis=-1)
        idx = off + jnp.arange(pts.shape[0])
        pf_g = pf_g.at[idx].set(pf_chunk, mode="drop")
        pt_g = pt_g.at[idx].set(pt_chunk, mode="drop")
        return (pf_g, pt_g), None

    pad = (-p) % _point_chunks(p, kernel_radius)
    pf_g = jnp.zeros((p + pad, point_features.shape[1]), g.dtype)
    pt_g = jnp.zeros((p + pad, 2), g.dtype)
    (pf_g, pt_g) = _chunked(points, point_features, batch_inds, kernel_radius,
                            (pf_g, pt_g), step)
    return pt_g[:p], pf_g[:p], None, g


p2i_sum.defvjp(_p2i_sum_fwd, _p2i_sum_bwd)


# --------------------------------------------------------------------------
# max reduce
# --------------------------------------------------------------------------

def _p2i_max_values(points, point_features, batch_inds, background,
                    kernel_radius):
    """Max-splat values only (no winner ids) — the primal fast path."""
    background = jnp.asarray(background)
    b, h, w, c = background.shape

    def max_step(out, chunk):
        pts, fts, bis, _ = chunk
        py, px, dy, dx, r, valid = _window(pts, kernel_radius, h, w)
        weight = _cos_weight(r, kernel_radius)
        bvalid = (bis >= 0) & (bis < b)
        valid = valid & bvalid[:, None, None]
        wv = weight[..., None] * fts[:, None, None, :]
        wv = jnp.where(valid[..., None], wv, -jnp.inf)
        bi = jnp.where(valid, jnp.broadcast_to(bis[:, None, None], py.shape), b)
        return out.at[bi, py, px].max(wv, mode="drop"), None

    return _chunked(points, point_features, batch_inds, kernel_radius,
                    background, max_step)


def _p2i_max_forward(points, point_features, batch_inds, background,
                     kernel_radius):
    background = jnp.asarray(background)
    b, h, w, c = background.shape
    big = jnp.int32(2**31 - 1)

    out = _p2i_max_values(points, point_features, batch_inds, background,
                          kernel_radius)

    def id_step(ids, chunk):
        pts, fts, bis, off = chunk
        py, px, dy, dx, r, valid = _window(pts, kernel_radius, h, w)
        weight = _cos_weight(r, kernel_radius)
        bvalid = (bis >= 0) & (bis < b)
        valid = valid & bvalid[:, None, None]
        wv = weight[..., None] * fts[:, None, None, :]
        bi_raw = jnp.broadcast_to(bis[:, None, None], py.shape)
        bi = jnp.where(valid, jnp.clip(bi_raw, 0, b - 1), 0)
        gathered = out[bi, py * valid, px * valid]
        bg_g = jnp.asarray(background)[bi, py * valid, px * valid]
        # CUDA updates only when current < weighted (p2i_max.h:52-58):
        # values merely equal to the background leave id = -1
        is_winner = valid[..., None] & (wv >= gathered) & (wv > bg_g)
        pid = (off + jnp.arange(pts.shape[0], dtype=jnp.int32))[:, None, None, None]
        pid = jnp.broadcast_to(pid, is_winner.shape)
        ch = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), is_winner.shape)
        ids = ids.at[
            jnp.where(is_winner, jnp.broadcast_to(bi_raw[..., None],
                                                  is_winner.shape), b),
            jnp.broadcast_to((py * valid)[..., None], is_winner.shape),
            jnp.broadcast_to((px * valid)[..., None], is_winner.shape),
            ch,
        ].min(jnp.where(is_winner, pid, big), mode="drop")
        return ids, None

    ids = jnp.full((b, h, w, c), big, jnp.int32)
    ids = _chunked(points, point_features, batch_inds, kernel_radius,
                   ids, id_step)
    out_point_ids = jnp.where(ids == big, -1, ids)
    return out, out_point_ids


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def p2i_max(points, point_features, batch_inds, background, kernel_radius):
    """Max-reduce splat -> [B,H,W,C] (winner ids are computed only by the
    differentiation path's forward)."""
    return _p2i_max_values(points, point_features, batch_inds, background,
                           kernel_radius)


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


# --------------------------------------------------------------------------
# zero-background max reduce (renderer fast path)
# --------------------------------------------------------------------------

def _zbg_forward(points, point_features, batch_inds, b, h, w, kernel_radius,
                 grouped, with_ids):
    from .pallas.p2i_pallas import _TH, _TW, p2i_max_pallas
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if (on_tpu and h % _TH == 0 and w % _TW == 0
            and 2 * math.ceil(kernel_radius) + 2 <= min(_TH, _TW)
            and point_features.shape[1] == 1):
        return p2i_max_pallas(points, point_features, batch_inds,
                              float(kernel_radius), b, h, w,
                              with_ids=with_ids, grouped=grouped)
    bg = jnp.zeros((b, h, w, point_features.shape[1]), points.dtype)
    if with_ids:
        return _p2i_max_forward(points, point_features, batch_inds, bg,
                                kernel_radius)
    return _p2i_max_values(points, point_features, batch_inds, bg,
                           kernel_radius), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def p2i_max_zbg(points, point_features, batch_inds, b, h, w, kernel_radius,
                grouped=False):
    """Max-reduce splat over a ZERO background -> [B,H,W,C].

    The renderer's case (utils/p2i_utils.py:221 allocates a zero
    background); on TPU this routes to the tile-bucket Pallas kernel
    (ops/pallas/p2i_pallas.py). ``grouped`` promises the renderer's
    contiguous-per-image point layout (enables the counting-sort prep).
    The primal skips winner-id tracking entirely; ids are computed only
    on the differentiation path."""
    out, _ = _zbg_forward(points, point_features, batch_inds, b, h, w,
                          kernel_radius, grouped, with_ids=False)
    return out


def _p2i_zbg_fwd(points, point_features, batch_inds, b, h, w, kernel_radius,
                 grouped):
    out, ids = _zbg_forward(points, point_features, batch_inds, b, h, w,
                            kernel_radius, grouped, with_ids=True)
    return out, (points, point_features, ids)


def _p2i_zbg_bwd(b, h, w, kernel_radius, grouped, res, g):
    pt_grad, pf_grad, _, _ = _p2i_max_bwd(kernel_radius, res, g)
    return pt_grad, pf_grad, None


p2i_max_zbg.defvjp(_p2i_zbg_fwd, _p2i_zbg_bwd)


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
