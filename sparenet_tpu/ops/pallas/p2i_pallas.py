"""Pallas TPU kernel: p2i max-reduce splatting via sorted tile buckets.

The XLA path (ops/p2i.py) expands a (2*ceil(R)+2)^2 pixel window per
point and scatter-maxes hundreds of millions of contributions — correct
but scatter-bound. This kernel flips the data flow the TPU way:

  1. (XLA prep) every point is replicated onto the <= 4 image tiles its
     radius can touch, entries are grouped by (image, tile) bucket, and
     each bucket is padded to a whole number of fixed-size chunks;
  2. (kernel, PrefetchScalarGridSpec) the grid walks the chunk list; the
     prefetched bucket id selects the output tile block, so consecutive
     chunks of one bucket keep the tile blocks resident in VMEM; points
     are broadcast against the tile _VEC at a time and max-accumulated.

Tiles are [32, 128] — lane-exact for the (8, 128) vector registers (a
[32, 32] tile wastes 3/4 of every lane vector). Two prep strategies:

  * ``grouped=True`` (the renderer's layout: each image's points contiguous,
    identical point count per image): a counting sort — per-image
    per-bucket ranks from 16 masked cumsums — replaces the 4P-entry
    stable argsort, which costs ~0.5 s at GAN scale;
  * ``grouped=False``: general stable argsort over bucket keys.

Winner semantics match ops/p2i.py (and the CUDA reference's effective
behavior): updates only where the value strictly exceeds the (zero)
background, ties broken toward the lowest point id. Zero background only
(what the renderer always uses, utils/p2i_utils.py:221); the dispatcher
falls back to XLA otherwise. ``with_ids=False`` skips winner-id tracking
entirely — the fast path for renders that are never differentiated
(ground-truth / partial-input depth maps in the GAN step).

Reference: cuda/p2i_op/p2i_max.h:7-66 (forward), :68-143 (backward).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 32          # tile rows (sublane axis; >= splat window, so <= 2 tiles/axis)
_TW = 128         # tile cols (lane axis)
_CHUNK = 2048     # entries per grid step
_VEC = 8          # points broadcast against the tile per vector step

# cos(pi * sqrt(s)) is entire in s: truncated Taylor series, f32-exact
# (term k=10 is ~2e-9). Replaces sqrt+cos in the kernel hot loop, which
# ablation-profiled at 80% of kernel time (scripts/profile_p2i.py).
_COS_COEFFS = tuple(
    0.5 * (-1.0) ** k * math.pi ** (2 * k) / math.factorial(2 * k)
    for k in range(1, 11))


def cos_weight_sq(s):
    """w = 0.5 + 0.5 * cos(pi * sqrt(s)) via Horner on the Taylor series
    in s = (r / R)^2; exact to f32 ulps on s in [0, 1]."""
    w = jnp.full_like(s, _COS_COEFFS[-1])
    for c in _COS_COEFFS[-2::-1]:
        w = w * s + c
    return w * s + 1.0


def _bucket_keys(points, batch_inds, radius, b, th, tw):
    """Per replica (dy, dx): bucket id of every point, or n_buckets if
    the replica is out of range / invalid. Returns [4, P] int32."""
    n_buckets = b * th * tw
    ty0 = jnp.floor((points[:, 0] - radius) / _TH).astype(jnp.int32)
    ty1 = jnp.floor((points[:, 0] + radius) / _TH).astype(jnp.int32)
    tx0 = jnp.floor((points[:, 1] - radius) / _TW).astype(jnp.int32)
    tx1 = jnp.floor((points[:, 1] + radius) / _TW).astype(jnp.int32)
    reps = []
    for dy in (0, 1):
        for dx in (0, 1):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = (
                (ty <= ty1) & (tx <= tx1)
                & (ty >= 0) & (ty < th) & (tx >= 0) & (tx < tw)
                & (batch_inds >= 0) & (batch_inds < b)
            )
            bucket = (batch_inds * th + ty) * tw + tx
            reps.append(jnp.where(ok, bucket, n_buckets))
    return jnp.stack(reps, 0)                                 # [4, P]


def _prep_sorted(points, point_features, batch_inds, radius, b, h, w):
    """General prep: stable argsort over bucket keys (any layout)."""
    p = points.shape[0]
    th, tw = h // _TH, w // _TW
    n_buckets = b * th * tw

    bucket4 = _bucket_keys(points, batch_inds, radius, b, th, tw).reshape(-1)
    pid4 = jnp.tile(jnp.arange(p, dtype=jnp.int32), 4)

    order = jnp.argsort(bucket4, stable=True)
    sb = bucket4[order]
    spid = pid4[order]

    # per-bucket counts from the sorted keys (searchsorted beats a
    # 4M-update scatter histogram by ~30x on TPU)
    bounds = jnp.searchsorted(
        sb, jnp.arange(n_buckets + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = bounds[:n_buckets]
    counts = bounds[1:] - starts
    # every bucket owns >= 1 chunk so its tile gets initialized
    pad_counts = jnp.maximum(-(-counts // _CHUNK), 1) * _CHUNK
    pad_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)])  # [NB+1]

    e = -(-(4 * p + n_buckets * _CHUNK) // _CHUNK) * _CHUNK   # static cap
    i4 = jnp.arange(4 * p, dtype=jnp.int32)
    ok4 = sb < n_buckets
    sb_c = jnp.clip(sb, 0, n_buckets - 1)
    dst = pad_offsets[sb_c] + (i4 - starts[sb_c])
    dst = jnp.where(ok4, dst, e)                              # drop invalid

    entry_pid = jnp.zeros((e,), jnp.int32).at[dst].set(
        spid, mode="drop", unique_indices=True)
    valid = jnp.zeros((e,), jnp.int32).at[dst].set(
        jnp.ones_like(spid), mode="drop", unique_indices=True)

    nc = e // _CHUNK
    cslot = jnp.arange(nc, dtype=jnp.int32) * _CHUNK
    chunk_bucket = (jnp.searchsorted(pad_offsets, cslot, side="right")
                    .astype(jnp.int32) - 1)
    chunk_bucket = jnp.clip(chunk_bucket, 0, n_buckets - 1)
    chunk_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (chunk_bucket[1:] != chunk_bucket[:-1]).astype(jnp.int32)])
    return entry_pid, valid, chunk_bucket, chunk_first, th, tw, n_buckets


def _prep_grouped(points, point_features, batch_inds, radius, b, h, w):
    """Per-image-sort prep for the renderer layout: image i's points are
    rows [i*n0, (i+1)*n0) (batch_inds is redundant there). A batched
    stable lax.sort of the [NI, 4*n0] local-key rows replaces both the
    flat global argsort (~200 ms wall at GAN scale, 64x16384 pts) and
    the 16-masked-cumsum counting sort (~127 ms) at ~80 ms wall
    (~40 ms of which is the sync transfer; scripts/profile_p2i_prep.py,
    bit-exactness asserted there). Equal keys keep (replica, pid) order
    under the stable sort, identical to the counting sort's rank order,
    so winner-tie semantics are unchanged."""
    p = points.shape[0]
    th, tw = h // _TH, w // _TW
    kpi = th * tw                                             # keys per image
    n_buckets = b * kpi
    n0 = p // b
    ecap = 4 * n0                                             # entries/image
    s_img = ecap + kpi * _CHUNK                               # padded region
    e = b * s_img

    keys4 = _bucket_keys(points, batch_inds, radius, b, th, tw)  # [4, P]
    img = jnp.arange(b, dtype=jnp.int32)[:, None]
    # local tile key within the image, kpi = invalid
    local4 = keys4.reshape(4, b, n0) - (img * kpi)[None]
    local4 = jnp.where((local4 >= 0) & (local4 < kpi), local4, kpi)
    keys = jnp.transpose(local4, (1, 0, 2)).reshape(b, ecap)  # [NI, 4n0]
    pid4 = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32).reshape(1, b, n0),
        (4, b, n0))
    pids = jnp.transpose(pid4, (1, 0, 2)).reshape(b, ecap)

    sk, sp = jax.lax.sort((keys, pids), dimension=-1, num_keys=1)

    # per-image bucket bounds from the sorted keys
    targets = jnp.arange(kpi + 1, dtype=jnp.int32)
    bounds = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="left")
    )(sk).astype(jnp.int32)                                   # [NI, kpi+1]
    counts = bounds[:, 1:] - bounds[:, :-1]

    pad_counts = jnp.maximum(-(-counts // _CHUNK), 1) * _CHUNK  # [NI, kpi]
    loc_off = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(pad_counts, axis=1)],
        axis=1)                                               # [NI, kpi+1]

    valid_k = sk < kpi
    # per-slot (loc_off[key] - bounds[key]) as a step function of the
    # SORTED keys: kpi broadcast compare-adds, avoiding minor-axis
    # element gathers (take_along_axis here measured ~120 ms at GAN
    # scale; cumsum-based ranking ~90 ms)
    shift = loc_off[:, :kpi] - bounds[:, :kpi]                # [NI, kpi]
    val = jnp.broadcast_to(shift[:, 0:1], sk.shape)
    for k in range(1, kpi):
        val = val + jnp.where(sk >= k, shift[:, k:k+1] - shift[:, k-1:k], 0)
    slot = jnp.arange(ecap, dtype=jnp.int32)[None, :]
    dst = img * s_img + slot + val
    dst = jnp.where(valid_k, dst, e).reshape(-1)

    entry_pid = jnp.zeros((e,), jnp.int32).at[dst].set(
        sp.reshape(-1), mode="drop", unique_indices=True)
    valid = jnp.zeros((e,), jnp.int32).at[dst].set(
        valid_k.astype(jnp.int32).reshape(-1), mode="drop",
        unique_indices=True)

    # chunk -> bucket map, per image (trailing unused chunks repeat the
    # image's last bucket with first=0: harmless revisits)
    cpi = s_img // _CHUNK
    cslot = jnp.arange(cpi, dtype=jnp.int32)[None, :] * _CHUNK  # [1, cpi]
    local_cb = jnp.clip(
        jax.vmap(lambda lo: jnp.searchsorted(lo, cslot[0], side="right"))(
            loc_off).astype(jnp.int32) - 1,
        0, kpi - 1)                                           # [NI, cpi]
    chunk_bucket = (img * kpi + local_cb).reshape(-1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), jnp.int32),
         (local_cb[:, 1:] != local_cb[:, :-1]).astype(jnp.int32)], axis=1)
    chunk_first = first.reshape(-1)
    return entry_pid, valid, chunk_bucket, chunk_first, th, tw, n_buckets


def _make_kernel(radius: float, th: int, tw: int, with_ids: bool):
    def kernel(bucket_ref, first_ref, pts_ref, feat_ref, pid_ref, valid_ref,
               val_ref, *maybe_id_ref):
        ci = pl.program_id(0)

        @pl.when(first_ref[ci] == 1)
        def _():
            val_ref[:] = jnp.zeros_like(val_ref)
            if with_ids:
                maybe_id_ref[0][:] = jnp.full_like(maybe_id_ref[0], -1)

        bkt = bucket_ref[ci]
        oy = ((bkt // tw) % th * _TH).astype(jnp.float32)
        ox = (bkt % tw * _TW).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (1, _TH, _TW), 1).astype(jnp.float32) + oy
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (1, _TH, _TW), 2).astype(jnp.float32) + ox

        def body(i, _):
            s = i * _VEC
            py = pts_ref[pl.ds(s, _VEC), 0].reshape(_VEC, 1, 1)
            px = pts_ref[pl.ds(s, _VEC), 1].reshape(_VEC, 1, 1)
            f = feat_ref[pl.ds(s, _VEC), 0].reshape(_VEC, 1, 1)
            ok = valid_ref[pl.ds(s, _VEC), 0].reshape(_VEC, 1, 1)
            dy = rows - py
            dx = cols - px
            r2 = dy * dy + dx * dx
            w = cos_weight_sq(r2 * (1.0 / (radius * radius)))
            wv = jnp.where((r2 <= radius * radius) & (ok > 0), w * f,
                           -jnp.inf)
            best = jnp.max(wv, axis=0)                        # [TH, TW]
            cur = val_ref[0]
            upd = best > cur
            val_ref[0] = jnp.where(upd, best, cur)
            if with_ids:
                pid = pid_ref[pl.ds(s, _VEC), 0].reshape(_VEC, 1, 1)
                is_best = wv >= best[None]
                gid = jnp.min(
                    jnp.where(is_best & (wv > -jnp.inf), pid,
                              jnp.int32(2 ** 30)),
                    axis=0)
                maybe_id_ref[0][0] = jnp.where(upd, gid, maybe_id_ref[0][0])
            return _

        jax.lax.fori_loop(0, _CHUNK // _VEC, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("radius", "b", "h", "w", "with_ids", "grouped",
                     "interpret"))
def p2i_max_pallas(points, point_features, batch_inds, radius: float,
                   b: int, h: int, w: int, with_ids: bool = True,
                   grouped: bool = False, interpret: bool = False):
    """points [P,2] (y,x) px; features [P,1]; batch_inds [P] ->
    (out [B,H,W,1], winner ids [B,H,W,1] int32 or None), zero background.

    ``grouped=True`` asserts the renderer layout (image i's points are
    the contiguous rows [i*P/b, (i+1)*P/b)) and uses the counting-sort
    prep; ``with_ids=False`` skips winner tracking (non-differentiated
    renders)."""
    points = jax.lax.stop_gradient(points)
    point_features = jax.lax.stop_gradient(point_features)

    prep = _prep_grouped if grouped and points.shape[0] % b == 0 \
        else _prep_sorted
    (entry_pid, entry_valid, chunk_bucket, chunk_first, th, tw, nb) = prep(
        points, point_features, batch_inds, radius, b, h, w)
    entry_pts = points[entry_pid]
    entry_feat = point_features[entry_pid, 0]

    nc = chunk_bucket.shape[0]
    kernel = _make_kernel(float(radius), th, tw, with_ids)

    out_specs = [pl.BlockSpec((1, _TH, _TW), lambda ci, cb, cf: (cb[ci], 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((nb, _TH, _TW), jnp.float32)]
    if with_ids:
        out_specs.append(
            pl.BlockSpec((1, _TH, _TW), lambda ci, cb, cf: (cb[ci], 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nb, _TH, _TW), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,           # chunk_bucket, chunk_first
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((_CHUNK, 2), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((_CHUNK, 1), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((_CHUNK, 1), lambda ci, cb, cf: (ci, 0)),
            pl.BlockSpec((_CHUNK, 1), lambda ci, cb, cf: (ci, 0)),
        ],
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(chunk_bucket, chunk_first, entry_pts,
      entry_feat[:, None], entry_pid[:, None], entry_valid[:, None])

    def tiles_to_image(t):
        t = t.reshape(b, th, tw, _TH, _TW)
        t = jnp.transpose(t, (0, 1, 3, 2, 4))
        return t.reshape(b, h, w, 1)

    if with_ids:
        return tiles_to_image(outs[0]), tiles_to_image(outs[1])
    return tiles_to_image(outs[0]), None
