"""Pallas TPU kernel for Minimum Density Sampling.

The XLA reference (sparenet_tpu.ops.mds) runs the npoint-step greedy
loop as a fori_loop whose per-step state (the [B, N] density vector)
round-trips HBM every step. This kernel keeps densities, coordinates
and outputs VMEM-resident, and the greedy step is ONE fused elementwise
pass over the [R, N] row block:

  * the selection step of each point is encoded INSIDE the density
    vector: a selected lane is pinned to 2^40 + step*2^17 (exactly
    representable in f32, far above any reachable real density and far
    below the 2^45 padding sentinel), so there is no separate [R, N]
    step-map write per step — per-stage decode passes recover the map;
  * pinning happens lazily at the START of the next step (fused into
    the density update via the carried selection index); per-step
    density adds (<= 2) to pinned/padding lanes round away EXACTLY
    against the 2^40-based values (ulp = 2^17), so the update needs no
    masking guard at all (the reference achieves the same through f32
    rounding against 1e9, MDS_cuda.cu:114-133);
  * the selected point's coordinates are fetched with full-row one-hot
    reductions (a 128-lane dynamic-slice variant was ablated ~36%
    slower), and the density update runs in exp2 dot-product form with
    a precomputed per-lane bias (see _stage_kernel);
  * argmin uses an explicit lowest-index tie-break (ops/pallas/reduce):
    Mosaic's native argmin picks the HIGHEST index on ties, which
    diverges from the XLA reference exactly when densities underflow to
    0 (routine at production t values);
  * **staged lane compaction**: greedy MDS kills exactly one lane per
    step, so the loop runs in stages of ``_STAGE_LEN`` steps with dead
    lanes compacted out between stages (variadic-sort glue, order-
    stable so tie-breaking is preserved; per-lane accumulation order is
    untouched, so results are bit-identical to the unstaged kernel).
    Work drops from npoint*N to ~npoint*N - npoint^2/2 — measured 1.31x
    at the production shape (B=32, n=19384, npoint=16384,
    scripts/profile_mds_staged.py).

Semantics identical to MDS_cuda.cu:104-211 (see ops/mds.py): selection 0
is point 0; density += exp(-d^2 / t), t = 5 * mml^2, doubled for point
index >= 8192; selected densities pinned high.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reduce import argmin_lanes

_HEAVY_FROM = 8192
# Pinned-lane encoding: pin value = 2^40 + step * 2^17. ulp(2^40) = 2^17
# and the per-step density add is <= weight <= 2 << 2^16 = ulp/2, so
# round-to-nearest makes `pinned + add == pinned` EXACTLY — no masking
# guard is needed in the update pass (the old 2^23+step encoding needed
# a `told >= BIGBASE` select every step because ulp(2^23) = 1).
# step < 2^14 so step * 2^17 <= 2^31 stays inside the 23-bit mantissa;
# encode/decode are exact f32 arithmetic.
_BIGBASE = float(2 ** 40)   # pinned-lane encoding base
_STEP_SCALE = float(2 ** 17)
_PADBASE = float(2 ** 45)   # padding lanes: always above any pinned value
# Greedy steps per compaction stage: shorter stages keep the average
# live lane width lower (width decays by 1 per step) but pay one
# variadic compaction sort per boundary. Measured at the production
# shape (B=32, 16384-of-19384, v5e): 4096 -> 86.4 ms, 2048 -> 93.0 ms,
# 1024 slower still — the sorts outweigh the width saving below 4096.
# Results are bit-identical at any stage length (the sort is
# order-stable).
import os as _os
_STAGE_LEN = int(_os.environ.get(
    "SPARENET_MDS_STAGE_LEN", _os.environ.get("MDS_STAGE_LEN", "4096")))
if _STAGE_LEN < 128:
    raise ValueError(
        f"SPARENET_MDS_STAGE_LEN={_STAGE_LEN} is too small; use >= 128 "
        "(greedy steps per compaction stage)")


def _stage_kernel(lo: int, hi: int,
                  xyz_ref, bias_ref, t_ref, prev_ref, tin_ref,
                  tout_ref, last_ref):
    """Run greedy steps [lo, hi) on a (possibly compacted) lane layout.

    xyz_ref [3, R, Ns]; bias_ref [R, Ns] f32 precomputed per-lane exp2
    bias (see below); t_ref [R, 1]; prev_ref [R, 4] f32 coords of
    selection lo-1 (already pinned); tin_ref/tout_ref [R, Ns] f32
    aliased density state; last_ref [R, 4] f32 out = coords of
    selection hi-1 (pinned at exit).

    Density update in exp2 dot-product form: the per-step N-wide work
      weight * exp(-|p - s|^2 / t)
    becomes
      exp2(x*ax + y*ay + z*az + (bias - c))
    with loop-invariant per-lane bias = log2(weight) - |p|^2*inv_t*l2e
    (the 2x heavy-point weight of MDS_cuda.cu:130 is EXACTLY a +1 in
    the exp2 argument; bias is precomputed OUTSIDE the kernel, in
    XLA, and rides the compaction sort — keeping it out of scoped
    VMEM headroom) and per-step scalars ax = 2*sx*inv_t*l2e,
    c = |s|^2*inv_t*l2e from the selected point s. This trades the
    subtract-square-accumulate (8 N-wide ops) + exp + weight-mul for
    3 fma + 2 add + exp2 per lane-step. The dot form rounds
    differently from the reference's |p-s|^2 (cancellation for near
    neighbors ~1e-5 relative on the exp2 argument); selection flips on
    near-ties are within the same tolerance envelope as on-device
    exp() ulp drift (see module docstring / test header) — measured
    99.8% index agreement vs the XLA reference on hardware
    (scripts/profile_mds_prod.py).
    """
    r, n = tin_ref.shape
    x = xyz_ref[0].astype(jnp.float32)
    y = xyz_ref[1].astype(jnp.float32)
    z = xyz_ref[2].astype(jnp.float32)
    inv_t = 1.0 / t_ref[:].astype(jnp.float32)
    l2e = jnp.float32(1.4426950408889634)  # log2(e)
    kde = inv_t * l2e                                         # [R, 1]
    bias = bias_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)

    def body(j, carry):
        # carry: coords of the step-(j-1) selection (already pinned at
        # the end of step j-1 — see the pin note below)
        sx, sy, sz = carry                              # [R,1]x3
        ax = sx * (2.0 * kde)
        ay = sy * (2.0 * kde)
        az = sz * (2.0 * kde)
        # NOTE: the -c term must stay INSIDE the exp2 argument (a
        # scalar exp2(-c) post-scale of exp2(arg) would save one N-wide
        # pass but overflows: without -c, arg ~ kde * |s|^2 can exceed
        # 127 when t is tiny — degenerate clouds at train start — and
        # inf * 0 poisons the densities with NaN)
        c = (sx * sx + sy * sy + sz * sz) * kde
        arg = x * ax + y * ay + z * az + (bias - c)
        told = tin_ref[:]
        # no pinned/padding guard: adds (<= 2) round away exactly
        # against the 2^40-based pin values (see encoding note above)
        temp = told + jnp.exp2(arg)
        # lowest-index argmin, expressed so the one selection mask
        # serves BOTH the pin write and the coords extraction (the old
        # form recomputed the lane==idx compare and a f32 cast; fusing
        # them trims 3 N-wide VPU passes per greedy step: pin-compare,
        # cast, and the stage-epilogue pin pass)
        m = jnp.min(temp, axis=1, keepdims=True)
        packed = jnp.where(temp == m, lane, n)
        mn = jnp.min(packed, axis=1, keepdims=True)     # argmin index
        sel = packed == mn                              # one-hot [R, N]
        # pin selection j NOW (end of step): value 2^40 + j * 2^17
        tin_ref[:] = jnp.where(
            sel,
            jnp.float32(_BIGBASE) +
            j.astype(jnp.float32) * jnp.float32(_STEP_SCALE),
            temp)
        # coords of the selection via one-hot row reductions — a select
        # (exactly one lane nonzero, so the sum is the element itself,
        # bit-identical to the masked-multiply form). A 128-lane
        # dynamic-slice variant was ablated and is ~36% SLOWER on v5e —
        # per-row dynamic addressing serializes (scripts/profile_mds.py
        # v2 dyncoord=True vs False.)
        nx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        ny = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        nz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        return nx, ny, nz

    # selection lo-1 is already pinned (previous stage exit / init)
    init = (prev_ref[:, 0:1].astype(jnp.float32),
            prev_ref[:, 1:2].astype(jnp.float32),
            prev_ref[:, 2:3].astype(jnp.float32))
    lx, ly, lz = jax.lax.fori_loop(lo, hi, body, init)

    # selection hi-1 was pinned inside its own step; just emit the state
    # (tin/tout alias the same buffer via input_output_aliases) and the
    # final selection's coords for the next stage
    tout_ref[:] = tin_ref[:]
    last_ref[:] = jnp.concatenate(
        [lx, ly, lz, jnp.zeros((r, 1), jnp.float32)], axis=1)


def _run_stage(lo, hi, xyz_t, bias, t, prev, temp, interpret):
    import os
    b, ns = bias.shape
    # Row-block sizing: larger blocks amortize the per-step fixed cost
    # (the greedy chain update -> argmin -> coords is latency-bound, so
    # wider row blocks raise throughput at nearly constant step latency;
    # R=16 measured ~8% over R=8, R=32-in-one-program ~1.3x over
    # 2x R=16 — see git history / scripts/profile_mds_prod.py).
    # Mosaic's DEFAULT scoped-VMEM budget (~16 MB) is what used to cap
    # R: [16, 19456] compiled at 15.3 MB while [32, 11264] OOMed at
    # 16.4 MB. v5e physically has 128 MB VMEM, so we raise the budget
    # via CompilerParams(vmem_limit_bytes) and size blocks to the full
    # batch whenever it fits the raised budget.
    vmem_mb = int(os.environ.get("MDS_VMEM_MB", "96"))
    limit_g1 = int(os.environ.get("MDS_BLOCK_ELEMS_G1", str(2048 * 1024)))
    limit = int(os.environ.get("MDS_BLOCK_ELEMS", str(320 * 1024)))

    def fits(r):
        return r * ns <= (limit_g1 if r == b else limit)

    r = b
    while r > 1 and not fits(r):
        r //= 2
    while b % r:
        r -= 1
    grid = (b // r,)
    kernel = functools.partial(_stage_kernel, lo, hi)
    temp_out, last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, r, ns), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, ns), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, ns), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, ns), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ns), jnp.float32),
            jax.ShapeDtypeStruct((b, 4), jnp.float32),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(xyz_t, bias, t, prev, temp)
    return temp_out, last


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def mds_pallas_continue(xyz: jnp.ndarray, temp0: jnp.ndarray,
                        orig: jnp.ndarray, mean_mst_length: jnp.ndarray,
                        steps: int, interpret: bool = False) -> jnp.ndarray:
    """Continue greedy MDS for `steps` more picks from an existing
    density state (the hybrid batched-prefix / exact-tail schedule,
    ops/mds.py:_mds_hybrid).

    xyz  [B, N, 3]  LIVE-lane coords (callers compact picked lanes out;
                    N need not be 128-aligned — padded here);
    temp0 [B, N] f32 accumulated densities with EVERY prefix bump
                    applied and no pins (picked lanes are gone);
    orig [B, N] i32 original cloud index of each live lane (drives the
                    2x heavy-point weight, MDS_cuda.cu:130);
    returns LANE indices [B, steps] into xyz (callers map through orig
    for original ids; orig is consumed here only for the weight bias).

    The stage kernel applies the previous selection's bump before each
    argmin; for the first continued step there is no pending bump, so
    `prev` is seeded with a far-away sentinel point whose exp2 argument
    underflows to exactly 0 (the -c term keeps the argument finite and
    hugely negative — see the overflow note in _stage_kernel).
    """
    from ..common import FAST_MATH

    xyz = jax.lax.stop_gradient(xyz)
    mean_mst_length = jax.lax.stop_gradient(mean_mst_length)
    b, n, _ = xyz.shape
    assert steps <= 2 ** 14, "pin encoding holds step < 2^14"
    n_pad = -(-n // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    if FAST_MATH:
        xyz_t = xyz_t.astype(jnp.bfloat16)
    t = (5.0 * mean_mst_length * mean_mst_length)[:, None]

    lane = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
    kde_rows = jnp.float32(1.4426950408889634) / t
    px2 = jnp.sum(jnp.square(xyz_t.astype(jnp.float32)), axis=0)
    heavy = jnp.pad(orig >= _HEAVY_FROM, ((0, 0), (0, n_pad - n)))
    bias = jnp.where(heavy, 1.0, 0.0) - px2 * kde_rows
    temp = jnp.pad(temp0.astype(jnp.float32), ((0, 0), (0, n_pad - n)),
                   constant_values=jnp.float32(_PADBASE))
    temp = jnp.where(lane >= n, jnp.float32(_PADBASE), temp)
    prev = jnp.concatenate(
        [jnp.full((b, 3), 1e4, jnp.float32), jnp.zeros((b, 1), jnp.float32)],
        axis=1)

    batch_ids = jnp.arange(b)[:, None]
    idx_out = jnp.zeros((b, steps), jnp.int32)
    orig_lane = jnp.broadcast_to(lane, (b, n_pad))

    if steps > 2 * _STAGE_LEN and n > 2 * _STAGE_LEN:
        bounds = [0] + list(range(_STAGE_LEN, steps, _STAGE_LEN)) + [steps]
    else:
        bounds = [0, steps]

    lo = bounds[0]
    cur_lane = orig_lane
    for hi in bounds[1:]:
        temp, last = _run_stage(lo, hi, xyz_t, bias, t, prev, temp,
                                interpret)
        prev = last
        step = ((temp - _BIGBASE) *
                jnp.float32(1.0 / _STEP_SCALE)).astype(jnp.int32)
        newly = (temp >= _BIGBASE) & (temp < _PADBASE) & \
                (step >= lo) & (step < hi)
        idx_out = idx_out.at[
            batch_ids, jnp.where(newly, step, steps)
        ].set(cur_lane, mode="drop")
        if hi >= steps:
            break
        ns = temp.shape[1]
        ns_next = -(-(n - hi) // 128) * 128
        lane_cur = jnp.broadcast_to(
            jnp.arange(ns, dtype=jnp.int32)[None], (b, ns))
        key = jnp.where(temp >= _BIGBASE, jnp.int32(1 << 20), 0) + lane_cur
        _, temp, cur_lane, bias, xs, ys, zs = jax.lax.sort(
            (key, temp, cur_lane, bias, xyz_t[0], xyz_t[1], xyz_t[2]),
            dimension=-1, num_keys=1)
        temp = temp[:, :ns_next]
        cur_lane = cur_lane[:, :ns_next]
        bias = bias[:, :ns_next]
        xyz_t = jnp.stack([xs[:, :ns_next], ys[:, :ns_next],
                           zs[:, :ns_next]])
        lo = hi

    return jax.lax.stop_gradient(idx_out)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def mds_pallas(xyz: jnp.ndarray, npoint: int, mean_mst_length: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """xyz [B, N, 3], mean_mst_length [B] -> idx [B, npoint] int32."""
    from ..common import FAST_MATH

    # index computation is non-differentiable (MDS_module.py:35); stop
    # gradients at the inputs so autodiff never traces into the kernel
    xyz = jax.lax.stop_gradient(xyz)
    mean_mst_length = jax.lax.stop_gradient(mean_mst_length)

    b, n, _ = xyz.shape
    n_pad = -(-n // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)                        # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    if FAST_MATH:
        # serving mode: bf16 coordinates halve the per-step VPU traffic;
        # density accumulation stays f32
        xyz_t = xyz_t.astype(jnp.bfloat16)
    t = (5.0 * mean_mst_length * mean_mst_length)[:, None]  # [B, 1]

    lane = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
    orig = jnp.broadcast_to(lane, (b, n_pad))
    # loop-invariant exp2 bias (see _stage_kernel): log2(weight) -
    # |p|^2 * inv_t * log2(e), computed here in f32 (pre-FAST_MATH cast)
    # so it does not consume kernel headroom; padding lanes are inert
    # (adds round away exactly against temp = _PADBASE = 2^45)
    kde_rows = jnp.float32(1.4426950408889634) / t            # [B, 1]
    px2 = jnp.sum(jnp.square(xyz_t.astype(jnp.float32)), axis=0)  # [B, N]
    bias = jnp.where(orig >= _HEAVY_FROM, 1.0, 0.0) - px2 * kde_rows
    temp = jnp.where(lane >= n, jnp.float32(_PADBASE), 0.0)
    temp = jnp.where(lane == 0, jnp.float32(_BIGBASE), temp)   # step 0
    temp = jnp.broadcast_to(temp, (b, n_pad))
    prev = jnp.concatenate(
        [xyz[:, 0, :].astype(jnp.float32), jnp.zeros((b, 1), jnp.float32)],
        axis=1)                                                # [B, 4]

    batch_ids = jnp.arange(b)[:, None]
    idx_out = jnp.zeros((b, npoint), jnp.int32)

    # stage boundaries: compaction pays once a stage's worth of lanes
    # has died; below 2 stages it is pure overhead
    if npoint > 2 * _STAGE_LEN and n > 2 * _STAGE_LEN:
        bounds = [1] + list(range(_STAGE_LEN, npoint, _STAGE_LEN)) + [npoint]
    else:
        bounds = [1, npoint]

    lo = bounds[0]
    for hi in bounds[1:]:
        temp, last = _run_stage(lo, hi, xyz_t, bias, t, prev, temp,
                                interpret)
        prev = last

        # decode this stage's pins into the output (original indices)
        step = ((temp - _BIGBASE) *
                jnp.float32(1.0 / _STEP_SCALE)).astype(jnp.int32)
        newly = (temp >= _BIGBASE) & (temp < _PADBASE) & \
                (step >= max(lo - 1, 0)) & (step < hi)
        idx_out = idx_out.at[
            batch_ids, jnp.where(newly, step, npoint)
        ].set(orig, mode="drop")

        if hi >= npoint:
            break

        # compact dead lanes (selected or padding) out: variadic sort on
        # a dead-flag + position key — order-stable (argmin tie-breaking
        # preserved), far cheaper than XLA lane scatters. A <=127-lane
        # tail of already-dead lanes may survive into the next stage;
        # they are inert (>= _BIGBASE) and already decoded.
        ns = temp.shape[1]
        ns_next = -(-(n - hi) // 128) * 128
        lane_cur = jnp.broadcast_to(
            jnp.arange(ns, dtype=jnp.int32)[None], (b, ns))
        key = jnp.where(temp >= _BIGBASE, jnp.int32(1 << 20), 0) + lane_cur
        _, temp, orig, bias, xs, ys, zs = jax.lax.sort(
            (key, temp, orig, bias, xyz_t[0], xyz_t[1], xyz_t[2]),
            dimension=-1, num_keys=1)
        temp = temp[:, :ns_next]
        orig = orig[:, :ns_next]
        bias = bias[:, :ns_next]
        xyz_t = jnp.stack([xs[:, :ns_next], ys[:, :ns_next],
                           zs[:, :ns_next]])
        lo = hi

    return jax.lax.stop_gradient(idx_out)
