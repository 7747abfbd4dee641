"""Pallas TPU kernel for Minimum Density Sampling.

The XLA reference (sparenet_tpu.ops.mds) runs the 16384-step greedy loop
as a fori_loop whose per-step state (the [B, N] density vector) round-
trips HBM every step. This kernel keeps the densities, coordinates and
outputs VMEM-resident for the whole loop, and the greedy step is ONE
fused elementwise pass over the [R, N] row block:

  * the selection step of each point is encoded INSIDE the density
    vector: a selected lane is pinned to 2^23 + step (exactly
    representable in f32, and far above any reachable real density while
    far below the 2^24 padding sentinel), so there is no separate
    [R, N] step-map write per step — one decode pass at the end
    recovers the step map;
  * pinning happens lazily at the START of the next step (fused into
    the density update via the carried selection index), and a
    >= 2^23 guard keeps contributions out of pinned/padding lanes
    (the reference achieves the same through f32 rounding against 1e9,
    MDS_cuda.cu:114-133);
  * the selected point's coordinates are fetched with per-row 128-lane
    dynamic slices around the argmin (plus a 128-wide one-hot), instead
    of full-row one-hot reductions.

Semantics identical to MDS_cuda.cu:104-211 (see ops/mds.py): selection 0
is point 0; density += exp(-d^2 / t), t = 5 * mml^2, doubled for point
index >= 8192; selected densities pinned high. Ablation-profiled on v5e
(scripts/profile_mds.py): ~1.9x over the v1 kernel (argmin re-read,
step-map write and full-row coordinate extraction eliminated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reduce import argmin_lanes

_HEAVY_FROM = 8192
_BIGBASE = float(2 ** 23)   # pinned-lane encoding base: 2^23 + step is exact
_PADBASE = float(2 ** 24)   # padding lanes: always above any pinned value


def _mds_kernel(npoint: int, n_valid: int,
                xyz_ref, t_ref, step_ref, temp_scratch):
    """One grid step handles a [R] row block of the batch.

    xyz_ref: [3, R, N] VMEM; t_ref: [R, 1] VMEM (= 5 * mml^2);
    step_ref: [R, N] int32 VMEM out (selection step per point, npoint if
    never selected); temp_scratch: [R, N] f32 (density + encoding).
    """
    r, n = temp_scratch.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    inv_t = 1.0 / t_ref[:].astype(jnp.float32)               # [R, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    pad_mask = lane >= n_valid
    weight = jnp.where(lane >= _HEAVY_FROM, 2.0, 1.0).astype(jnp.float32)

    temp0 = jnp.where(pad_mask, jnp.float32(_PADBASE), 0.0)
    # selection 0 is point 0 (MDS_cuda.cu:104-110): pin as step 0
    temp0 = jnp.where(lane == 0, jnp.float32(_BIGBASE), temp0)
    temp_scratch[:] = temp0

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def coords_at(nxt):
        """Coordinates of per-row point nxt[r] via 128-aligned dynamic
        lane slices (dodges three full-row one-hot reductions)."""
        xs, ys, zs = [], [], []
        for rr in range(r):
            idx = nxt[rr]
            base = (idx // 128) * 128
            oh = (lane128 == (idx - base)[None, None]).astype(x.dtype)
            xs.append(jnp.sum(xyz_ref[0, rr, pl.ds(base, 128)][None, :] * oh))
            ys.append(jnp.sum(xyz_ref[1, rr, pl.ds(base, 128)][None, :] * oh))
            zs.append(jnp.sum(xyz_ref[2, rr, pl.ds(base, 128)][None, :] * oh))
        return (jnp.stack(xs)[:, None].astype(x.dtype),
                jnp.stack(ys)[:, None].astype(x.dtype),
                jnp.stack(zs)[:, None].astype(x.dtype))

    def body(j, carry):
        prev_idx, last_x, last_y, last_z = carry             # [R], [R,1]x3
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        told = temp_scratch[:]
        add = jnp.where(told >= _BIGBASE, 0.0,
                        weight * jnp.exp(-d2 * inv_t))
        # the carried index was selected at step j-1; pin it now
        temp = jnp.where(lane == prev_idx[:, None],
                         jnp.float32(_BIGBASE) + (j - 1).astype(jnp.float32),
                         told + add)
        temp_scratch[:] = temp
        # explicit lowest-index tie-break (Mosaic argmin picks the
        # HIGHEST index on ties — diverges from the XLA reference)
        nxt = argmin_lanes(temp).astype(jnp.int32)           # [R]
        nx, ny, nz = coords_at(nxt)
        return nxt, nx, ny, nz

    init = (jnp.zeros((r,), jnp.int32), x[:, 0:1], y[:, 0:1], z[:, 0:1])
    nxt, _, _, _ = jax.lax.fori_loop(1, npoint, body, init)

    # pin the final selection, then decode steps from the encoding
    temp = temp_scratch[:]
    temp = jnp.where(lane == nxt[:, None],
                     jnp.float32(_BIGBASE + npoint - 1), temp)
    pinned = (temp >= _BIGBASE) & (temp < _PADBASE)
    step_ref[:] = jnp.where(pinned, (temp - _BIGBASE).astype(jnp.int32),
                            npoint)


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

    # row block: whole batch in one program while VMEM allows; budget
    # ~5 live [R, N] f32 tiles (plus Mosaic's double-buffered in/out
    # blocks) well under the 16 MB scoped-vmem limit.
    r = b
    while r > 1 and 5 * r * n_pad * 4 > 6 * 1024 * 1024:
        r //= 2
    while b % r:
        r -= 1
    grid = (b // r,)

    kernel = functools.partial(_mds_kernel, npoint, n)
    step_map = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, r, n_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, n_pad), jnp.float32)],
        interpret=interpret,
    )(xyz_t, t)

    # invert the step map: idx[b, step] = point
    step_map = step_map[:, :n]
    point_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    batch_ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    idx = jnp.zeros((b, npoint), jnp.int32).at[
        batch_ids, step_map
    ].set(point_ids, mode="drop")
    return jax.lax.stop_gradient(idx)
