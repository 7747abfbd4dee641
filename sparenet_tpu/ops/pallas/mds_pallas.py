"""Pallas TPU kernel for Minimum Density Sampling.

The XLA reference (sparenet_tpu.ops.mds) runs the 16384-step greedy loop
as a fori_loop whose per-step state (the [B, N] density vector) round-
trips HBM every step. This kernel keeps the densities, coordinates and
outputs VMEM-resident for the whole loop: per step one fused VPU pass
updates densities and tracks the row argmin, a short cross-lane reduce
picks the next point, and a one-hot pass extracts its coordinates.

Because dynamic lane-indexed stores need 128-alignment, the kernel emits
a per-point *selection-step* map (aligned [R, N] writes only); the
[B, npoint] index list is reconstructed by one XLA scatter afterwards.

Semantics identical to MDS_cuda.cu:104-211 (see ops/mds.py): selection 0
is point 0; density += exp(-d^2 / (5 * mml^2)), doubled for point index
>= 8192; selected densities pinned to 1e9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_HEAVY_FROM = 8192


def _mds_kernel(npoint: int, n_valid: int,
                xyz_ref, t_ref, step_ref, temp_scratch):
    """One grid step handles a [R] row block of the batch.

    xyz_ref: [3, R, N] VMEM; t_ref: [R, 1] VMEM (= 5 * mml^2);
    step_ref: [R, N] int32 VMEM out (selection step per point, npoint if
    never selected); temp_scratch: [R, N] f32.
    """
    r, n = temp_scratch.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    t = t_ref[:].astype(jnp.float32)                        # [R, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    # padding lanes never win the argmin; heavy lanes get 2x weight
    pad_mask = lane >= n_valid
    weight = jnp.where(lane >= _HEAVY_FROM, 2.0, 1.0).astype(jnp.float32)

    temp0 = jnp.where(pad_mask, jnp.float32(2 * _BIG), 0.0)
    temp0 = jnp.where(lane == 0, jnp.float32(_BIG), temp0)
    temp_scratch[:] = temp0
    step_ref[:] = jnp.where(lane == 0, 0, npoint)

    def body(j, carry):
        last_x, last_y, last_z = carry                      # [R, 1] each
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        temp = temp_scratch[:] + weight * jnp.exp(-d2 / t)
        nxt = jnp.argmin(temp, axis=1).astype(jnp.int32)    # [R]
        sel = lane == nxt[:, None]
        temp_scratch[:] = jnp.where(sel, jnp.float32(_BIG), temp)
        step_ref[:] = jnp.where(sel, j, step_ref[:])
        selF = sel.astype(x.dtype)
        nx = jnp.sum(x * selF, axis=1, keepdims=True)
        ny = jnp.sum(y * selF, axis=1, keepdims=True)
        nz = jnp.sum(z * selF, axis=1, keepdims=True)
        return nx, ny, nz

    init = (x[:, 0:1], y[:, 0:1], z[:, 0:1])
    jax.lax.fori_loop(1, npoint, body, init)


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
