"""Micro-profiler for the MDS Pallas kernel: which per-step op dominates?

Times the production kernel and ablated variants (no-exp, no-argmin,
no-step-map, no-coord-extract) at B=32, n=19456, npoint=16384.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_HEAVY_FROM = 8192


def _kernel(npoint, n_valid, mode, xyz_ref, t_ref, step_ref, temp_scratch):
    r, n = temp_scratch.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    t = t_ref[:].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    pad_mask = lane >= n_valid
    weight = jnp.where(lane >= _HEAVY_FROM, 2.0, 1.0).astype(jnp.float32)

    temp0 = jnp.where(pad_mask, jnp.float32(2 * _BIG), 0.0)
    temp0 = jnp.where(lane == 0, jnp.float32(_BIG), temp0)
    temp_scratch[:] = temp0
    step_ref[:] = jnp.where(lane == 0, 0, npoint)

    def body(j, carry):
        last_x, last_y, last_z = carry
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        if mode == "noexp":
            contrib = d2 * 1e-9
        else:
            contrib = jnp.exp(-d2 / t)
        temp = temp_scratch[:] + weight * contrib
        if mode == "noargmin":
            nxt = jnp.full((r,), j % n_valid, jnp.int32)
        else:
            nxt = jnp.argmin(temp, axis=1).astype(jnp.int32)
        sel = lane == nxt[:, None]
        temp_scratch[:] = jnp.where(sel, jnp.float32(_BIG), temp)
        if mode != "nostepmap":
            step_ref[:] = jnp.where(sel, j, step_ref[:])
        if mode == "nocoord":
            nx = last_x * 0.999
            ny = last_y * 0.999
            nz = last_z * 0.999
        else:
            selF = sel.astype(x.dtype)
            nx = jnp.sum(x * selF, axis=1, keepdims=True)
            ny = jnp.sum(y * selF, axis=1, keepdims=True)
            nz = jnp.sum(z * selF, axis=1, keepdims=True)
        return nx, ny, nz

    init = (x[:, 0:1], y[:, 0:1], z[:, 0:1])
    jax.lax.fori_loop(1, npoint, body, init)


@functools.partial(jax.jit, static_argnames=("npoint", "mode"))
def mds_variant(xyz, npoint, mean_mst_length, mode="full"):
    b, n, _ = xyz.shape
    n_pad = -(-n // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    t = (5.0 * mean_mst_length * mean_mst_length)[:, None]

    r = b
    while r > 1 and 5 * r * n_pad * 4 > 6 * 1024 * 1024:
        r //= 2
    while b % r:
        r -= 1
    grid = (b // r,)

    kernel = functools.partial(_kernel, npoint, n, mode)
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
    )(xyz_t, t)
    return jnp.sum(step_map)


_BIGBASE = float(2 ** 23)      # pinned-lane encoding base (step fits exactly)
_PADBASE = float(2 ** 24)      # padding lanes (always above pinned)


def _kernel_v2(npoint: int, n_valid: int, dyncoord: bool,
               xyz_ref, t_ref, step_ref, temp_scratch):
    """Fused variant: selection step encoded INSIDE temp (no per-step
    step-map writes; one decode pass at the end); optional dynamic-slice
    coordinate extraction instead of full-row one-hot sums."""
    r, n = temp_scratch.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    inv_t = 1.0 / t_ref[:].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    pad_mask = lane >= n_valid
    weight = jnp.where(lane >= _HEAVY_FROM, 2.0, 1.0).astype(jnp.float32)

    temp0 = jnp.where(pad_mask, jnp.float32(_PADBASE), 0.0)
    temp0 = jnp.where(lane == 0, jnp.float32(_BIGBASE), temp0)
    temp_scratch[:] = temp0

    def extract_coords(nxt):
        if not dyncoord:
            sel = lane == nxt[:, None]
            selF = sel.astype(x.dtype)
            return (jnp.sum(x * selF, axis=1, keepdims=True),
                    jnp.sum(y * selF, axis=1, keepdims=True),
                    jnp.sum(z * selF, axis=1, keepdims=True))
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        xs, ys, zs = [], [], []
        for rr in range(r):
            idx = nxt[rr]
            base = (idx // 128) * 128
            oh = (lane128 == (idx - base)[None, None]).astype(jnp.float32)
            xs.append(jnp.sum(xyz_ref[0, rr, pl.ds(base, 128)][None, :] * oh))
            ys.append(jnp.sum(xyz_ref[1, rr, pl.ds(base, 128)][None, :] * oh))
            zs.append(jnp.sum(xyz_ref[2, rr, pl.ds(base, 128)][None, :] * oh))
        return (jnp.stack(xs)[:, None], jnp.stack(ys)[:, None],
                jnp.stack(zs)[:, None])

    def body(j, carry):
        prev_idx, last_x, last_y, last_z = carry
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        told = temp_scratch[:]
        add = jnp.where(told >= _BIGBASE, 0.0,
                        weight * jnp.exp(-d2 * inv_t))
        # the carry index was selected at step j-1; encode that step
        temp = jnp.where(lane == prev_idx[:, None],
                         jnp.float32(_BIGBASE) + (j - 1).astype(jnp.float32),
                         told + add)
        temp_scratch[:] = temp
        nxt = jnp.argmin(temp, axis=1).astype(jnp.int32)
        nx, ny, nz = extract_coords(nxt)
        return nxt, nx, ny, nz

    init = (jnp.zeros((r,), jnp.int32), x[:, 0:1], y[:, 0:1], z[:, 0:1])
    nxt, _, _, _ = jax.lax.fori_loop(1, npoint, body, init)
    # final pin of the last selection + decode steps from the encoding
    temp = temp_scratch[:]
    temp = jnp.where(lane == nxt[:, None],
                     jnp.float32(_BIGBASE + npoint - 1), temp)
    pinned = (temp >= _BIGBASE) & (temp < _PADBASE)
    step_ref[:] = jnp.where(
        pinned, (temp - _BIGBASE).astype(jnp.int32), npoint)


@functools.partial(jax.jit, static_argnames=("npoint", "dyncoord"))
def mds_v2(xyz, npoint, mean_mst_length, dyncoord=False):
    b, n, _ = xyz.shape
    n_pad = -(-n // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    t = (5.0 * mean_mst_length * mean_mst_length)[:, None]

    r = b
    while r > 1 and 5 * r * n_pad * 4 > 6 * 1024 * 1024:
        r //= 2
    while b % r:
        r -= 1
    grid = (b // r,)

    kernel = functools.partial(_kernel_v2, npoint, n, dyncoord)
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
    )(xyz_t, t)
    return jnp.sum(step_map)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=19384)
    ap.add_argument("--npoint", type=int, default=16384)
    args = ap.parse_args()

    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.rand(args.batch, args.n, 3), jnp.float32)
    mml = jnp.full((args.batch,), 0.05, jnp.float32)

    for dyn in (False, True):
        f = lambda: float(mds_v2(xyz, args.npoint, mml, dyn))
        print(f"v2 dyncoord={dyn} checksum: {f():.0f}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"v2 dyncoord={dyn:d} {dt*1000:8.1f} ms  "
              f"({dt/args.npoint*1e6:.2f} us/step)", flush=True)

    for mode in ["full", "noexp", "noargmin", "nostepmap", "nocoord"]:
        f = lambda: float(mds_variant(xyz, args.npoint, mml, mode))
        print(f"{mode} checksum: {f():.0f}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{mode:12s} {dt*1000:8.1f} ms  "
              f"({dt/args.npoint*1e6:.2f} us/step)", flush=True)


if __name__ == "__main__":
    main()
