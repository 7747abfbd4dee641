"""Prototype + A/B: staged-compaction MDS vs the production v2 kernel.

Greedy MDS kills exactly one lane per step (the selected point is pinned
and never contributes again). Splitting the 16384-step loop into stages
and compacting dead lanes out between stages shrinks the per-step
[R, Ns] elementwise pass: total work drops from npoint*N to
sum(len_s * Ns_s) ~ npoint*N - npoint^2/2 (~1.6x here). Compaction is a
cumsum + scatter (order-stable, so argmin lowest-index tie-breaking is
preserved); per-lane density accumulation order is unchanged, so the
result is bit-identical to the unstaged kernel.
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

from sparenet_tpu.ops.pallas.reduce import argmin_lanes

_HEAVY_FROM = 8192
_BIGBASE = float(2 ** 23)
_PADBASE = float(2 ** 24)


def _stage_kernel(lo: int, hi: int,
                  xyz_ref, orig_ref, t_ref, prev_ref, tin_ref,
                  tout_ref, last_ref):
    """Run greedy steps [lo, hi) on a compacted lane layout.

    xyz_ref [3, R, Ns]; orig_ref [R, Ns] int32 (original point index,
    for the >=8192 double-weighting); t_ref [R, 1]; prev_ref [R, 4] f32
    (coords of selection lo-1, already pinned); tin_ref/tout_ref
    [R, Ns] f32 aliased density state; last_ref [R, 4] f32 out (coords
    of selection hi-1, pinned at exit).
    """
    r, n = tin_ref.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    inv_t = 1.0 / t_ref[:].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    weight = jnp.where(orig_ref[:] >= _HEAVY_FROM, 2.0, 1.0
                       ).astype(jnp.float32)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def coords_at(nxt):
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
        prev_idx, last_x, last_y, last_z = carry
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d2 = (dx * dx + dy * dy + dz * dz).astype(jnp.float32)
        told = tin_ref[:]
        add = jnp.where(told >= _BIGBASE, 0.0,
                        weight * jnp.exp(-d2 * inv_t))
        temp = jnp.where(lane == prev_idx[:, None],
                         jnp.float32(_BIGBASE) + (j - 1).astype(jnp.float32),
                         told + add)
        tin_ref[:] = temp
        nxt = argmin_lanes(temp).astype(jnp.int32)
        nx, ny, nz = coords_at(nxt)
        return nxt, nx, ny, nz

    # prev selection (step lo-1) is already pinned: start with sentinel -1
    init = (jnp.full((r,), -1, jnp.int32),
            prev_ref[:, 0:1], prev_ref[:, 1:2], prev_ref[:, 2:3])
    nxt, lx, ly, lz = jax.lax.fori_loop(lo, hi, body, init)

    # pin the final selection (step hi-1) and emit its coords
    tout_ref[:] = jnp.where(lane == nxt[:, None],
                            jnp.float32(_BIGBASE + hi - 1), tin_ref[:])
    last_ref[:] = jnp.concatenate(
        [lx, ly, lz, jnp.zeros_like(lx)], axis=1)


def _run_stage(lo, hi, xyz_t, orig, t, prev, temp):
    b, _, ns = orig.shape[0], 0, orig.shape[1]
    r = b
    while r > 1 and 6 * r * ns * 4 > 6 * 1024 * 1024:
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
    )(xyz_t, orig, t, prev, temp)
    return temp_out, last


@functools.partial(jax.jit, static_argnames=("npoint", "stage_len"))
def mds_staged(xyz, npoint, mean_mst_length, stage_len=2048):
    b, n, _ = xyz.shape
    n_pad = -(-n // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)                          # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    t = (5.0 * mean_mst_length * mean_mst_length)[:, None]

    lane = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
    orig = jnp.broadcast_to(lane, (b, n_pad))
    temp = jnp.where(lane >= n, jnp.float32(_PADBASE), 0.0)
    temp = jnp.where(lane == 0, jnp.float32(_BIGBASE), temp)   # step 0
    temp = jnp.broadcast_to(temp, (b, n_pad))
    prev = jnp.concatenate(
        [xyz[:, 0, :], jnp.zeros((b, 1), xyz.dtype)], axis=1)  # [B, 4]

    batch_ids = jnp.arange(b)[:, None]
    idx_out = jnp.zeros((b, npoint), jnp.int32)

    bounds = [1] + list(range(stage_len, npoint, stage_len)) + [npoint]
    lo = bounds[0]
    for hi in bounds[1:]:
        temp, last = _run_stage(lo, hi, xyz_t, orig, t, prev, temp)
        prev = last

        # decode this stage's pins into the output (original indices)
        step = (temp - _BIGBASE).astype(jnp.int32)
        newly = (temp >= _BIGBASE) & (temp < _PADBASE) & \
                (step >= max(lo - 1, 0)) & (step < hi)
        idx_out = idx_out.at[
            batch_ids, jnp.where(newly, step, npoint)
        ].set(orig, mode="drop")

        if hi >= npoint:
            break

        # compact dead lanes (selected or padding) out: variadic sort on
        # a dead-flag + position key — order-stable, and far cheaper than
        # XLA lane scatters. A <=127-lane tail of already-dead lanes may
        # survive into the next stage; they are inert (>= _BIGBASE) and
        # their steps were already decoded.
        ns = temp.shape[1]
        ns_next = -(-(n - hi) // 128) * 128
        lane_cur = jnp.broadcast_to(
            jnp.arange(ns, dtype=jnp.int32)[None], (b, ns))
        key = jnp.where(temp >= _BIGBASE, jnp.int32(1 << 20), 0) + lane_cur
        _, temp, orig, xs, ys, zs = jax.lax.sort(
            (key, temp, orig, xyz_t[0], xyz_t[1], xyz_t[2]),
            dimension=-1, num_keys=1)
        temp = temp[:, :ns_next]
        orig = orig[:, :ns_next]
        xyz_t = jnp.stack([xs[:, :ns_next], ys[:, :ns_next],
                           zs[:, :ns_next]])
        lo = hi

    return jax.lax.stop_gradient(idx_out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=19384)
    ap.add_argument("--npoint", type=int, default=16384)
    ap.add_argument("--stage-len", type=int, default=2048)
    args = ap.parse_args()

    from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas

    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.rand(args.batch, args.n, 3), jnp.float32)
    mml = jnp.full((args.batch,), 0.05, jnp.float32)

    ref = np.asarray(mds_pallas(xyz, args.npoint, mml))
    got = np.asarray(mds_staged(xyz, args.npoint, mml, args.stage_len))
    match = np.mean(ref == got)
    print(f"index match vs v2: {match*100:.4f}%  "
          f"({np.sum(ref != got)} mismatches)", flush=True)

    for name, fn in [
        ("v2 (unstaged)",
         lambda: jax.block_until_ready(mds_pallas(xyz, args.npoint, mml))),
        (f"staged L={args.stage_len}",
         lambda: jax.block_until_ready(
             mds_staged(xyz, args.npoint, mml, args.stage_len))),
    ]:
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} {min(ts)*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
