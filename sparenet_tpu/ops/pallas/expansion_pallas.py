"""Pallas TPU kernel for the expansion-penalty MST (Prim's).

The XLA reference (ops/expansion_penalty._mst_one) runs 511 fori_loop
steps with HBM-resident state; here the whole primitive block lives in
VMEM: one program handles all primitives of one cloud ([P, S] rows),
each step fuses the distance update, the masked per-row argmin and the
one-hot state writes.

Output is a parent-pointer encoding (every non-root vertex stores its
tree parent and edge cost), which is exactly the MST edge list keyed by
vertex — the leaf-pruning pass and penalty assembly stay in XLA
(ops/expansion_penalty) and consume it directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _mst_kernel(s_valid: int, xyz_ref, parent_ref, cost_ref,
                curdis_scr, curidx_scr):
    """xyz_ref [3, R, S]; parent_ref/cost_ref [R, S] outs;
    scratches [R, S]. R = primitives-per-program rows."""
    r, s = curdis_scr.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    pad = lane >= s_valid

    curdis_scr[:] = jnp.where(pad, jnp.float32(2 * _BIG), jnp.float32(_BIG))
    curidx_scr[:] = jnp.zeros((r, s), jnp.int32)
    parent_ref[:] = jnp.zeros((r, s), jnp.int32)
    cost_ref[:] = jnp.zeros((r, s), jnp.float32)

    # visited marker: curdis pinned above 1e9 means visited-or-pad;
    # track visited via a dedicated +inf pin on selection.
    def body(i, carry):
        last_x, last_y, last_z, last_i = carry              # [R,1] x3, [R]
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cur = curdis_scr[:]
        visited = cur >= jnp.float32(1.5 * _BIG)            # visited or pad
        closer = (~visited) & (d < cur)
        cur = jnp.where(closer, d, cur)
        cidx = jnp.where(closer, last_i[:, None], curidx_scr[:])
        nxt = jnp.argmin(cur, axis=1).astype(jnp.int32)     # [R]
        sel = lane == nxt[:, None]
        cost = jnp.min(cur, axis=1)                         # [R]
        parent_ref[:] = jnp.where(sel, cidx, parent_ref[:])
        cost_ref[:] = jnp.where(sel, cost[:, None], cost_ref[:])
        curdis_scr[:] = jnp.where(sel, jnp.float32(2 * _BIG), cur)
        curidx_scr[:] = cidx
        selF = sel.astype(jnp.float32)
        nx = jnp.sum(x * selF, axis=1, keepdims=True)
        ny = jnp.sum(y * selF, axis=1, keepdims=True)
        nz = jnp.sum(z * selF, axis=1, keepdims=True)
        return nx, ny, nz, nxt

    # mark vertex 0 visited
    sel0 = lane == 0
    curdis_scr[:] = jnp.where(sel0, jnp.float32(2 * _BIG), curdis_scr[:])
    init = (x[:, 0:1], y[:, 0:1], z[:, 0:1], jnp.zeros((r,), jnp.int32))
    jax.lax.fori_loop(0, s_valid - 1, body, init)


@functools.partial(jax.jit, static_argnames=("primitive_size", "interpret"))
def mst_parents_pallas(xyz: jnp.ndarray, primitive_size: int,
                       interpret: bool = False):
    """xyz [BP, S, 3] (one row per primitive) ->
    (parent [BP, S] int32, cost [BP, S] f32): Prim's tree rooted at local
    vertex 0; parent/cost are 0 for the root."""
    bp, s, _ = xyz.shape
    s_pad = -(-s // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, s_pad - s)))

    # budget accounts for Mosaic's double-buffered in/out blocks on top
    # of the scratches: keep the live block set well under the 16 MB
    # scoped-vmem limit.
    r = bp
    while r > 8 and 6 * r * s_pad * 4 > 4 * 1024 * 1024:
        r //= 2
    while bp % r:
        r -= 1
    grid = (bp // r,)

    kernel = functools.partial(_mst_kernel, s)
    parent, cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, r, s_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((bp, s_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, s_pad), jnp.float32),
            pltpu.VMEM((r, s_pad), jnp.int32),
        ],
        interpret=interpret,
    )(xyz_t)
    return parent[:, :s], cost[:, :s]
