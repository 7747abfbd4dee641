"""Pallas TPU kernel for the expansion-penalty MST + leaf-prune charging.

Stage 1 — Prim's MST (parent pointers), state VMEM-resident, one fused
VPU pass per step (see ops/expansion_penalty.py for semantics).

Stage 2 — edge charging WITHOUT simulating peel rounds: round-parallel
leaf pruning of a tree has a closed form. For the directed edge a->b,

    H(a->b) = 1 + max over a's other incident edges e' of H(e'->a)
              (empty max = 0)

is the round at which the a-side exhausts and pushes the edge out; the
edge is removed at round min(H(v->p), H(p->v)) and charged to the side
that exhausts FIRST (tie = both endpoints become leaves together, i.e.
the final remaining pair -> charged to the higher vertex index, matching
expansion_penalty_cuda.cu:123-146). Both directions come from two
sequential tree-DP passes over Prim's insertion order (parents always
precede children): an up pass in reverse order maintaining per-vertex
top-2 child H values, and a down pass in forward order. Each pass is
S-1 cheap one-hot steps — O(S) total instead of O(rounds) scatter
rounds, and fully VMEM-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reduce import argmin_lanes

_BIG = 1e9


def _expansion_kernel(s_valid: int, xyz_ref, parent_ref, cost_ref,
                      charged_ref, curdis_scr, curidx_scr, order_scr,
                      up_scr, top1_scr, top2_scr, down_scr):
    """xyz_ref [3, R, S]; parent/cost/charged [R, S] outs; scratches [R, S].

    charged_ref[v] = endpoint (vertex index) the edge (v, parent[v]) is
    charged to, for v >= 1; charged_ref[0] = 0 (unused).
    """
    r, s = curdis_scr.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    pad = lane >= s_valid

    # ---------------- stage 1: Prim's MST ----------------
    curdis_scr[:] = jnp.where(pad, jnp.float32(2 * _BIG), jnp.float32(_BIG))
    curdis_scr[:] = jnp.where(lane == 0, jnp.float32(2 * _BIG), curdis_scr[:])
    curidx_scr[:] = jnp.zeros((r, s), jnp.int32)
    parent_ref[:] = jnp.zeros((r, s), jnp.int32)
    cost_ref[:] = jnp.zeros((r, s), jnp.float32)
    order_scr[:] = jnp.zeros((r, s), jnp.int32)  # root order 0

    def mst_body(i, carry):
        last_x, last_y, last_z, last_i = carry
        dx = x - last_x
        dy = y - last_y
        dz = z - last_z
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cur = curdis_scr[:]
        visited = cur >= jnp.float32(1.5 * _BIG)
        closer = (~visited) & (d < cur)
        cur = jnp.where(closer, d, cur)
        cidx = jnp.where(closer, last_i[:, None], curidx_scr[:])
        # lowest-index tie-break, matching the XLA reference path
        # (Mosaic argmin picks the highest index on ties)
        nxt = argmin_lanes(cur).astype(jnp.int32)
        sel = lane == nxt[:, None]
        cost = jnp.min(cur, axis=1)
        parent_ref[:] = jnp.where(sel, cidx, parent_ref[:])
        cost_ref[:] = jnp.where(sel, cost[:, None], cost_ref[:])
        order_scr[:] = jnp.where(sel, i + 1, order_scr[:])
        curdis_scr[:] = jnp.where(sel, jnp.float32(2 * _BIG), cur)
        curidx_scr[:] = cidx
        selF = sel.astype(jnp.float32)
        nx = jnp.sum(x * selF, axis=1, keepdims=True)
        ny = jnp.sum(y * selF, axis=1, keepdims=True)
        nz = jnp.sum(z * selF, axis=1, keepdims=True)
        return nx, ny, nz, nxt

    init = (x[:, 0:1], y[:, 0:1], z[:, 0:1], jnp.zeros((r,), jnp.int32))
    jax.lax.fori_loop(0, s_valid - 1, mst_body, init)

    # ---------------- stage 2: tree-DP edge charging ----------------
    parent = parent_ref[:]
    order = order_scr[:]

    # up pass (reverse insertion order): up[v] = 1 + max child up;
    # maintain per-vertex top-2 of children's up values.
    up_scr[:] = jnp.zeros((r, s), jnp.int32)
    top1_scr[:] = jnp.zeros((r, s), jnp.int32)
    top2_scr[:] = jnp.zeros((r, s), jnp.int32)

    def up_body(k, _):
        i = s_valid - 1 - k                                 # step index
        sel = order == i                                    # vertex added at i
        selI = sel.astype(jnp.int32)
        up_v = 1 + jnp.sum(top1_scr[:] * selI, axis=1, keepdims=True)
        up_scr[:] = jnp.where(sel, up_v, up_scr[:])
        p = jnp.sum(parent * selI, axis=1, keepdims=True)   # [R,1]
        at_p = lane == p
        t1 = top1_scr[:]
        t2 = top2_scr[:]
        new_t1 = jnp.where(at_p & (up_v > t1), up_v, t1)
        new_t2 = jnp.where(
            at_p,
            jnp.where(up_v > t1, t1, jnp.maximum(t2, jnp.minimum(up_v, t1))),
            t2,
        )
        top1_scr[:] = new_t1
        top2_scr[:] = new_t2
        return _

    jax.lax.fori_loop(0, s_valid - 1, up_body, 0)

    # down pass (forward insertion order):
    # down[v] = 1 + max(down[p] if p != root else 0,
    #                   top1[p] excluding up[v] -> top2 when v attains it)
    down_scr[:] = jnp.zeros((r, s), jnp.int32)

    def down_body(i, _):
        sel = order == i
        selI = sel.astype(jnp.int32)
        up_v = jnp.sum(up_scr[:] * selI, axis=1, keepdims=True)
        p = jnp.sum(parent * selI, axis=1, keepdims=True)
        at_p = (lane == p).astype(jnp.int32)
        t1_p = jnp.sum(top1_scr[:] * at_p, axis=1, keepdims=True)
        t2_p = jnp.sum(top2_scr[:] * at_p, axis=1, keepdims=True)
        sib = jnp.where(up_v >= t1_p, t2_p, t1_p)
        down_p = jnp.sum(down_scr[:] * at_p, axis=1, keepdims=True)
        # root (p == 0) has no parent edge: down contribution 0
        down_p = jnp.where(p == 0, 0, down_p)
        down_v = 1 + jnp.maximum(down_p, sib)
        down_scr[:] = jnp.where(sel, down_v, down_scr[:])
        return _

    jax.lax.fori_loop(1, s_valid, down_body, 0)

    up = up_scr[:]
    down = down_scr[:]
    charged_ref[:] = jnp.where(
        up < down, lane,
        jnp.where(down < up, parent, jnp.maximum(lane, parent)),
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("primitive_size", "interpret"))
def expansion_pallas(xyz: jnp.ndarray, primitive_size: int,
                     interpret: bool = False):
    """xyz [BP, S, 3] (one row per primitive) ->
    (parent [BP, S] int32, cost [BP, S] f32, charged [BP, S] int32).

    Prim's tree rooted at local vertex 0 plus the leaf-prune charge
    assignment of every edge (v, parent[v]), v >= 1."""
    bp, s, _ = xyz.shape
    s_pad = -(-s // 128) * 128
    xyz_t = jnp.moveaxis(xyz, -1, 0)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, s_pad - s)))

    # ~12 live [R, S] tiles incl. Mosaic's double-buffered blocks.
    # The per-step MST chain is latency-bound at small row counts, so
    # prefer the whole batch in ONE grid program (the raised
    # vmem_limit_bytes below lifts Mosaic's ~16 MB default scoped
    # budget that used to force r=128 / grid=8 at production shape).
    import os
    budget = int(os.environ.get("EXPANSION_VMEM_MB", "40")) * 1024 * 1024
    r = bp
    while r > 8 and 13 * r * s_pad * 4 > budget:
        r //= 2
    while bp % r:
        r -= 1
    grid = (bp // r,)

    kernel = functools.partial(_expansion_kernel, s)
    parent, cost, charged = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, r, s_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((r, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((bp, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((bp, s_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, s_pad), jnp.float32),   # curdis
            pltpu.VMEM((r, s_pad), jnp.int32),     # curidx
            pltpu.VMEM((r, s_pad), jnp.int32),     # order
            pltpu.VMEM((r, s_pad), jnp.int32),     # up
            pltpu.VMEM((r, s_pad), jnp.int32),     # top1
            pltpu.VMEM((r, s_pad), jnp.int32),     # top2
            pltpu.VMEM((r, s_pad), jnp.int32),     # down
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xyz_t)
    return parent[:, :s], cost[:, :s], charged[:, :s]


def mst_parents_pallas(xyz: jnp.ndarray, primitive_size: int,
                       interpret: bool = False):
    """Back-compat wrapper returning (parent, cost) only."""
    parent, cost, _ = expansion_pallas(xyz, primitive_size,
                                       interpret=interpret)
    return parent, cost
