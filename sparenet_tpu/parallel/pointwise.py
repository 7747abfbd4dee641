"""Point-axis sharding for the pairwise-distance ops (ring chamfer).

The reference has no sequence/context parallelism — its "sequence
length" analog is the point count, scaled algorithmically (SURVEY §5).
This module adds the optional TPU-native extension: shard the POINT
axis of both clouds over a mesh axis and compute nearest neighbors with
a ring schedule (`jax.lax.ppermute`), the point-cloud analog of ring
attention. Each device holds one chunk of each cloud; target chunks
rotate around the ring while a running (distance, index, match) winner
is maintained — the full [N, M] distance matrix is never materialized
and no device ever holds a whole cloud.

Collectives ride ICI: p-1 ppermutes of the local target chunk forward;
one psum_scatter per direction backward (the scatter-add of the chamfer
VJP, cuda/chamfer_distance/chamfer_distance.cu:159-204, becomes a
reduce-scatter over the point axis).

Parity: bit-exact with the dense path (ops/chamfer.py) under
fp32/HIGHEST parity settings — the same pairwise_sqdist formula per
tile (elementwise identical), and winner updates tie-break on the
lowest GLOBAL index, matching dense argmin semantics. Verified exactly
on CPU meshes and the multichip dryrun (tests/test_parallel.py). On TPU
at N>=512 the dense op dispatches to the Pallas NN kernel instead, where
non-HIGHEST distance precision can flip near-tie argmins — index parity
at production scale is contractual only in parity mode.

Use `get_mesh2d(n_batch, n_point)` for a ("batch", "point") mesh and
`sharded_chamfer(mesh, xyz1, xyz2)` / `sharded_nn_search` /
`sharded_chamfer_distance` as drop-in equivalents of the ops/chamfer.py
API for clouds too large for one device (>16k points, SURVEY §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.common import pairwise_sqdist
from .mesh import BATCH_AXIS

POINT_AXIS = "point"

__all__ = [
    "POINT_AXIS",
    "get_mesh2d",
    "sharded_chamfer",
    "sharded_chamfer_distance",
    "sharded_nn_search",
]


def get_mesh2d(n_batch: int, n_point: int, devices=None) -> Mesh:
    """("batch", "point") mesh: data parallel x point parallel."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_batch * n_point:
        raise ValueError(
            f"get_mesh2d({n_batch}, {n_point}) needs {n_batch * n_point} "
            f"devices, only {len(devices)} available")
    devices = np.asarray(devices[: n_batch * n_point])
    return Mesh(devices.reshape(n_batch, n_point), (BATCH_AXIS, POINT_AXIS))


def _ring_nn(x, y, axis: str, p: int):
    """Local ring NN: queries x [B, Nl, 3] (point-sharded) against the
    full y (point-sharded [B, Ml, 3], rotated around the ring).

    Returns (best_d [B, Nl] pairwise-form winner distance, best global
    index [B, Nl], matched coords [B, Nl, 3]).
    """
    me = jax.lax.axis_index(axis)
    ml = y.shape[1]
    b, nl = x.shape[0], x.shape[1]

    # device k sends its current chunk to k-1: after i steps device `me`
    # holds global shard (me + i) % p
    perm = [(k, (k - 1) % p) for k in range(p)]

    def step(carry, i):
        best_d, best_i, best_xyz, y_cur = carry
        src = jnp.remainder(me + i, p)
        d = jax.vmap(pairwise_sqdist)(x, y_cur)              # [B, Nl, Ml]
        j = jnp.argmin(d, axis=-1)                           # [B, Nl]
        dm = jnp.take_along_axis(d, j[..., None], -1)[..., 0]
        gi = (j + src * ml).astype(jnp.int32)
        matched = jnp.take_along_axis(y_cur, j[..., None], axis=1)
        # dense argmin picks the lowest index of the row minimum; across
        # shards that is: strictly smaller distance wins, ties go to the
        # lower global index
        take = (dm < best_d) | ((dm == best_d) & (gi < best_i))
        best_d = jnp.where(take, dm, best_d)
        best_i = jnp.where(take, gi, best_i)
        best_xyz = jnp.where(take[..., None], matched, best_xyz)
        y_next = jax.lax.ppermute(y_cur, axis, perm)
        return (best_d, best_i, best_xyz, y_next), None

    init = (
        jnp.full((b, nl), jnp.inf, jnp.float32),
        jnp.full((b, nl), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((b, nl, 3), x.dtype),
        y,
    )
    (best_d, best_i, best_xyz, _), _ = jax.lax.scan(
        step, init, jnp.arange(p))
    return best_d, best_i, best_xyz


def _exact_dist(x, matched):
    diff = x - matched
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chamfer_local(axis, p, xyz1, xyz2):
    _, idx1, m1 = _ring_nn(xyz1, xyz2, axis, p)
    _, idx2, m2 = _ring_nn(xyz2, xyz1, axis, p)
    return _exact_dist(xyz1, m1), _exact_dist(xyz2, m2), idx1, idx2


def _chamfer_local_fwd(axis, p, xyz1, xyz2):
    _, idx1, m1 = _ring_nn(xyz1, xyz2, axis, p)
    _, idx2, m2 = _ring_nn(xyz2, xyz1, axis, p)
    out = (_exact_dist(xyz1, m1), _exact_dist(xyz2, m2), idx1, idx2)
    return out, (xyz1, xyz2, idx1, idx2, m1, m2)


def _scatter_ring(axis, total_len, idx_global, contrib):
    """Scatter-add `contrib` [B, N, 3] at global point indices into the
    point-sharded target: local full-length scatter + reduce-scatter
    over the ring (one psum_scatter on ICI)."""
    b = contrib.shape[0]
    full = jnp.zeros((b, total_len, contrib.shape[-1]), contrib.dtype)
    full = full.at[jnp.arange(b)[:, None], idx_global].add(contrib)
    return jax.lax.psum_scatter(full, axis, scatter_dimension=1, tiled=True)


def _chamfer_local_bwd(axis, p, res, cts):
    xyz1, xyz2, idx1, idx2, m1, m2 = res
    g1, g2, _, _ = cts
    n_total = xyz1.shape[1] * p
    m_total = xyz2.shape[1] * p
    # direction 1: d(sum g1*dist1): + to xyz1 rows, - scattered to xyz2
    c1 = 2.0 * g1[..., None] * (xyz1 - m1)
    # direction 2: + to xyz2 rows, - scattered to xyz1
    c2 = 2.0 * g2[..., None] * (xyz2 - m2)
    gx1 = c1 + _scatter_ring(axis, n_total, idx2, -c2)
    gx2 = c2 + _scatter_ring(axis, m_total, idx1, -c1)
    return gx1, gx2


_chamfer_local.defvjp(_chamfer_local_fwd, _chamfer_local_bwd)

_SPEC2 = P(BATCH_AXIS, POINT_AXIS)


def sharded_chamfer(mesh: Mesh, xyz1, xyz2):
    """chamfer_raw over a ("batch", "point") mesh: (dist1 [B,N],
    dist2 [B,M], idx1, idx2), batch- and point-sharded, differentiable.

    B must divide mesh axis 'batch'; N and M must divide mesh axis
    'point'. Exactly matches ops.chamfer.chamfer_raw.
    """
    p = mesh.shape[POINT_AXIS]
    f = jax.shard_map(
        functools.partial(_chamfer_local, POINT_AXIS, p),
        mesh=mesh,
        in_specs=(_SPEC2, _SPEC2),
        out_specs=(_SPEC2, _SPEC2, _SPEC2, _SPEC2),
        check_vma=False,
    )
    return f(xyz1, xyz2)


def sharded_nn_search(mesh: Mesh, x, y):
    """Batched NN search over the 2-D mesh: (sqdist [B,N], idx [B,N]).
    Equals ops.chamfer.nn_search exactly."""
    p = mesh.shape[POINT_AXIS]

    def local(xl, yl):
        _, idx, m = _ring_nn(xl, yl, POINT_AXIS, p)
        return _exact_dist(xl, m), idx

    f = jax.shard_map(local, mesh=mesh, in_specs=(_SPEC2, _SPEC2),
                      out_specs=(_SPEC2, _SPEC2), check_vma=False)
    return f(x, y)


def sharded_chamfer_distance(mesh: Mesh, xyz1, xyz2):
    """mean(dist1) + mean(dist2) over the 2-D mesh (the reference
    ``ChamferDistance`` semantics)."""
    dist1, dist2, _, _ = sharded_chamfer(mesh, xyz1, xyz2)
    return jnp.mean(dist1) + jnp.mean(dist2)
