"""Gridding / GriddingReverse / GriddingLoss / CubicFeatureSampling tests.

Numpy references replicate the CUDA formulas (gridding.cu:29-179,
gridding_reverse.cu:30-103, gridding_distance.cu:29-120,
cubic_feature_sampling.cu:29-102); gradcheck mirrors
cuda/gridding/test.py:23-43 and cuda/cubic_feature_sampling/test.py:23-59.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from sparenet_tpu.ops import (
    gridding, gridding_reverse, gridding_loss, cubic_feature_sampling,
)


def np_gridding(cloud, scale):
    """cloud [N,3] in [-1,1] -> grid [s,s,s], replicating gridding.cu."""
    half = scale // 2
    p = cloud * half
    grid = np.zeros((scale, scale, scale), np.float64)
    for pt in p:
        if pt.sum() == 0:
            continue
        lo = np.floor(pt).astype(int)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    corner = lo + [cx, cy, cz]
                    w = np.prod(1 - np.abs(pt - corner))
                    ix = corner + half
                    if ((ix >= 0) & (ix < scale)).all():
                        grid[ix[0], ix[1], ix[2]] += w
    return grid


def test_gridding_matches_reference(rng):
    cloud = (rng.rand(1, 64, 3).astype(np.float32) * 1.8 - 0.9)
    out = jax.jit(lambda c: gridding(c, scale=8))(cloud)
    ref = np_gridding(cloud[0], 8)
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_gridding_mass_conservation(rng):
    # interior points: total scattered weight == n_points
    cloud = (rng.rand(2, 128, 3).astype(np.float32) * 1.5 - 0.75)
    out = gridding(cloud, scale=16)
    np.testing.assert_allclose(np.asarray(out).sum((1, 2, 3)), [128, 128],
                               rtol=1e-5)


def test_gridding_grad(rng):
    cloud = jnp.asarray(rng.rand(1, 32, 3) * 1.2 - 0.6, jnp.float32)
    f = lambda c: jnp.sum(gridding(c, scale=8) ** 2)
    check_grads(f, (cloud,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_gridding_reverse_roundtrip(rng):
    # a smooth random grid: every emitted point must lie inside its cell
    grid = jnp.asarray(rng.rand(1, 8, 8, 8), jnp.float32)
    pts = gridding_reverse(grid, scale=8)
    assert pts.shape == (1, 512, 3)
    p = np.asarray(pts[0]) * 4.0  # back to grid units
    # voxel (x,y,z) -> index x*64+y*8+z ; points must lie in
    # [x-1-4, x-4] per axis (weighted avg of the two corner planes)
    for j in [73, 219, 511]:
        x, y, z = j // 64, (j // 8) % 8, j % 8
        if x == 0 or y == 0 or z == 0:
            continue
        lo = np.array([x - 1, y - 1, z - 1]) - 4
        hi = np.array([x, y, z]) - 4
        assert (p[j] >= lo - 1e-4).all() and (p[j] <= hi + 1e-4).all()


def test_gridding_reverse_grad(rng):
    grid = jnp.asarray(rng.rand(1, 4, 4, 4) + 0.1, jnp.float32)
    f = lambda g: jnp.sum(gridding_reverse(g, scale=4) ** 2)
    check_grads(f, (grid,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_gridding_loss_zero_for_identical(rng):
    cloud = (rng.rand(2, 64, 3).astype(np.float32) * 1.6 - 0.8)
    loss = gridding_loss(cloud, cloud, scales=[16], alphas=[1.0])
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_gridding_loss_positive_and_differentiable(rng):
    pred = jnp.asarray(rng.rand(1, 64, 3) * 1.6 - 0.8, jnp.float32)
    gt = jnp.asarray(rng.rand(1, 64, 3) * 1.6 - 0.8, jnp.float32)
    f = lambda p: gridding_loss(p, gt, scales=[16], alphas=[1.0])
    assert float(f(pred)) > 0
    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all() and np.abs(g).max() > 0


def test_cubic_feature_sampling_matches_reference(rng):
    s, c, n = 8, 4, 16
    cloud = (rng.rand(1, n, 3).astype(np.float32) * 1.6 - 0.8)
    vol = rng.rand(1, s, s, s, c).astype(np.float32)
    out = cubic_feature_sampling(jnp.asarray(cloud), jnp.asarray(vol), 1)
    assert out.shape == (1, n, 8, c)
    p = cloud[0] * (s / 2) + (s / 2)
    for i in range(n):
        lo = np.floor(p[i]).astype(int)
        v = 0
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    corner = lo + [dx, dy, dz]
                    if ((corner >= 0) & (corner < s)).all():
                        expect = vol[0, corner[0], corner[1], corner[2]]
                    else:
                        expect = np.zeros(c)
                    np.testing.assert_allclose(out[0, i, v], expect, atol=1e-6)
                    v += 1


def test_cubic_feature_sampling_grads(rng):
    cloud = jnp.asarray(rng.rand(1, 8, 3) * 1.2 - 0.6, jnp.float32)
    vol = jnp.asarray(rng.rand(1, 4, 4, 4, 2), jnp.float32)
    f = lambda v: jnp.sum(cubic_feature_sampling(cloud, v, 2) ** 2)
    check_grads(f, (vol,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    # point grads must be exactly zero (cubic_feature_sampling.cu:135-174)
    gp = jax.grad(lambda cl: jnp.sum(cubic_feature_sampling(cl, vol, 1)))(cloud)
    np.testing.assert_array_equal(np.asarray(gp), 0.0)
