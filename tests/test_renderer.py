"""Differentiable renderer tests (utils/p2i_utils.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.renderer import ComputeDepthMaps, look_at, orthorgonal, transform_points


def test_look_at_maps_eye_to_origin():
    eye = np.array([1.0, 1.0, 1.0], np.float32)
    m = look_at(eye, np.zeros(3, np.float32), np.array([0, 0, 1], np.float32))
    out = m @ np.array([1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(out[:3], 0.0, atol=1e-6)
    # a point between eye and center maps to -z (in front of the camera)
    mid = m @ np.array([0.5, 0.5, 0.5, 1.0])
    assert mid[2] < 0


def test_orthographic_z_range():
    # reference convention (utils/p2i_utils.py:124-150): z in [+near, +far]
    # maps to [1, -1]
    m = orthorgonal(1.5, 1.5, 0.1, 10.0)
    near = m @ np.array([0, 0, 0.1, 1.0])
    far = m @ np.array([0, 0, 10.0, 1.0])
    np.testing.assert_allclose(near[2] / near[3], 1.0, atol=1e-5)
    np.testing.assert_allclose(far[2] / far[3], -1.0, atol=1e-5)


def test_depth_maps_shapes_and_range(rng):
    renderer = ComputeDepthMaps(image_size=32)
    data = jnp.asarray(rng.rand(2, 256, 3) - 0.5, jnp.float32)
    maps = renderer(data, view_id=0, radius_list=[2.0, 3.0])
    assert maps.shape == (2, 32, 32, 2)
    m = np.asarray(maps)
    assert m.min() >= 0.0
    assert m.max() <= 1.0 + 1e-5
    assert m.max() > 0.0  # something was splatted


def test_render_all_views_matches_per_view(rng):
    renderer = ComputeDepthMaps(image_size=16)
    data = jnp.asarray(rng.rand(2, 64, 3) - 0.5, jnp.float32)
    fused = np.asarray(renderer.render_all_views(data, [2.0]))
    for v in range(8):
        single = np.asarray(renderer(data, view_id=v, radius_list=[2.0]))
        np.testing.assert_allclose(fused[..., v], single[..., 0], atol=1e-5)


def test_renderer_differentiable(rng):
    renderer = ComputeDepthMaps(image_size=16)
    data = jnp.asarray(rng.rand(1, 64, 3) - 0.5, jnp.float32)

    def loss(pts):
        return jnp.sum(renderer.render_all_views(pts, [2.0]) ** 2)

    g = jax.grad(loss)(data)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
