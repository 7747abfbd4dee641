"""FPD pipeline tests: classifier shapes, Frechet distance properties."""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.frechet import (
    PointNetCls, calculate_fpd, calculate_frechet_distance, get_activations,
)


def test_pointnet_cls_activation_dims(rng):
    model = PointNetCls(k=16, train=False)
    pc = jnp.asarray(rng.rand(4, 128, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pc)
    logits, trans, actv = model.apply(variables, pc)
    assert logits.shape == (4, 16)
    assert trans.shape == (4, 3, 3)
    # 1024 + 512 + 256 + 16 = 1808 (Frechet/FPD.py dims)
    assert actv.shape == (4, 1808)


def test_frechet_distance_properties(rng):
    d = 16
    mu1 = rng.rand(d)
    s1 = np.eye(d) * 0.5
    assert abs(calculate_frechet_distance(mu1, s1, mu1, s1)) < 1e-6
    mu2 = mu1 + 1.0
    val = calculate_frechet_distance(mu1, s1, mu2, s1)
    np.testing.assert_allclose(val, d * 1.0, rtol=1e-5)


def test_fpd_end_to_end_identical_sets(rng):
    model = PointNetCls(k=16, train=False)
    pc = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pc)
    clouds = rng.rand(8, 64, 3).astype(np.float32)
    fpd = calculate_fpd(clouds, clouds.copy(), variables=variables,
                        batch_size=4)
    assert abs(fpd) < 1e-3


def test_fpd_separates_distributions(rng):
    model = PointNetCls(k=16, train=False)
    pc = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pc)
    a = rng.rand(8, 64, 3).astype(np.float32)
    b = rng.rand(8, 64, 3).astype(np.float32) * 0.1 + 2.0
    near = calculate_fpd(a, a + rng.randn(8, 64, 3).astype(np.float32) * 0.01,
                         variables=variables, batch_size=4)
    far = calculate_fpd(a, b, variables=variables, batch_size=4)
    assert far > near
