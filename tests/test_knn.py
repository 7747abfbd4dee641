"""kNN + graph features vs brute force (models/sparenet_generator.py:852-906)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops import knn_idx, get_graph_feature


def test_knn_matches_bruteforce(rng):
    x = rng.rand(2, 200, 8).astype(np.float32)
    k = 8
    idx = jax.jit(lambda a: knn_idx(a, k))(x)
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d, axis=-1, kind="stable")[:, :, :k]
    # compare distances (indices may differ on exact ties)
    dn = np.take_along_axis(d, np.asarray(idx), -1)
    dr = np.take_along_axis(d, ref, -1)
    np.testing.assert_allclose(np.sort(dn, -1), np.sort(dr, -1), atol=1e-5)
    # self must be among neighbors (distance zero)
    assert (dn.min(-1) < 1e-10).all()


def test_graph_feature_shape_and_content(rng):
    x = rng.rand(1, 50, 4).astype(np.float32)
    k = 5
    feat = get_graph_feature(jnp.asarray(x), k=k)
    assert feat.shape == (1, 50, k, 8)
    idx = np.asarray(knn_idx(jnp.asarray(x), k))
    for i in [0, 17, 49]:
        for kk in range(k):
            j = idx[0, i, kk]
            np.testing.assert_allclose(
                feat[0, i, kk, :4], x[0, j] - x[0, i], atol=1e-6
            )
            np.testing.assert_allclose(feat[0, i, kk, 4:], x[0, i], atol=1e-6)
