"""Pallas kernels vs XLA references (interpret mode on CPU).

On real TPU hardware the same comparisons run with compiled kernels
(tests are exact in interpret mode; on-device exp() ulp differences can
flip near-tie argmin picks, which is within the reference's own
tolerance envelope).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.mds import minimum_density_sample
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
from sparenet_tpu.ops.expansion_penalty import _mst_parents_xla
from sparenet_tpu.ops.pallas.expansion_pallas import mst_parents_pallas


def test_mds_pallas_matches_xla(rng):
    x = jnp.asarray(rng.rand(3, 700, 3) - 0.5, jnp.float32)
    mml = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(x, 96, mml, impl="xla"))
    i_pal = np.asarray(mds_pallas(x, 96, mml, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_mds_pallas_heavy_weighting(rng):
    # cross the 8192 double-weight boundary (MDS_cuda.cu:130)
    x = jnp.asarray(rng.rand(1, 8400, 3) - 0.5, jnp.float32)
    mml = jnp.asarray([0.1], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(x, 32, mml, impl="xla"))
    i_pal = np.asarray(mds_pallas(x, 32, mml, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_mst_pallas_matches_xla(rng):
    x = jnp.asarray(rng.rand(8, 64, 3), jnp.float32)
    p_ref, c_ref = _mst_parents_xla(x)
    p_pal, c_pal = mst_parents_pallas(x, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_ref))
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-6)


def test_charge_tree_dp_matches_round_simulation(rng):
    """The closed-form tree-DP charge assignment must equal the
    reference's round-parallel leaf-pruning semantics exactly."""
    from sparenet_tpu.ops.expansion_penalty import _prune_edges
    from sparenet_tpu.ops.pallas.expansion_pallas import expansion_pallas

    for bp, s in ((8, 32), (2, 200)):
        x = jnp.asarray(rng.rand(bp, s, 3), jnp.float32)
        p_pal, c_pal, charged_pal = expansion_pallas(x, s, interpret=True)
        p_ref, c_ref = _mst_parents_xla(x)
        charged_ref = _prune_edges(p_ref, c_ref, s)
        np.testing.assert_array_equal(
            np.asarray(charged_pal)[:, 1:], np.asarray(charged_ref))


def test_emd_bids_pallas_matches_xla(rng):
    """Fused top-2 bid kernel vs the XLA _round_bids path (targets exact,
    increments to float tolerance; near-tie flips are excluded by seeding)."""
    from sparenet_tpu.ops.emd import _round_bids
    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas

    b, n = 2, 256
    x1 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
    price = jnp.asarray(rng.rand(b, n) * 0.1, jnp.float32)

    t_ref, i_ref = jax.vmap(
        lambda a, c, p: _round_bids(a, c, p))(x1, x2, price)
    t_pal, i_pal = emd_bids_pallas(x1, x2, price, bt=64, oc=128,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(t_pal), np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(i_pal), np.asarray(i_ref),
                               atol=1e-5)


def test_emd_bids_pallas_second_best_semantics():
    """Duplicate best values at different objects: second-best must equal
    the best (value excluded by POSITION, not by value), and the target
    must be the lowest object index."""
    from sparenet_tpu.ops.pallas.emd_pallas import emd_bids_pallas

    n = 128
    x1 = jnp.zeros((1, n, 3), jnp.float32)
    # objects 3 and 7 equidistant from every bidder (identical coords)
    x2 = jnp.ones((1, n, 3), jnp.float32) * 2.0
    x2 = x2.at[0, 3].set(jnp.array([0.1, 0.0, 0.0]))
    x2 = x2.at[0, 7].set(jnp.array([0.1, 0.0, 0.0]))
    price = jnp.zeros((1, n), jnp.float32)
    t, inc = emd_bids_pallas(x1, x2, price, bt=64, oc=64, interpret=True)
    assert int(t[0, 0]) == 3
    np.testing.assert_allclose(np.asarray(inc[0]), 0.0, atol=1e-7)


def _p2i_xla_reference(points, feats, binds, radius, b, h, w):
    from sparenet_tpu.ops.p2i import _p2i_max_forward
    bg = jnp.zeros((b, h, w, 1), jnp.float32)
    return _p2i_max_forward(points, feats, binds, bg, radius)


def _p2i_case(rng, b, n, h, w):
    pts = jnp.asarray(
        np.stack([rng.rand(b * n) * (h + 8) - 4,
                  rng.rand(b * n) * (w + 8) - 4], -1), jnp.float32)
    feats = jnp.asarray(rng.rand(b * n, 1) + 0.1, jnp.float32)
    binds = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    return pts, feats, binds


@pytest.mark.parametrize("grouped", [False, True])
def test_p2i_pallas_matches_xla(rng, grouped):
    """Tile-bucket splat kernel (both preps) vs the XLA window-scatter
    path: values exact, winner ids exact."""
    from sparenet_tpu.ops.pallas.p2i_pallas import p2i_max_pallas

    b, n, h, w, radius = 2, 200, 32, 128, 4.5
    pts, feats, binds = _p2i_case(rng, b, n, h, w)
    v_ref, i_ref = _p2i_xla_reference(pts, feats, binds, radius, b, h, w)
    v_pal, i_pal = p2i_max_pallas(pts, feats, binds, radius, b, h, w,
                                  with_ids=True, grouped=grouped,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_p2i_pallas_values_only(rng):
    from sparenet_tpu.ops.pallas.p2i_pallas import p2i_max_pallas

    b, n, h, w, radius = 2, 150, 64, 128, 7.0
    pts, feats, binds = _p2i_case(rng, b, n, h, w)
    v_ref, _ = _p2i_xla_reference(pts, feats, binds, radius, b, h, w)
    v_pal, ids = p2i_max_pallas(pts, feats, binds, radius, b, h, w,
                                with_ids=False, grouped=True,
                                interpret=True)
    assert ids is None
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-6)


def test_chamfer_nn_pallas_matches_xla(rng):
    from sparenet_tpu.ops.chamfer import _nn_one
    from sparenet_tpu.ops.pallas.chamfer_pallas import nn_idx_pallas

    # uneven sizes exercise the object-lane padding mask
    x = jnp.asarray(rng.rand(2, 700, 3), jnp.float32)
    y = jnp.asarray(rng.rand(2, 900, 3), jnp.float32)
    _, i_ref = jax.vmap(_nn_one)(x, y)
    i_pal = nn_idx_pallas(x, y, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_chamfer_nn_pallas_tie_break(rng):
    from sparenet_tpu.ops.pallas.chamfer_pallas import nn_idx_pallas

    # duplicated object points: lowest index must win
    y = np.asarray(rng.rand(1, 640, 3), np.float32)
    y[0, 500] = y[0, 20]
    y[0, 601] = y[0, 20]
    x = jnp.asarray(y[:, 20:21, :])
    i_pal = nn_idx_pallas(x, jnp.asarray(y), interpret=True)
    assert int(i_pal[0, 0]) == 20


def test_knn_pallas_onechunk_matches_xla(rng):
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas
    from sparenet_tpu.ops.knn import _knn_one

    x = jnp.asarray(rng.rand(2, 300, 20) - 0.5, jnp.float32)
    i_ref = np.asarray(jax.vmap(lambda p: _knn_one(p, p, 6))(x))
    i_pal = np.asarray(knn_self_pallas(x, 6, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_knn_pallas_chunked_fallback_matches_xla(rng, monkeypatch):
    # force the multi-chunk kernel (normally only for large C*N shapes);
    # distinct shape so the jit cache cannot reuse a one-chunk trace
    from sparenet_tpu.ops.pallas import knn_pallas as kp
    from sparenet_tpu.ops.knn import _knn_one

    monkeypatch.setattr(kp, "_ONECHUNK_MAX_ELEMS", 0)
    monkeypatch.setattr(kp, "_C_CHUNK", 128)
    x = jnp.asarray(rng.rand(2, 260, 150) - 0.5, jnp.float32)
    i_ref = np.asarray(jax.vmap(lambda p: _knn_one(p, p, 5))(x))
    i_pal = np.asarray(kp.knn_self_pallas(x, 5, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_knn_pallas_duplicate_point_tie_break(rng):
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas

    y = np.asarray(rng.rand(1, 384, 3), np.float32)
    y[0, 300] = y[0, 7]
    y[0, 41] = y[0, 7]
    i_pal = np.asarray(knn_self_pallas(jnp.asarray(y), 3, interpret=True))
    # neighbors of the duplicated point: lowest indices first (7, 41, 300)
    assert list(i_pal[0, 7][:2]) == [7, 41]
    assert list(i_pal[0, 300][:2]) == [7, 41]


def test_mds_pallas_multirow_grid(rng, monkeypatch):
    # force r < b (grid > 1, double-buffered row blocks); distinct shape
    # so the jit cache cannot reuse a full-batch trace
    monkeypatch.setenv("MDS_BLOCK_ELEMS", "1000")
    monkeypatch.setenv("MDS_BLOCK_ELEMS_G1", "1000")
    x = jnp.asarray(rng.rand(4, 640, 3) - 0.5, jnp.float32)
    mml = jnp.asarray([0.05, 0.1, 0.2, 0.07], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(x, 128, mml, impl="xla"))
    i_pal = np.asarray(mds_pallas(x, 128, mml, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_knn_pallas_packed_matches_exact(rng):
    # packed-key serving selection: on generic random clouds (no
    # engineered near-ties at the truncated-mantissa scale) the picks
    # match the exact kernel; ties break to the lowest index by the
    # key's embedded lane bits
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas

    x = jnp.asarray(rng.rand(2, 300, 20) - 0.5, jnp.float32)
    i_ref = np.asarray(knn_self_pallas(x, 6, interpret=True))
    i_pal = np.asarray(knn_self_pallas(x, 6, packed=True, interpret=True))
    assert (i_pal == i_ref).mean() > 0.999
    # the self column (distance 0) must always be exact
    np.testing.assert_array_equal(i_pal[:, :, 0], i_ref[:, :, 0])


def test_knn_pallas_packed_duplicate_tie_break(rng):
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas

    y = np.asarray(rng.rand(1, 384, 3), np.float32)
    y[0, 300] = y[0, 7]
    y[0, 41] = y[0, 7]
    i_pal = np.asarray(
        knn_self_pallas(jnp.asarray(y), 3, packed=True, interpret=True))
    assert list(i_pal[0, 7][:2]) == [7, 41]
    assert list(i_pal[0, 300][:2]) == [7, 41]


def _xla_gather_max(t, idx, need_sum):
    gj = np.take_along_axis(
        np.asarray(t, np.float32)[:, :, None, :],
        np.asarray(idx)[..., None], axis=1)
    m = gj.max(axis=2)
    return (m, gj.sum(axis=(1, 2))) if need_sum else m


def test_gather_rows_max_matches_xla(rng):
    from sparenet_tpu.ops.pallas.gather_pallas import gather_rows_max

    t = jnp.asarray(rng.rand(2, 300, 70) - 0.5, jnp.float32)
    idx = jnp.asarray(rng.randint(0, 300, size=(2, 300, 8)), jnp.int32)
    m_ref = _xla_gather_max(t, idx, False)
    m = np.asarray(gather_rows_max(t, idx, interpret=True))
    np.testing.assert_array_equal(m, m_ref)


def test_gather_rows_max_with_sum(rng):
    from sparenet_tpu.ops.pallas.gather_pallas import gather_rows_max

    # ragged M (pad rows must not pollute the sum) + k != 8
    t = jnp.asarray(rng.rand(2, 1000, 130) - 0.5, jnp.float32)
    idx = jnp.asarray(rng.randint(0, 1000, size=(2, 1000, 4)), jnp.int32)
    m_ref, s_ref = _xla_gather_max(t, idx, True)
    m, s = gather_rows_max(t, idx, need_sum=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), m_ref)
    # f32 sum of 4000 rows: accumulation order differs from numpy
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4, atol=1e-3)


def test_gather_rows_max_bf16(rng):
    from sparenet_tpu.ops.pallas.gather_pallas import gather_rows_max

    t = jnp.asarray(rng.rand(2, 256, 64) - 0.5, jnp.float32).astype(
        jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 256, size=(2, 256, 8)), jnp.int32)
    m_ref, s_ref = _xla_gather_max(t, idx, True)
    m, s = gather_rows_max(t, idx, need_sum=True, interpret=True)
    assert m.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(m, np.float32), m_ref)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-6)
