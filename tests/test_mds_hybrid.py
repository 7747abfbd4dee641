"""Hybrid batched-prefix / exact-tail MDS (ops/mds._mds_hybrid).

Contract: the prefix is _mds_batched (its own tests cover the
relaxation); the tail is an EXACT greedy continuation from the prefix
density state (MDS_cuda.cu:104-211 semantics). With prefix g=1 the
prefix itself is exact greedy, so the whole hybrid must reproduce the
numpy replica index-for-index. The Pallas tail (mds_pallas_continue,
interpret mode) must agree with the XLA tail from the same state.

Quality contract at production scale is hardware-measured
(scripts/r4/mds_lab.py + docs/SERVING_ENVELOPE.md): the lab shows the
hybrid holds exact-level clump/fill/F metrics down to tail = npoint/16.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.mds import _mds_batched, _mds_hybrid
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas_continue
from test_mds_expansion import np_mds


def test_hybrid_g1_prefix_is_exact_greedy(rng):
    # prefix g=1 == sequential greedy; exact tail continues it -> the
    # full hybrid trajectory is exact greedy end to end
    xyz = rng.rand(2, 193, 3)
    mml = np.array([0.25, 0.4], np.float32)
    for tail in (1, 40, 120):
        idx = np.asarray(_mds_hybrid(
            jnp.asarray(xyz, jnp.float32), 150, jnp.asarray(mml),
            g=1, tail=tail, tail_impl="xla"))
        for b in range(2):
            ref = np_mds(xyz[b], 150, float(mml[b]))
            np.testing.assert_array_equal(
                idx[b], ref, err_msg=f"tail={tail} b={b}")


def test_hybrid_invariants(rng):
    xyz = jnp.asarray(rng.rand(3, 300, 3), jnp.float32)
    mml = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    for g, tail in ((64, 32), (128, 250), (256, 299), (64, 1000)):
        idx = np.asarray(_mds_hybrid(xyz, 250, mml, g=g, tail=tail,
                                     tail_impl="xla"))
        assert idx.shape == (3, 250)
        assert (idx[:, 0] == 0).all()
        assert (idx >= 0).all() and (idx < 300).all()
        for b in range(3):
            assert len(set(idx[b])) == 250, f"g={g},tail={tail},b={b}"


def test_hybrid_tail_prefix_consistent(rng):
    # the first npoint-tail picks ARE the batched prefix
    xyz = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
    mml = jnp.asarray([0.15, 0.3], jnp.float32)
    idx = np.asarray(_mds_hybrid(xyz, 240, mml, g=64, tail=40,
                                 tail_impl="xla"))
    pref = np.asarray(_mds_batched(xyz, 200, mml, g=64))
    np.testing.assert_array_equal(idx[:, :200], pref)


def test_hybrid_beats_batched_on_greedy_overlap(rng):
    xyz = rng.rand(1, 400, 3)
    mml = jnp.asarray([0.15], jnp.float32)
    xj = jnp.asarray(xyz, jnp.float32)
    ref = set(np_mds(xyz[0], 300, 0.15))
    hyb = np.asarray(_mds_hybrid(xj, 300, mml, g=64, tail=75,
                                 tail_impl="xla"))
    bat = np.asarray(_mds_batched(xj, 300, mml, g=64))
    ov_h = len(set(hyb[0]) & ref) / 300
    ov_b = len(set(bat[0]) & ref) / 300
    assert ov_h > 0.9, ov_h
    assert ov_h >= ov_b - 0.02, (ov_h, ov_b)


def test_pallas_continue_matches_xla_tail(rng):
    # same prefix state -> the Pallas continuation (interpret mode) and
    # the XLA fori continuation pick the same points in the same order
    xyz = jnp.asarray(rng.rand(2, 200, 3), jnp.float32)
    mml = jnp.asarray([0.2, 0.35], jnp.float32)
    npick, tail = 100, 60
    _, temp = _mds_batched(xyz, npick, mml, g=32, return_state=True)

    via_xla = np.asarray(_mds_hybrid(xyz, npick + tail, mml, g=32,
                                     tail=tail, tail_impl="xla"))

    # compact live lanes exactly as _mds_hybrid's pallas branch does
    b, n, _ = xyz.shape
    lane = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    picked = temp >= 5e8
    key = jnp.where(picked, jnp.int32(1 << 24), 0) + lane
    xt = jnp.moveaxis(xyz, -1, 0)
    _, temp_c, orig, xs, ys, zs = jax.lax.sort(
        (key, temp, lane, xt[0], xt[1], xt[2]), dimension=-1, num_keys=1)
    nlive = n - npick
    xyz_c = jnp.stack([xs[:, :nlive], ys[:, :nlive], zs[:, :nlive]], -1)
    lanes = mds_pallas_continue(xyz_c, temp_c[:, :nlive], orig[:, :nlive],
                                mml, tail, interpret=True)
    tail_ids = np.asarray(jnp.take_along_axis(orig[:, :nlive], lanes, 1))
    np.testing.assert_array_equal(tail_ids, via_xla[:, npick:])


def test_hybrid_heavy_weighting_rides_compaction(rng):
    # points >= _HEAVY_FROM keep their 2x weight through lane compaction
    import sparenet_tpu.ops.mds as mdsmod
    old_m = mdsmod._HEAVY_FROM
    mdsmod._HEAVY_FROM = 100  # xla tail reads the ops.mds global only
    try:
        xyz = jnp.asarray(rng.rand(1, 200, 3), jnp.float32)
        mml = jnp.asarray([0.3], jnp.float32)
        a = np.asarray(_mds_hybrid(xyz, 150, mml, g=32, tail=60,
                                   tail_impl="xla"))
        bnp = np_mds(np.asarray(xyz[0]), 150, 0.3, heavy_from=100)
        # prefix relaxation differs from greedy; assert the heavy-point
        # bias survives: overlap with the weighted greedy stays high
        ov = len(set(a[0]) & set(bnp)) / 150
        assert ov > 0.85, ov
    finally:
        mdsmod._HEAVY_FROM = old_m


def test_hybrid_return_xyz_matches_idx(rng):
    """Fused selected-coordinate output (serving refine path): sel must
    equal xyz[idx] exactly, and idx must equal the non-fused call."""
    xyz = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
    mml = jnp.asarray([0.3, 0.45], jnp.float32)
    idx0 = np.asarray(_mds_hybrid(xyz, 220, mml, g=64, tail=60,
                                  tail_impl="xla"))
    idx, sel = _mds_hybrid(xyz, 220, mml, g=64, tail=60,
                           tail_impl="xla", return_xyz=True)
    np.testing.assert_array_equal(np.asarray(idx), idx0)
    ref = np.take_along_axis(np.asarray(xyz),
                             np.asarray(idx)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(sel), ref)
