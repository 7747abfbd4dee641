"""Metric registry tests (utils/misc.py:133-260 parity)."""

import numpy as np

from sparenet_tpu.utils.metrics import (
    Metrics, chamfer_metric, compute_all, emd_metric, f_score,
)


def test_f_score_identical_clouds(rng):
    x = rng.rand(2, 64, 3).astype(np.float32)
    fs = np.asarray(f_score(x, x))
    np.testing.assert_allclose(fs, 1.0)


def test_f_score_disjoint_clouds(rng):
    a = rng.rand(1, 64, 3).astype(np.float32)
    b = a + 10.0
    fs = np.asarray(f_score(a, b))
    np.testing.assert_allclose(fs, 0.0)


def test_f_score_matches_definition(rng):
    """Against a direct numpy computation of precision/recall@0.01."""
    pred = rng.rand(1, 32, 3).astype(np.float32) * 0.05
    gt = rng.rand(1, 40, 3).astype(np.float32) * 0.05
    d = np.sqrt(((pred[0][:, None] - gt[0][None]) ** 2).sum(-1))
    precision = (d.min(1) < 0.01).mean()
    recall = (d.min(0) < 0.01).mean()
    expect = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
    np.testing.assert_allclose(float(f_score(pred, gt)[0]), expect, atol=1e-6)


def test_chamfer_metric_units(rng):
    x = rng.rand(1, 32, 3).astype(np.float32)
    y = rng.rand(1, 32, 3).astype(np.float32)
    d = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    expect = (d.min(1).mean() + d.min(0).mean()) * 1000
    np.testing.assert_allclose(float(chamfer_metric(x, y)[0]), expect,
                               rtol=1e-5)


def test_emd_metric_scale(rng):
    x = rng.rand(1, 64, 3).astype(np.float32)
    v = float(emd_metric(x, x, iters=100)[0])
    assert v < 5.0  # near-zero x100 scale


def test_metrics_better_than():
    a = Metrics("EMD", [0.5, 10.0, 2.0])
    b = Metrics("EMD", [0.4, 12.0, 3.0])
    assert a.better_than(b)       # lower EMD wins
    assert not b.better_than(a)
    assert a.better_than(None)
    c = Metrics("F-Score", [0.6, 10.0, 2.0])
    d = Metrics("F-Score", [0.5, 10.0, 2.0])
    assert c.better_than(d)       # higher F-Score wins
    e = Metrics("ChamferDistance", {"ChamferDistance": 5.0})
    assert e.state_dict()["ChamferDistance"] == 5.0


def test_compute_all_shape(rng):
    pred = rng.rand(3, 32, 3).astype(np.float32)
    gt = rng.rand(3, 32, 3).astype(np.float32)
    vals = compute_all(pred, gt, iters=10)
    assert vals.shape == (3, 3)
    assert np.isfinite(vals).all()
