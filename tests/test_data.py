"""Data pipeline tests: IO codecs (python + native), transforms, loaders."""

import numpy as np
import pytest

from sparenet_tpu.data.io import IO, read_pcd, write_pcd
from sparenet_tpu.data import transforms as T
from sparenet_tpu.data.loaders import DataLoader
from sparenet_tpu.data.datasets import SyntheticDataset, TRAIN
from sparenet_tpu.configs import default_config


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, pts)
    back = read_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_pcd_native_matches_python(tmp_path, rng):
    from sparenet_tpu.native import read_pcd_native, build
    if not build():
        pytest.skip("native toolchain unavailable")
    pts = rng.rand(64, 3).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, pts)
    nat = read_pcd_native(path)
    assert nat is not None
    np.testing.assert_allclose(nat, pts, atol=1e-6)


def test_pcd_ascii(tmp_path, rng):
    pts = rng.rand(10, 3)
    path = tmp_path / "a.pcd"
    header = ("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
              "COUNT 1 1 1\nWIDTH 10\nHEIGHT 1\nPOINTS 10\nDATA ascii\n")
    with open(path, "w") as f:
        f.write(header)
        for p in pts:
            f.write("%f %f %f\n" % tuple(p))
    back = read_pcd(str(path))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_h5_scale_quirk(tmp_path, rng):
    """Reference scales .h5 reads by 0.9 (datasets/io.py:62-65)."""
    h5py = pytest.importorskip("h5py")
    pts = rng.rand(16, 3)
    path = str(tmp_path / "c.h5")
    IO.put(path, pts)
    back = IO.get(path)
    np.testing.assert_allclose(back, pts * 0.9, atol=1e-6)


def test_random_sample_points(rng):
    tr = T.RandomSamplePoints({"n_points": 8})
    out = tr(rng.rand(20, 3))
    assert out.shape == (8, 3)
    # pad path
    out = tr(rng.rand(5, 3))
    assert out.shape == (8, 3)
    assert (out[5:] == 0).all()


def test_random_mirror_shared_rnd(rng):
    a = rng.rand(10, 3)
    b = rng.rand(12, 3)
    tr = T.RandomMirrorPoints()
    ma = tr(a.copy(), 0.4)   # x mirror branch
    mb = tr(b.copy(), 0.4)
    np.testing.assert_allclose(ma[:, 0], -a[:, 0])
    np.testing.assert_allclose(mb[:, 0], -b[:, 0])
    np.testing.assert_allclose(ma[:, 1:], a[:, 1:])


def test_normalize_object_pose(rng):
    bbox = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
                     [0, 0, 1], [2, 0, 1], [2, 2, 1], [0, 2, 1]], float)
    pts = rng.rand(30, 3) * 2
    tr = T.NormalizeObjectPose({"input_keys": {"ptcloud": "pc", "bbox": "bb"}})
    data = tr({"pc": pts.copy(), "bb": bbox.copy()})
    assert np.abs(data["pc"]).max() < 2.0


def test_dataloader_batching():
    cfg = default_config()
    cfg.DATASET.n_outpoints = 64
    cfg.CONST.n_input_points = 32
    cfg.DATASETS.synthetic.n_train = 10
    ds = SyntheticDataset(cfg, TRAIN)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    tax, labels, mids, data = batches[0]
    assert data["partial_cloud"].shape == (4, 32, 3)
    assert data["gtcloud"].shape == (4, 64, 3)
    assert labels.dtype == np.int32


def test_synthetic_deterministic():
    cfg = default_config()
    cfg.DATASET.n_outpoints = 64
    cfg.CONST.n_input_points = 32
    ds = SyntheticDataset(cfg, TRAIN)
    a = ds[3][3]["gtcloud"]
    b = ds[3][3]["gtcloud"]
    np.testing.assert_array_equal(a, b)
