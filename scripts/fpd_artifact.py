#!/usr/bin/env python
"""FPD end-to-end artifact: train the replacement classifier, drive the
full 1200-model protocol through the root test_fpd.py CLI, and check
score stability across classifier seeds.

The reference's pretrained classifier (Frechet/cls_model_39.pth) is a
missing large blob upstream, so absolute FPD values here are NOT
paper-comparable — this artifact demonstrates the pipeline end-to-end
and that the metric discriminates and is stable:
  - real vs noisy-fake clouds score far above real vs held-out real;
  - per-category scores from two independently trained classifiers
    (different seeds) agree in ordering.

Clouds are synthetic stand-ins keyed to the real fpd_test.list taxonomy
ids (the 1200-entry list, 150 x 8 categories, is the reference protocol
Frechet/test.list / test_fpd.py:91-136). Results land in
output/fpd_artifact/ and are summarized in docs/FPD_ARTIFACT.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "output/fpd_artifact"
N_POINTS = 2048


def make_cfg():
    from sparenet_tpu.configs import default_config
    cfg = default_config()
    cfg.DATASET.train_dataset = "Synthetic"
    cfg.DATASET.test_dataset = "Synthetic"
    cfg.DATASET.n_outpoints = N_POINTS
    cfg.CONST.n_input_points = 512
    cfg.DATASETS.synthetic.n_categories = 8
    cfg.DATASETS.synthetic.n_train = 512
    return cfg


def train_and_save(seed: int, logger) -> str:
    from sparenet_tpu.data.datasets import SyntheticDataset
    from sparenet_tpu.frechet.train_classifier import train_classifier
    from flax import traverse_util

    ds = SyntheticDataset(make_cfg(), "train")
    variables = train_classifier(ds, num_classes=16, n_points=1024,
                                 epochs=10, batch_size=32, seed=seed,
                                 logger=logger)
    flat = traverse_util.flatten_dict(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    path = os.path.join(OUT, f"fpd_cls_seed{seed}.npz")
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    return path


def build_pcd_trees(list_path: str):
    """Real = clean synthetic surface per taxonomy; fake = the same
    surface + sigma=0.02 noise + 25% duplicated points (completion-
    artifact stand-in); null-fake = an independent clean sample."""
    from sparenet_tpu.data.datasets import _SYNTH_SHAPES, _surface_points
    from sparenet_tpu.data.io import IO
    from test_fpd import TAXONOMY2LABEL

    with open(list_path) as f:
        model_list = f.read().splitlines()
    real_dir = os.path.join(OUT, "real")
    fake_dir = os.path.join(OUT, "fake")
    null_dir = os.path.join(OUT, "nullfake")
    for i, model_id in enumerate(model_list):
        taxonomy_id, _ = model_id.split("/")
        label = TAXONOMY2LABEL[taxonomy_id]
        shape = _SYNTH_SHAPES[label]
        rs = np.random.RandomState(77_000 + i)
        real = _surface_points(shape, N_POINTS, rs)
        noise = rs.randn(N_POINTS, 3).astype(np.float32) * 0.02
        fake = real + noise
        dup = rs.permutation(N_POINTS)[:N_POINTS // 4]
        fake[dup] = fake[rs.permutation(N_POINTS)[:N_POINTS // 4]]
        null = _surface_points(shape, N_POINTS, rs)
        for root, cloud in ((real_dir, real), (fake_dir, fake),
                            (null_dir, null)):
            path = os.path.join(
                root if root != real_dir else os.path.join(root, "complete"),
                f"{model_id}.pcd")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            IO.put(path, cloud)
    return real_dir, fake_dir, null_dir


def run_cli(weights, real_dir, fake_dir, tag, list_path):
    log_dir = os.path.join(OUT, f"logs_{tag}")
    subprocess.run(
        [sys.executable, "test_fpd.py", "--weights", weights,
         "--data_dir", real_dir, "--fake_dir", fake_dir,
         "--list_path", list_path, "--num_points", str(N_POINTS),
         "--batch_size", "30", "--log_dir", log_dir],
        check=True)
    scores = {}
    with open(os.path.join(log_dir, "log.txt")) as f:
        for line in f:
            if "Frechet Pointcloud Distance" in line:
                cat = line.split("[")[1].split("category")[0].strip()
                val = float(line.rsplit("<<<", 1)[1].split(">>>")[0])
                scores[cat] = val
    return scores


def main():
    os.makedirs(OUT, exist_ok=True)
    from sparenet_tpu.utils.logging import set_logger
    logger = set_logger(os.path.join(OUT, "train_log.txt"))

    list_path = "sparenet_tpu/data/meta/fpd_test.list"
    logger.info("building 3 x 1200 pcd trees ...")
    real_dir, fake_dir, null_dir = build_pcd_trees(list_path)

    results = {}
    for seed in (0, 1):
        logger.info(f"training classifier seed {seed} ...")
        weights = train_and_save(seed, logger)
        results[f"fake_seed{seed}"] = run_cli(
            weights, real_dir, fake_dir, f"fake_s{seed}", list_path)
        results[f"null_seed{seed}"] = run_cli(
            weights, real_dir, null_dir, f"null_s{seed}", list_path)

    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
