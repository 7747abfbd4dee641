"""Train + pin the CANONICAL FPD classifier (VERDICT r2 weak #7 / task #8).

The round-2 FPD artifact trained two throwaway classifiers (512 clouds,
10 epochs) whose fake-score ordering varied ~7x by seed. This script
trains ONE canonical embedding on 8x the data and 4x the epochs, fully
deterministically (seed 0 everywhere), and writes it to the tracked
repo path `sparenet_tpu/data/fpd_cls_canonical.npz` so `test_fpd.py`
scores are comparable across machines and rounds. Reference flow:
Frechet/FPD.py:178-202 (its own pretrained cls_model_39.pth is a
missing large blob upstream).

Run ON TPU (background, natural completion):
  python scripts/fpd_canonical.py
Prints the file sha256; docs/FPD_ARTIFACT.md records the canonical hash.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_TRAIN = 4096
EPOCHS = 40
SEED = 0
N_POINTS = 1024
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "sparenet_tpu", "data", "fpd_cls_canonical.npz")


class _Cached:
    """Pre-generates every gtcloud once (host-side synthesis dominates
    the epoch loop otherwise) and serves (tax, label, id, data) items."""

    def __init__(self, ds):
        self.items = [ds[i] for i in range(len(ds))]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main():
    from flax import traverse_util

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import SyntheticDataset
    from sparenet_tpu.frechet.train_classifier import train_classifier
    from sparenet_tpu.utils.logging import set_logger

    logger = set_logger(None)
    cfg = default_config()
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 512
    cfg.DATASETS.synthetic.n_categories = 8
    cfg.DATASETS.synthetic.n_train = N_TRAIN

    print(f"generating {N_TRAIN} clouds ...", flush=True)
    ds = _Cached(SyntheticDataset(cfg, "train"))
    variables = train_classifier(ds, num_classes=16, n_points=N_POINTS,
                                 epochs=EPOCHS, batch_size=32, seed=SEED,
                                 logger=logger)
    flat = traverse_util.flatten_dict(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    np.savez_compressed(
        OUT, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    digest = hashlib.sha256(open(OUT, "rb").read()).hexdigest()
    size_mb = os.path.getsize(OUT) / 1e6
    print(f"saved {OUT} ({size_mb:.1f} MB)\nsha256 {digest}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
