#!/usr/bin/env python
"""FPD evaluation CLI (rebuild of reference test_fpd.py).

Scores saved completion results (.pcd/.h5) against ground-truth clouds:
per-category FPD over the fixed 1200-model ShapeNet test list
(sparenet_tpu/data/meta/fpd_test.list, 150 models x 8 categories) plus
the overall FPD.

Classifier weights: --weights points at either (a) an orbax/npz dump of
a natively trained PointNetCls (sparenet_tpu.frechet.train_classifier)
or (b) a torch cls_model_39.pth state_dict, auto-converted. The
reference repo ships neither (its checkpoint is a missing large blob);
this repo pins a CANONICAL classifier at
sparenet_tpu/data/fpd_cls_canonical.npz (scripts/fpd_canonical.py
recipe; sha256 in docs/FPD_ARTIFACT.md), the default when present, so
FPD numbers are comparable across machines and rounds.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

TAXONOMY2LABEL = {
    "02691156": 0, "02933112": 1, "02958343": 2, "03001627": 3,
    "03636649": 4, "04256520": 5, "04379243": 6, "04530566": 7,
}
LABEL2TAXONOMY = {v: k for k, v in TAXONOMY2LABEL.items()}


def load_classifier(path: str):
    from sparenet_tpu.frechet import load_torch_state
    if path.endswith(".pth"):
        import torch
        sd = torch.load(path, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        return load_torch_state(sd)
    if path.endswith(".npz"):
        import jax.numpy as jnp
        from flax import traverse_util
        flat = dict(np.load(path))
        tree = traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
        return tree
    raise ValueError(f"unsupported classifier weight format: {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log_dir", default="./output/fpd_logs")
    parser.add_argument("--list_path",
                        default="sparenet_tpu/data/meta/fpd_test.list")
    parser.add_argument("--data_dir", default="/path/to/test/dataset/pcds")
    parser.add_argument("--fake_dir", default="/path/to/methods/pcds")
    _canonical = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "sparenet_tpu", "data", "fpd_cls_canonical.npz")
    parser.add_argument("--weights",
                        required=not os.path.exists(_canonical),
                        default=_canonical if os.path.exists(_canonical)
                        else None,
                        help="PointNetCls weights (.npz native or .pth "
                             "torch); defaults to the pinned canonical "
                             "classifier when present")
    parser.add_argument("--num_points", type=int, default=16384)
    parser.add_argument("--batch_size", type=int, default=30)
    opt = parser.parse_args()

    os.makedirs(opt.log_dir, exist_ok=True)
    from sparenet_tpu.utils.logging import set_logger
    from sparenet_tpu.frechet import calculate_fpd
    from sparenet_tpu.data.io import IO

    logger = set_logger(os.path.join(opt.log_dir, "log.txt"))
    logger.info("save into dir: %s" % opt.log_dir)

    with open(opt.list_path) as f:
        model_list = f.read().splitlines()
    logger.info("n_samples %s" % len(model_list))

    variables = load_classifier(opt.weights)

    def load_pair(model_id):
        fake = np.asarray(
            IO.get(os.path.join(opt.fake_dir, "%s.pcd" % model_id)))
        gt = np.asarray(
            IO.get(os.path.join(opt.data_dir, "complete", "%s.pcd" % model_id)))
        return (fake[: opt.num_points].astype(np.float32),
                gt[: opt.num_points].astype(np.float32))

    fpd_values = []
    all_fake, all_real = [], []
    for label in range(8):
        fakes, reals = [], []
        for model_id in model_list:
            taxonomy_id, _ = model_id.split("/")
            if TAXONOMY2LABEL[taxonomy_id] != label:
                continue
            fake, gt = load_pair(model_id)
            fakes.append(fake)
            reals.append(gt)
        fake_np = np.stack(fakes)
        real_np = np.stack(reals)
        all_fake.append(fake_np)
        all_real.append(real_np)
        fpd = calculate_fpd(fake_np, real_np, variables=variables,
                            batch_size=opt.batch_size)
        fpd_values.append(fpd)
        logger.info("[ %s  category] Frechet Pointcloud Distance <<< %f >>>"
                    % (LABEL2TAXONOMY[label], fpd))

    logger.info("avg FPD for 8 categories: %f" % np.mean(fpd_values))

    fpd = calculate_fpd(np.concatenate(all_fake), np.concatenate(all_real),
                        variables=variables, batch_size=opt.batch_size)
    logger.info("[ all category] Frechet Pointcloud Distance <<< %f >>>" % fpd)


if __name__ == "__main__":
    main()
