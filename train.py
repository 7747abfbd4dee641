#!/usr/bin/env python
"""Training CLI (rebuild of reference train.py:8-66).

Usage:
    python train.py --model sparenet [--gan] [--weights CKPT] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys


def get_args_from_command_line():
    parser = argparse.ArgumentParser(description="SpareNet-TPU training")
    parser.add_argument("--model", type=str, default="sparenet",
                        choices=["sparenet", "atlasnet", "msn", "grnet"],
                        help="model family to train")
    parser.add_argument("--gan", action="store_true",
                        help="adversarial-rendering training (SpareNet only)")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config override (default: per-model yaml)")
    parser.add_argument("--weights", type=str, default=None,
                        help="checkpoint to resume from")
    parser.add_argument("--gpu", dest="gpu_id", type=str, default="0",
                        help="device list (kept for reference CLI parity; "
                             "TPU device selection uses TPU.mesh_batch)")
    parser.add_argument("--workdir", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None,
                        help="override DATASET.{train,test}_dataset "
                             "(e.g. Synthetic)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    return parser.parse_args()


def main():
    args = get_args_from_command_line()

    from sparenet_tpu.configs import cfg_from_file, cfg_update
    from sparenet_tpu.runners import get_runner
    from sparenet_tpu.utils.logging import set_logger

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sparenet_tpu", "configs")
    yaml_name = args.model + ("_gan" if args.gan else "")
    yaml_path = args.config or os.path.join(pkg_dir, f"{yaml_name}.yaml")
    if not os.path.exists(yaml_path):
        yaml_path = os.path.join(pkg_dir, f"{args.model}.yaml")
    cfg = cfg_from_file(yaml_path)
    cfg_update(cfg, weights=args.weights, device=args.gpu_id,
               workdir=args.workdir)

    if args.dataset:
        cfg.DATASET.train_dataset = args.dataset
        cfg.DATASET.test_dataset = args.dataset
    if args.epochs:
        cfg.TRAIN.n_epochs = args.epochs
    if args.batch_size:
        cfg.TRAIN.batch_size = args.batch_size

    logger = set_logger(os.path.join(cfg.DIR.logs, "log.txt"))
    logger.info("Use config: %s" % yaml_path)

    runner_cls = get_runner(cfg, gan=args.gan)
    runner = runner_cls(cfg, logger)
    runner.runner()


if __name__ == "__main__":
    main()
