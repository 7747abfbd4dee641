#!/usr/bin/env python
"""Evaluation CLI (rebuild of reference test.py:9-76).

Usage:
    python test.py --model sparenet --weights CKPT \
        [--test_mode {default,vis,render,kitti}]
"""

from __future__ import annotations

import argparse
import os


def get_args_from_command_line():
    parser = argparse.ArgumentParser(description="SpareNet-TPU evaluation")
    parser.add_argument("--model", type=str, default="sparenet",
                        choices=["sparenet", "atlasnet", "msn", "grnet"])
    parser.add_argument("--gan", action="store_true")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--weights", type=str, required=True,
                        help="checkpoint to evaluate (required, test.py:61-63)")
    parser.add_argument("--gpu", dest="gpu_id", type=str, default="0")
    parser.add_argument("--workdir", type=str, default=None)
    parser.add_argument("--test_mode", type=str, default="default",
                        choices=["default", "vis", "render", "kitti"])
    parser.add_argument("--dataset", type=str, default=None)
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
    cfg.TEST.mode = args.test_mode
    if args.dataset:
        cfg.DATASET.train_dataset = args.dataset
        cfg.DATASET.test_dataset = args.dataset
    if args.test_mode == "kitti":
        cfg.DATASET.test_dataset = "KITTI"

    logger = set_logger(os.path.join(cfg.DIR.logs, "log.txt"))
    runner_cls = get_runner(cfg, gan=args.gan)
    runner = runner_cls(cfg, logger)
    runner.test()


if __name__ == "__main__":
    main()
