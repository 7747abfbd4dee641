#!/usr/bin/env python
"""Standalone renderer demo (reference: utils/p2i_utils.py __main__,
:255-311): renders clouds from all 8 views at the configured radii,
saves PNGs, and times a single call."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="__temp__")
    parser.add_argument("--img-size", type=int, default=256)
    parser.add_argument("--n-points", type=int, default=16384)
    parser.add_argument("--radii", type=float, nargs="+", default=[5.0, 7.0, 10.0])
    parser.add_argument("--projection", default="orthorgonal",
                        choices=["orthorgonal", "perspective"])
    args = parser.parse_args()

    import jax.numpy as jnp
    from sparenet_tpu.renderer import ComputeDepthMaps
    from sparenet_tpu.configs import default_config
    from sparenet_tpu.data.datasets import SyntheticDataset, TEST

    os.makedirs(args.out, exist_ok=True)
    cfg = default_config()
    cfg.DATASET.n_outpoints = args.n_points
    dataset = SyntheticDataset(cfg, TEST)
    _, _, _, data = dataset[0]
    cloud = jnp.asarray(data["gtcloud"][None])

    renderer = ComputeDepthMaps(projection=args.projection,
                                image_size=args.img_size)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for view in range(renderer.num_views):
        maps = np.asarray(renderer(cloud, view_id=view,
                                   radius_list=args.radii))
        for j in range(len(args.radii)):
            path = os.path.join(args.out, f"depth_v{view}_r{j}.png")
            plt.imsave(path, maps[0, :, :, j], cmap="gray", vmin=0, vmax=1)
    print(f"saved {renderer.num_views * len(args.radii)} depth maps to {args.out}")

    t0 = time.time()
    np.asarray(renderer(cloud, view_id=0, radius_list=args.radii))
    print(f"{time.time() - t0} seconds")


if __name__ == "__main__":
    main()
