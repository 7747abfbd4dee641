"""Visualization + result tables.

Rebuild of utils/visualizer.py:17-169: matplotlib 3-view point-cloud
plots, per-category result tables appended as JSON lines to test.txt,
TensorBoard image dumps and depth-map PNG export via the TPU renderer.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..renderer import ComputeDepthMaps


def get_ptcloud_img(ptcloud) -> np.ndarray:
    """Single 3D scatter rendered to an RGB array
    (utils/visualizer.py:17-42)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ptcloud = np.asarray(ptcloud)
    fig = plt.figure(figsize=(3, 3))
    x, z, y = ptcloud.transpose(1, 0)
    ax = fig.add_subplot(projection="3d")
    ax.axis("off")
    ax.view_init(30, -45)
    ax.set_xlim((-0.3, 0.3))
    ax.set_ylim((-0.3, 0.3))
    ax.set_zlim((-0.3, 0.3))
    ax.scatter(x, y, z, zdir="z", c=x, cmap="jet")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def plot_pcd_three_views(filename, pcds, titles, suptitle="", sizes=None,
                         cmap="Reds", zdir="y",
                         xlim=(-0.3, 0.3), ylim=(-0.3, 0.3), zlim=(-0.3, 0.3)):
    """3 views x len(pcds) grid (utils/visualizer.py:45-76)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pcds = [np.asarray(p) for p in pcds]
    if sizes is None:
        sizes = [0.5] * len(pcds)
    fig = plt.figure(figsize=(len(pcds) * 3, 9))
    elev = 30
    for i in range(3):
        azim = -45 + 90 * i
        for j, (pcd, size) in enumerate(zip(pcds, sizes)):
            ax = fig.add_subplot(3, len(pcds), i * len(pcds) + j + 1,
                                 projection="3d")
            ax.view_init(elev, azim)
            ax.scatter(pcd[:, 0], pcd[:, 1], pcd[:, 2], zdir=zdir,
                       c=pcd[:, 0], s=size, cmap=cmap, vmin=-1, vmax=0.5)
            ax.set_title(titles[j])
            ax.set_axis_off()
            ax.set_xlim(xlim)
            ax.set_ylim(ylim)
            ax.set_zlim(zlim)
    plt.subplots_adjust(left=0.05, right=0.95, bottom=0.05, top=0.9,
                        wspace=0.1, hspace=0.1)
    plt.suptitle(suptitle)
    fig.savefig(filename)
    plt.close(fig)


def print_table(cfg, epoch_idx, test_metrics, category_metrics, test_writer,
                test_losses):
    """Per-category metric table + JSON line to test.txt
    (utils/visualizer.py:79-122)."""
    log_table = {"epoch": epoch_idx}
    print("============================ TEST RESULTS ============================")
    print("epoch", epoch_idx)
    header = ["Taxonomy", "#Sample"] + list(test_metrics.items)
    print("\t".join(header))
    for taxonomy_id, meter in category_metrics.items():
        row = [str(taxonomy_id), str(meter.count(0))]
        row += ["%.4f" % v for v in meter.avg()]
        print("\t".join(row))
        for i, m in enumerate(meter.items):
            log_table[f"{taxonomy_id}_{m}"] = "%.6f" % meter.avg(i)
    print("Overall\t\t" + "\t".join("%.4f" % v for v in test_metrics.avg()))
    print()
    for i, m in enumerate(test_metrics.items):
        log_table[f"overall_{m}"] = "%.6f" % test_metrics.avg(i)

    if test_writer is not None:
        if len(test_losses.items) >= 2:
            test_writer.add_scalar("Loss/Epoch/Sparse", test_losses.avg(0), epoch_idx)
            test_writer.add_scalar("Loss/Epoch/Dense", test_losses.avg(1), epoch_idx)
        for i, metric in enumerate(test_metrics.items):
            test_writer.add_scalar(f"Metric/{metric}", test_metrics.avg(i), epoch_idx)

    os.makedirs(cfg.DIR.logs, exist_ok=True)
    with open(os.path.join(cfg.DIR.logs, "test.txt"), "a") as f:
        f.write("json_stats: " + json.dumps(log_table) + "\n")


def tensorboard_save_image(refine_ptcloud, data, test_writer, model_idx,
                           epoch_idx):
    """TB image triplet per sample (utils/visualizer.py:125-140)."""
    partial = np.asarray(data["partial_cloud"])[0]
    test_writer.add_image(
        "Model%02d/ParticalReconstruction" % model_idx,
        np.transpose(get_ptcloud_img(partial), (2, 0, 1)), 0)
    refine = np.asarray(refine_ptcloud)[0]
    test_writer.add_image(
        "Model%02d/DenseReconstruction" % model_idx,
        np.transpose(get_ptcloud_img(refine), (2, 0, 1)), epoch_idx)
    gt = np.asarray(data["gtcloud"])[0]
    test_writer.add_image(
        "Model%02d/GroundTruth" % model_idx,
        np.transpose(get_ptcloud_img(gt), (2, 0, 1)), 1)


def _save_gray_png(path, img):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path), exist_ok=True)
    plt.imsave(path, np.asarray(img), cmap="gray", vmin=0.0, vmax=1.0)


def save_depth_map(cfg, refine_ptcloud, data, taxonomy_id, model_idx):
    """Depth-map PNGs for refine/partial/gt from all 8 views at radius 7
    (utils/visualizer.py:143-169)."""
    renderer = ComputeDepthMaps(
        projection=cfg.RENDER.projection,
        eyepos_scale=cfg.RENDER.eyepos,
        image_size=cfg.RENDER.img_size,
    )
    base = os.path.join(cfg.DIR.logs, "plots", str(taxonomy_id), str(model_idx))
    for j in range(renderer.num_views):
        for tag, cloud in (("1", data["partial_cloud"]),
                           ("2", refine_ptcloud),
                           ("3", data["gtcloud"])):
            img = renderer(cloud, view_id=j, radius_list=[7.0])
            _save_gray_png(os.path.join(base, f"{j}{tag}.png"),
                           np.asarray(img)[0, :, :, 0])
