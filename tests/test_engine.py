"""Engine integration: tiny end-to-end training on the Synthetic dataset.

The reference's integration testing is 'the val loop of train runs'
(SURVEY §4); this reproduces it at toy scale: losses must be finite and
decrease, validation must produce per-category metrics, checkpoints must
round-trip.
"""

import os

import numpy as np
import pytest

from sparenet_tpu.configs import cfg_from_file, default_config, cfg_update
from sparenet_tpu.runners import get_runner
from sparenet_tpu.utils.logging import set_logger


def tiny_cfg(tmp_path, model="AtlasNet", **overrides):
    cfg = default_config()
    cfg.DATASET.train_dataset = "Synthetic"
    cfg.DATASET.test_dataset = "Synthetic"
    cfg.DATASET.n_outpoints = 128
    cfg.CONST.n_input_points = 64
    cfg.CONST.num_workers = 2
    cfg.NETWORK.model_type = model
    cfg.NETWORK.n_primitives = 4
    cfg.NETWORK.metric = "chamfer"
    cfg.NETWORK.n_sampling_points = 32
    cfg.TRAIN.batch_size = 4
    cfg.TRAIN.n_epochs = 1
    cfg.TRAIN.save_freq = 1
    cfg.TRAIN.learning_rate = 1e-3
    cfg.TEST.metric_name = "ChamferDistance"
    cfg.TEST.batch_size = 4
    cfg.TEST.infer_freq = 10**9      # skip side outputs
    cfg.DATASETS.synthetic.n_train = 16
    cfg.DATASETS.synthetic.n_val = 8
    cfg.DIR.out_path = str(tmp_path)
    for k, v in overrides.items():
        node = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = v
    cfg_update(cfg, timestamp=False)
    return cfg


def run_one_epoch(tmp_path, model, gan=False, **overrides):
    cfg = tiny_cfg(tmp_path, model, **overrides)
    logger = set_logger(None)
    runner = get_runner(cfg, gan=gan)(cfg, logger)
    runner.runner()
    return runner


def test_atlasnet_end_to_end(tmp_path):
    runner = run_one_epoch(tmp_path, "AtlasNet")
    losses = runner.losses.avg()
    assert all(np.isfinite(l) for l in losses)
    # validation produced per-category metrics and a best checkpoint
    assert runner.category_metrics
    assert runner.best_metrics is not None
    ckpts = os.listdir(runner.config.DIR.checkpoints)
    assert any("ckpt" in c for c in ckpts)


def test_atlasnet_loss_decreases(tmp_path):
    cfg = tiny_cfg(tmp_path, "AtlasNet")
    cfg.TRAIN.n_epochs = 6
    logger = set_logger(None)
    runner = get_runner(cfg, gan=False)(cfg, logger)
    per_epoch = []
    orig_finish = runner.train_finish

    def capture():
        orig_finish()
        per_epoch.append(runner.losses.avg()[0])

    runner.train_finish = capture
    runner.runner()
    # training signal: best of the later epochs beats the first epoch
    assert min(per_epoch[2:]) < per_epoch[0]


def test_msn_end_to_end(tmp_path):
    runner = run_one_epoch(tmp_path, "MSN")
    assert all(np.isfinite(l) for l in runner.losses.avg())


def test_sparenet_end_to_end(tmp_path):
    runner = run_one_epoch(tmp_path, "SpareNet")
    assert all(np.isfinite(l) for l in runner.losses.avg())


def test_checkpoint_resume(tmp_path):
    runner = run_one_epoch(tmp_path, "AtlasNet")
    ckpt_dir = runner.config.DIR.checkpoints
    ckpts = sorted(os.listdir(ckpt_dir))
    path = os.path.join(ckpt_dir, ckpts[0])

    cfg = tiny_cfg(tmp_path / "resume", "AtlasNet")
    cfg.CONST.weights = path
    logger = set_logger(None)
    runner2 = get_runner(cfg, gan=False)(cfg, logger)
    assert runner2.init_epoch == 1
    # resumed params identical to saved
    import jax
    a = jax.tree_util.tree_leaves(runner.state.params)
    b = jax.tree_util.tree_leaves(runner2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
