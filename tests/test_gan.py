"""SpareNet-GAN training step smoke tests (tiny scale, CPU)."""

import numpy as np
import pytest

from sparenet_tpu.runners import get_runner
from sparenet_tpu.utils.logging import set_logger
from tests.test_engine import tiny_cfg


@pytest.mark.parametrize("use_cgan", [False, True])
def test_gan_train_step(tmp_path, use_cgan):
    cfg = tiny_cfg(tmp_path / f"cgan_{use_cgan}", "SpareNet")
    cfg.RENDER.img_size = 64
    cfg.RENDER.radius_list = [2.0]
    cfg.GAN.use_cgan = use_cgan
    cfg.TRAIN.batch_size = 2
    cfg.DATASETS.synthetic.n_train = 4
    cfg.DATASETS.synthetic.n_val = 2
    cfg.TEST.batch_size = 2
    logger = set_logger(None)
    runner = get_runner(cfg, gan=True)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = 1e-4
    runner.reset_meters()
    for items in runner.train_loader:
        runner.train_step(items)
        break
    for k in ("coarse_loss", "refine_loss", "errG", "errG_D",
              "errD_real", "errD_fake"):
        assert np.isfinite(runner.loss[k]), (k, runner.loss)
    # discriminator spectral state advanced
    import jax
    assert int(jax.device_get(runner.state.step)) == 1


def test_gan_resume_exact(tmp_path):
    """Full-GAN checkpointing: save after one step, resume, and the NEXT
    step's losses reproduce bit-for-bit (generator + discriminator +
    both optimizers round-trip; the reference saves net_G only,
    utils/misc.py:80-109)."""
    import jax

    from sparenet_tpu.utils.metrics import Metrics

    def build(path):
        cfg = tiny_cfg(path, "SpareNet")
        cfg.RENDER.img_size = 64
        cfg.RENDER.radius_list = [2.0]
        cfg.TRAIN.batch_size = 2
        cfg.DATASETS.synthetic.n_train = 4
        cfg.DATASETS.synthetic.n_val = 2
        cfg.TEST.batch_size = 2
        return cfg

    cfg = build(tmp_path)
    logger = set_logger(None)
    runner = get_runner(cfg, gan=True)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = 1e-4
    runner.reset_meters()
    batches = list(runner.train_loader)[:2]
    runner.train_step(batches[0])

    runner.metrics = Metrics(
        "ChamferDistance", {"F-Score": 0.0, "ChamferDistance": 1.0,
                            "EMD": 1.0})
    runner.models_save()
    ckpt = [c for c in sorted(
        __import__("os").listdir(cfg.DIR.checkpoints)) if "ckpt" in c][0]
    ckpt_path = __import__("os").path.join(cfg.DIR.checkpoints, ckpt)
    saved_disc = jax.device_get(runner.disc_state.params)

    runner.train_step(batches[1])
    want = dict(runner.loss)

    cfg2 = build(tmp_path / "resume")
    cfg2.CONST.weights = ckpt_path
    runner2 = get_runner(cfg2, gan=True)(cfg2, logger)
    runner2.epoch_idx = 1
    runner2.lr = 1e-4
    runner2.reset_meters()
    # discriminator params restored exactly (not reinitialized)
    a = jax.tree_util.tree_leaves(saved_disc)
    b = jax.tree_util.tree_leaves(jax.device_get(runner2.disc_state.params))
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    runner2.train_step(batches[1])
    for k, v in want.items():
        assert runner2.loss[k] == v, (k, runner2.loss[k], v)


def test_gan_generator_gets_adversarial_gradient(tmp_path):
    """The generator update must differ from a pure-reconstruction update
    (i.e. gradients flow through renderer + discriminator)."""
    import jax

    cfg = tiny_cfg(tmp_path, "SpareNet")
    cfg.RENDER.img_size = 64
    cfg.RENDER.radius_list = [2.0]
    cfg.TRAIN.batch_size = 2
    cfg.DATASETS.synthetic.n_train = 4
    cfg.DATASETS.synthetic.n_val = 2
    logger = set_logger(None)
    runner = get_runner(cfg, gan=True)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = 1e-4
    runner.reset_meters()
    params_before = jax.device_get(runner.state.params)
    for items in runner.train_loader:
        runner.train_step(items)
        break
    params_after = jax.device_get(runner.state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), params_before, params_after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
