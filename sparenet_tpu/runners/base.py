"""Base runner: lifecycle + epoch machinery around jitted SPMD steps.

Rebuild of runners/base_runner.py:23-355. Differences by design:
  - torch.nn.DataParallel (base_runner.py:100-104) -> one jitted
    train/val step over a 1-D batch mesh (sparenet_tpu.parallel).
  - mutable module state -> an explicit TrainState pytree (params,
    batch_stats, spectral, optimizer moments, PRNG key) that the jitted
    step maps to a new TrainState; donate_argnums recycles the buffers.
  - MultiStepLR (utils/model_init.py:37) -> per-epoch lr scalar fed into
    the step (identical schedule semantics).
  - checkpoints carry the FULL state via orbax (utils/checkpoint.py).
"""

from __future__ import annotations

import os
from copy import deepcopy
from time import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax import struct

from ..configs import AttrDict
from ..data import data_init
from ..parallel import get_mesh, shard_batch, replicate
from ..parallel.mesh import maybe_init_distributed
from ..utils import checkpoint as ckpt
from ..utils import visualizer as uv
from ..utils.logging import writer_init
from ..utils.metrics import Metrics, compute_all
from ..data.io import IO
from .misc import AverageMeter


class TrainState(struct.PyTreeNode):
    """Generator training state (one optimizer, reference
    utils/model_init.py:31-37)."""

    params: dict
    batch_stats: dict
    opt_state: object
    rng: jax.Array
    step: jax.Array


def make_optimizer(cfg):
    """Adam(betas=(0, 0.9), eps 1e-8) + optional decoupled-from-lr weight
    decay; the final -lr scaling is applied in the step so MultiStepLR
    reduces to feeding a per-epoch lr scalar."""
    b1, b2 = cfg.TRAIN.betas
    chain = []
    if cfg.TRAIN.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.TRAIN.weight_decay))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
    return optax.chain(*chain)


def lr_for_epoch(cfg, epoch_idx: int) -> float:
    """MultiStepLR(milestones, gamma) parity."""
    lr = cfg.TRAIN.learning_rate
    for m in cfg.TRAIN.lr_milestones:
        if epoch_idx > m:
            lr *= cfg.TRAIN.gamma
    return lr


def apply_updates(tx, grads, opt_state, params, lr):
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, params, updates
    )
    return new_params, new_opt_state


class BaseRunner:
    """Training/eval lifecycle (runners/base_runner.py:23-355)."""

    def __init__(self, config: AttrDict, logger):
        self._name = self.__class__.__name__
        self.config = deepcopy(config)
        self.logger = logger
        self.work_dir = self.config.DIR.out_path
        os.makedirs(self.work_dir, exist_ok=True)
        os.makedirs(self.config.DIR.checkpoints, exist_ok=True)
        with open(os.path.join(self.work_dir, "config.yaml"), "w") as f:
            f.write(yaml.dump(dict(self.config)))

        if maybe_init_distributed(self.config):
            self.logger.info(
                "Multi-host: process %d/%d, %d global devices"
                % (jax.process_index(), jax.process_count(),
                   len(jax.devices())))
        self.mesh = get_mesh(self.config.TPU.mesh_batch or None)
        self.logger.info(f"Mesh: {self.mesh}")

        self.init_epoch = 0
        self.best_metrics = None
        self.epoch_idx = 0
        self.metrics = None
        self.ptcloud = None
        self.loss = {}
        self.train_time = AverageMeter()
        self.val_time = AverageMeter()

        self.build_writer()
        self.build_dataset()
        self.build_models()
        self.models_load()

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def build_writer(self):
        self.train_writer, self.val_writer = writer_init(self.config)

    def build_dataset(self):
        self.train_loader, self.val_loader = data_init(self.config)
        self.logger.info("Finish building dataset.")

    def build_models(self):
        raise NotImplementedError

    def models_load(self):
        self.init_epoch, self.best_metrics, self.state = ckpt.checkpoint_load(
            self.config, self.state, self.logger
        )
        self._maybe_autocalibrate_mml()

    def _maybe_autocalibrate_mml(self):
        """Serving-mode mml self-calibration (utils/calibration.py).

        When FAST_MATH serving is active and trained weights were
        loaded, fit the NN-mean -> Prim's-mml ratio on the model's OWN
        coarse output (first val batch) and clone the eval model with
        it — the fitted ratio replaces the family default BEFORE the
        first _jit_val trace, so there is no recompile. A manual
        NETWORK.mml_calibration (> 0) or TEST.mml_auto_calibrate=False
        opts out. No-op for families without the knob (AtlasNet/GRNet)
        and in parity mode (exact Prim's runs inline there)."""
        from ..ops import common as opc
        from ..utils.calibration import fit_mml_ratio

        cfg = self.config
        model = getattr(self, "model_eval", None)
        if (model is None or not hasattr(model, "mml_calibration")
                or not opc.FAST_MATH
                or not cfg.CONST.weights
                or cfg.NETWORK.mml_calibration > 0
                or not cfg.TEST.mml_auto_calibrate):
            return
        items = next(iter(self.val_loader))
        partial = jnp.asarray(np.asarray(items[3]["partial_cloud"]),
                              jnp.float32)
        rng_names = getattr(self, "model_rng_names", ())
        rngs = dict(zip(rng_names,
                        jax.random.split(jax.random.PRNGKey(0),
                                         max(1, len(rng_names)))))
        prim_size = model.num_points // model.n_primitives

        @jax.jit
        def fit(params, batch_stats, partial):
            coarse = model.apply(
                {"params": params, "batch_stats": batch_stats}, partial,
                rngs=rngs or None)[0]
            return fit_mml_ratio(coarse, prim_size)

        ratio = float(fit(self.state.params, self.state.batch_stats,
                          partial))
        if cfg.TPU.multihost and jax.process_count() > 1:
            # every host must bake the SAME constant into its jitted
            # eval step (divergent compiled programs across hosts are
            # undefined behavior if the step carries collectives):
            # mean the per-host fits
            from jax.experimental import multihost_utils
            ratio = float(multihost_utils.process_allgather(
                jnp.float32(ratio)).mean())
        # a degenerate checkpoint (collapsed coarse -> ratio ~ 0, or
        # non-finite activations -> NaN) would zero/NaN the MDS
        # temperature t = 5*mml^2 and silently poison serving output;
        # measured fits span ~1.1 (converged SpareNet) to ~5.7 (MSN),
        # so [0.05, 50] is a generous plausibility band
        if not np.isfinite(ratio) or not (0.05 <= ratio <= 50.0):
            self.logger.warning(
                "Auto-calibrated mml ratio %r is outside the plausible "
                "band [0.05, 50] — keeping the family default %.2f. "
                "(Degenerate checkpoint? Set NETWORK.mml_calibration "
                "to override explicitly.)" % (ratio, model.mml_calibration))
            return
        self.model_eval = model.clone(mml_calibration=ratio)
        self.logger.info(
            "Auto-calibrated serving mml ratio on the first val batch: "
            "%.4f (family default was %.2f)."
            % (ratio, model.mml_calibration))

    def models_save(self):
        self.best_metrics = ckpt.checkpoint_save(
            self.config, self.epoch_idx, self.metrics, self.best_metrics,
            jax.device_get(self.state), self.logger,
        )

    # ------------------------------------------------------------------
    # steps (implemented by subclasses)
    # ------------------------------------------------------------------

    def train_step(self, items):
        raise NotImplementedError

    def val_step(self, items):
        raise NotImplementedError

    # reference API parity: loss modules need no rebuilding under SPMD
    def build_train_loss(self):
        pass

    def build_val_loss(self):
        pass

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def _put_batch(self, data):
        return shard_batch(self.mesh, data)

    def check_finite(self):
        """Fail-fast failure detection: a non-finite loss aborts the run
        with actionable context (the last good checkpoint resumes it)."""
        bad = [k for k, v in self.loss.items() if not np.isfinite(v)]
        if bad:
            raise FloatingPointError(
                f"non-finite training loss {bad} at epoch {self.epoch_idx} "
                f"batch {self.batch_idx}; resume from the last checkpoint in "
                f"{self.config.DIR.checkpoints} with a lower learning rate"
            )

    def save_item_train_info(self):
        self.check_finite()
        n_itr = (self.epoch_idx - 1) * self.n_batches + self.batch_idx
        if self.batch_idx % self.config.TRAIN.log_freq == 0:
            for k, v in self.loss.items():
                self.train_writer.add_scalar("Loss/Batch/" + k, float(v), n_itr)
            self.logger.info(
                "[Epoch %d/%d][Batch %d/%d] BatchTime = %.3f (s) Losses = %s"
                % (self.epoch_idx, self.config.TRAIN.n_epochs,
                   self.batch_idx + 1, self.n_batches,
                   self.train_time.val(),
                   ["%.4f" % l for l in self.losses.val()])
            )

    def train(self):
        self.logger.info("Start training.")
        self.epoch_start_time = time()
        self.n_batches = len(self.train_loader)
        for self.batch_idx, items in enumerate(self.train_loader):
            t0 = time()
            self.train_step(items)
            self.train_time.update(time() - t0)
            self.save_item_train_info()
        self.train_finish()

    def train_finish(self):
        self.epoch_end_time = time()
        for i, name in enumerate(self.losses.items):
            self.train_writer.add_scalar(
                "Loss/Epoch/" + name, self.losses.avg(i), self.epoch_idx
            )
        self.logger.info(
            "[Epoch %d/%d] EpochTime = %.3f (s) Losses = %s"
            % (self.epoch_idx, self.config.TRAIN.n_epochs,
               self.epoch_end_time - self.epoch_start_time,
               ["%.4f" % l for l in self.losses.avg()])
        )

    def val(self):
        self.category_metrics = {}
        self.logger.info("Start validating.")
        self.n_batches = len(self.val_loader)
        for self.model_idx, items in enumerate(self.val_loader):
            taxonomy_ids, labels, model_ids, data = items
            self.taxonomy_id = taxonomy_ids[0]
            self.model_id = model_ids[0]
            t0 = time()
            per_sample = self.val_step(items)
            self.val_time.update(time() - t0)
            self._accumulate_val(taxonomy_ids, per_sample)
            if self.model_idx % self.config.TRAIN.log_freq == 0:
                self.logger.info(
                    "Test[%d/%d] Taxonomy = %s Sample = %s Losses = %s Metrics = %s"
                    % (self.model_idx + 1, self.n_batches, self.taxonomy_id,
                       self.model_id,
                       ["%.4f" % l for l in self.test_losses.val()],
                       ["%.4f" % m for m in self.metrics])
                )
            self.inference(data)
        self.metrics = Metrics(self.config.TEST.metric_name,
                               self.test_metrics.avg())
        self.val_finish()

    def _accumulate_val(self, taxonomy_ids, per_sample):
        """per_sample: numpy [3, B] metric values."""
        for j, tid in enumerate(taxonomy_ids):
            vals = [float(per_sample[i, j]) for i in range(per_sample.shape[0])]
            self.test_metrics.update(vals)
            if tid not in self.category_metrics:
                self.category_metrics[tid] = AverageMeter(Metrics.names())
            self.category_metrics[tid].update(vals)
        self.metrics = [
            self.test_metrics.val(i) for i in range(len(Metrics.names()))
        ]

    def val_finish(self):
        uv.print_table(self.config, self.epoch_idx, self.test_metrics,
                       self.category_metrics, self.val_writer,
                       self.test_losses)
        self.models_save()

    def inference(self, data):
        """Side outputs per cfg.TEST.mode (runners/base_runner.py:256-327)."""
        cfg = self.config
        if self.model_idx % cfg.TEST.infer_freq != 0 or self.ptcloud is None:
            return
        if cfg.TEST.mode == "default":
            if "gtcloud" in data:
                uv.tensorboard_save_image(
                    self.ptcloud, data, self.val_writer, self.model_idx,
                    self.epoch_idx)
        elif cfg.TEST.mode == "vis":
            plot_dir = os.path.join(cfg.DIR.logs, "plots", str(self.taxonomy_id))
            os.makedirs(plot_dir, exist_ok=True)
            plot_path = os.path.join(plot_dir, "%s.png" % self.model_idx)
            clouds = [np.asarray(data["partial_cloud"])[0],
                      np.asarray(self.ptcloud)[0]]
            titles = ["input", "output"]
            if "gtcloud" in data:
                clouds.append(np.asarray(data["gtcloud"])[0])
                titles.append("ground truth")
            uv.plot_pcd_three_views(
                plot_path, clouds, titles,
                "CD %.4f  EMD %.4f F-score %.4f"
                % (self.metrics[1], self.metrics[2], self.metrics[0]),
                [5] + [0.5] * (len(clouds) - 1),
            )
        elif cfg.TEST.mode == "render":
            uv.save_depth_map(cfg, self.ptcloud, data, self.taxonomy_id,
                              self.model_idx)
        elif cfg.TEST.mode == "kitti":
            out_dir = os.path.join(cfg.DIR.out_path, "benchmark",
                                   str(self.taxonomy_id))
            os.makedirs(out_dir, exist_ok=True)
            out_path = os.path.join(out_dir, "%s.h5" % self.model_idx)
            IO.put(out_path, np.asarray(self.ptcloud)[0])
            self.logger.info(
                "Test[%d/%d] Taxonomy = %s Sample = %s File = %s"
                % (self.model_idx + 1, self.n_batches, self.taxonomy_id,
                   self.model_idx, out_path)
            )

    def runner(self):
        """Epoch loop (runners/base_runner.py:329-342)."""
        start = time()
        for epoch_idx in range(self.init_epoch + 1,
                               self.config.TRAIN.n_epochs + 1):
            self.epoch_idx = epoch_idx
            self.lr = lr_for_epoch(self.config, epoch_idx)
            self.reset_meters()
            self.build_train_loss()
            self.train()
            self.build_val_loss()
            self.val()
        self.logger.info("runner time: %3f" % (time() - start))
        self.train_writer.close()
        self.val_writer.close()

    def test(self):
        """Standalone eval (runners/base_runner.py:344-355)."""
        assert self.init_epoch != 0, "test requires a loaded checkpoint"
        self.build_val_loss()
        start = time()
        self.epoch_idx = -1
        self.reset_meters()
        self.val()
        self.logger.info("test time: %3f" % (time() - start))
        self.train_writer.close()
        self.val_writer.close()

    def reset_meters(self):
        raise NotImplementedError
