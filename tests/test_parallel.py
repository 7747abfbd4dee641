"""SPMD data parallelism over the virtual 8-device CPU mesh."""

import jax
import numpy as np

from sparenet_tpu.parallel import get_mesh, shard_batch, replicate
from sparenet_tpu.runners import get_runner
from sparenet_tpu.utils.logging import set_logger
from tests.test_engine import tiny_cfg


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout(rng):
    mesh = get_mesh()
    batch = {"x": rng.rand(16, 8, 3).astype(np.float32)}
    sharded = shard_batch(mesh, batch)
    x = sharded["x"]
    assert x.shape == (16, 8, 3)
    # 8-way batch sharding -> each device holds 2 rows
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 8, 3)


def test_shard_batch_indivisible_fallback(rng):
    mesh = get_mesh()
    batch = {"x": rng.rand(3, 4).astype(np.float32)}
    x = shard_batch(mesh, batch)["x"]
    assert len(x.addressable_shards) in (1, 8)  # single-device placement


def test_runner_trains_sharded(tmp_path):
    """Full runner epoch with batch 8 over the 8-device mesh: per-device
    shard = 1 sample; losses must match the reference semantics (global
    mean over the batch, psum'd by XLA)."""
    cfg = tiny_cfg(tmp_path, "AtlasNet")
    cfg.TRAIN.batch_size = 8
    cfg.DATASETS.synthetic.n_train = 16
    cfg.TPU.mesh_batch = 8
    logger = set_logger(None)
    runner = get_runner(cfg, gan=False)(cfg, logger)
    assert runner.mesh.devices.size == 8
    runner.runner()
    assert all(np.isfinite(l) for l in runner.losses.avg())
    # params ended up replicated across the mesh
    leaf = jax.tree_util.tree_leaves(runner.state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_step_matches_single_device(tmp_path):
    """Same data, same init: the 8-way sharded step must produce the same
    loss as the single-device step (SPMD is semantics-preserving)."""
    import jax.numpy as jnp
    from sparenet_tpu.models import AtlasNet
    from sparenet_tpu.runners.base import TrainState, apply_updates, make_optimizer
    from sparenet_tpu.configs import default_config
    from sparenet_tpu.ops.chamfer import chamfer_raw

    cfg = default_config()
    model = AtlasNet(num_points=64, bottleneck_size=32, n_primitives=4,
                     train=True)
    rs = np.random.RandomState(0)
    partial = rs.rand(8, 32, 3).astype(np.float32)
    gt = rs.rand(8, 64, 3).astype(np.float32)
    keys = {"params": jax.random.PRNGKey(0), "grid": jax.random.PRNGKey(1)}
    variables = model.init(keys, jnp.asarray(partial))

    def loss_fn(params, batch_stats, p, g):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, p,
            mutable=["batch_stats"], rngs={"grid": jax.random.PRNGKey(7)})
        d1, d2, _, _ = chamfer_raw(out, g)
        return jnp.mean(d1) + jnp.mean(d2)

    f = jax.jit(loss_fn)
    base = float(f(variables["params"], variables["batch_stats"],
                   jnp.asarray(partial), jnp.asarray(gt)))

    mesh = get_mesh()
    pv = replicate(mesh, variables)
    batch = shard_batch(mesh, {"p": partial, "g": gt})
    sharded = float(f(pv["params"], pv["batch_stats"],
                      batch["p"], batch["g"]))
    np.testing.assert_allclose(sharded, base, rtol=1e-5)
