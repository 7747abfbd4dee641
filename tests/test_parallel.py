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


def test_maybe_init_distributed_gated():
    """multihost=False is a hard no-op; the knobs exist and merge."""
    from sparenet_tpu.configs import default_config
    from sparenet_tpu.parallel.mesh import maybe_init_distributed

    cfg = default_config()
    assert cfg.TPU.multihost is False
    assert maybe_init_distributed(cfg) is False
    # explicit-bootstrap fields are present for yaml override
    assert cfg.TPU.coordinator_address == ""
    assert cfg.TPU.num_processes == 0
    assert cfg.TPU.process_id == -1


def test_multihost_two_process_executes_dcn_path(tmp_path):
    """REAL 2-process coverage of the multi-host branch: both processes
    bootstrap via maybe_init_distributed (jax.distributed.initialize) on
    a local coordinator, build the global mesh, and drive shard_batch's
    make_array_from_process_local_data branch through a loss+grad step.
    Both processes must agree on the loss, and it must match the
    single-process value on the same global batch."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "_multihost_worker.py"),
             str(pid), str(port), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=root)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    results = [json.loads(out.strip().splitlines()[-1]) for out, _ in outs]
    assert {r["process_id"] for r in results} == {0, 1}
    for r in results:
        assert r["processes"] == 2 and r["devices"] == 8

    # single-process value on the same global batch (8-device local mesh)
    import jax
    import jax.numpy as jnp
    from sparenet_tpu.models import AtlasNet
    from sparenet_tpu.ops.chamfer import chamfer_raw

    model = AtlasNet(num_points=64, bottleneck_size=32, n_primitives=4,
                     train=True)
    rs = np.random.RandomState(0)
    partial = rs.rand(16, 32, 3).astype(np.float32)
    gt = rs.rand(16, 64, 3).astype(np.float32)
    keys = {"params": jax.random.PRNGKey(0), "grid": jax.random.PRNGKey(1)}
    variables = model.init(keys, jnp.asarray(partial[:8]))

    out, _ = model.apply(variables, jnp.asarray(partial),
                         mutable=["batch_stats"],
                         rngs={"grid": jax.random.PRNGKey(7)})
    d1, d2, _, _ = chamfer_raw(out, jnp.asarray(gt))
    expected = float(jnp.mean(d1) + jnp.mean(d2))

    for r in results:
        np.testing.assert_allclose(r["loss"], expected, rtol=1e-5)
        assert np.isfinite(r["gnorm"])
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-12


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


# ---------------------------------------------------------------------------
# point-axis (ring) sharding — parallel/pointwise.py


def _clouds(rng, b=4, n=64, m=96):
    import jax.numpy as jnp
    x1 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, m, 3), jnp.float32)
    return x1, x2


def test_ring_chamfer_matches_dense(rng):
    """sharded_chamfer over a ("batch","point") 2x4 mesh == chamfer_raw:
    indices exactly, distances to fusion-level ulps."""
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_chamfer
    from sparenet_tpu.ops.chamfer import chamfer_raw

    mesh = get_mesh2d(2, 4)
    x1, x2 = _clouds(rng)
    d1, d2, i1, i2 = jax.jit(lambda a, b: sharded_chamfer(mesh, a, b))(x1, x2)
    r1, r2, j1, j2 = chamfer_raw(x1, x2)
    assert bool(jnp.all(i1 == j1)) and bool(jnp.all(i2 == j2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-7)


def test_ring_chamfer_point_only_mesh(rng):
    """1x8 mesh (pure point parallelism) also matches."""
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_chamfer
    from sparenet_tpu.ops.chamfer import chamfer_raw

    mesh = get_mesh2d(1, 8)
    x1, x2 = _clouds(rng, b=2, n=128, m=128)
    d1, d2, i1, i2 = jax.jit(lambda a, b: sharded_chamfer(mesh, a, b))(x1, x2)
    r1, r2, j1, j2 = chamfer_raw(x1, x2)
    assert bool(jnp.all(i1 == j1)) and bool(jnp.all(i2 == j2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-7)


def test_ring_chamfer_grads_match_dense(rng):
    """The ring VJP (local grads + psum_scatter of the matched-point
    scatter) reproduces the dense chamfer VJP."""
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_chamfer
    from sparenet_tpu.ops.chamfer import chamfer_raw

    mesh = get_mesh2d(2, 4)
    x1, x2 = _clouds(rng)

    def loss_s(a, b):
        d1, d2, _, _ = sharded_chamfer(mesh, a, b)
        return jnp.mean(d1) + 0.5 * jnp.mean(d2)

    def loss_d(a, b):
        d1, d2, _, _ = chamfer_raw(a, b)
        return jnp.mean(d1) + 0.5 * jnp.mean(d2)

    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(x1, x2)
    gd = jax.grad(loss_d, argnums=(0, 1))(x1, x2)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]), atol=1e-6)


def test_ring_nn_search_matches_dense(rng):
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_nn_search
    from sparenet_tpu.ops.chamfer import nn_search

    mesh = get_mesh2d(2, 4)
    x1, x2 = _clouds(rng)
    sd, si = jax.jit(lambda a, b: sharded_nn_search(mesh, a, b))(x1, x2)
    rd, ri = nn_search(x1, x2)
    assert bool(jnp.all(si == ri))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(rd), atol=1e-7)


def test_ring_chamfer_tie_break_lowest_global_index():
    """Duplicate target points land in different point shards; the winner
    must be the LOWEST global index (dense argmin semantics)."""
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_chamfer
    from sparenet_tpu.ops.chamfer import chamfer_raw

    mesh = get_mesh2d(1, 8)
    b, n, m = 1, 8, 32
    x1 = jnp.zeros((b, n, 3), jnp.float32) + 0.25
    # every target point identical -> every query ties across all shards
    x2 = jnp.full((b, m, 3), 0.75, jnp.float32)
    _, _, i1, i2 = jax.jit(lambda a, c: sharded_chamfer(mesh, a, c))(x1, x2)
    r = chamfer_raw(x1, x2)
    assert bool(jnp.all(i1 == 0)) and bool(jnp.all(i1 == r[2]))
    assert bool(jnp.all(i2 == r[3]))


def test_ring_chamfer_32k_completion_eval(rng):
    """The >16k-point story end-to-end (SURVEY §5 point-axis extension)
    at a shape that actually NEEDS it: a 32768-point completion vs a
    32768-point gt — 2x the production output size, where the dense
    [N, M] distance matrix would be 4 GB/cloud. Ring chamfer on a 1x8
    point mesh must reproduce the (chunked) dense op: indices exactly,
    distances to ulps, on a real completion-eval call (both directions
    + the CD metric reduction)."""
    import jax.numpy as jnp
    from sparenet_tpu.parallel import get_mesh2d, sharded_chamfer
    from sparenet_tpu.ops.chamfer import chamfer_raw

    mesh = get_mesh2d(1, 8)
    n = 32768
    x1 = jnp.asarray(rng.rand(1, n, 3), jnp.float32)      # "completion"
    x2 = jnp.asarray(rng.rand(1, n, 3), jnp.float32)      # "gt"
    d1, d2, i1, i2 = jax.jit(lambda a, c: sharded_chamfer(mesh, a, c))(x1, x2)
    r1, r2, j1, j2 = chamfer_raw(x1, x2)
    assert bool(jnp.all(i1 == j1)) and bool(jnp.all(i2 == j2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-7)
    # the reported metric (mean d1 + mean d2, *1000) agrees too
    cd_ring = float((jnp.mean(d1) + jnp.mean(d2)) * 1000)
    cd_dense = float((jnp.mean(r1) + jnp.mean(r2)) * 1000)
    np.testing.assert_allclose(cd_ring, cd_dense, rtol=1e-6)
