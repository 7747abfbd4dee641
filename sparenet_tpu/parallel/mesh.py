"""SPMD data parallelism over a 1-D device mesh.

The reference replicates modules per GPU with torch.nn.DataParallel
(runners/base_runner.py:100-104) and even wraps the CD/EMD loss modules
(runners/sparenet_runner.py:30-34) so loss kernels run sharded. The
TPU-native equivalent: ONE jitted train step whose batch inputs carry a
``NamedSharding`` over the 'batch' mesh axis and whose parameters are
replicated — XLA inserts the gradient psum over ICI, and every op inside
the step (chamfer, EMD, MDS, the model) shards for free.

Multi-host extends the same mesh across processes via
``jax.distributed.initialize`` before calling ``get_mesh``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def maybe_init_distributed(cfg) -> bool:
    """Multi-host (DCN) bootstrap, gated on ``cfg.TPU.multihost``.

    Calls ``jax.distributed.initialize`` once per process so that
    ``jax.devices()`` returns the GLOBAL device set and the 1-D batch
    mesh below spans every host — gradients then psum over ICI within a
    slice and DCN across slices, with no further code changes (the
    jitted step is already SPMD). On TPU pod slices the coordinator /
    process count / process id auto-discover; for manual bootstrap set
    all three cfg.TPU fields. Returns True if initialization ran.

    The reference has no multi-node path at all (single-process
    torch.nn.DataParallel, SURVEY §2.7); this is the build's extension.
    """
    if not getattr(cfg.TPU, "multihost", False):
        return False
    kwargs = {}
    if cfg.TPU.coordinator_address:
        kwargs["coordinator_address"] = cfg.TPU.coordinator_address
    if cfg.TPU.num_processes:
        kwargs["num_processes"] = int(cfg.TPU.num_processes)
    if int(cfg.TPU.process_id) >= 0:
        kwargs["process_id"] = int(cfg.TPU.process_id)
    jax.distributed.initialize(**kwargs)
    return True


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D batch mesh over the first n_devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] host arrays batch-sharded on the mesh.
    Falls back to single-device placement when B doesn't divide the mesh
    (e.g. the reference's batch-size-1 validation loop)."""
    sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    n = mesh.devices.size
    n_proc = jax.process_count()

    def put(x):
        if n_proc > 1:
            # multi-host: x is this process's LOCAL slice of the global
            # batch (each process's loader feeds TRAIN.batch_size items);
            # assemble the global sharded array across DCN.
            if x.ndim >= 1 and (x.shape[0] * n_proc) % n == 0:
                return jax.make_array_from_process_local_data(sh, x)
            raise ValueError(
                f"multi-host batch of local size {x.shape[:1]} does not "
                f"tile the {n}-device mesh over {n_proc} processes; pick "
                "a per-process batch size divisible by the local device "
                "count")
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sh)
        # indivisible batch (e.g. the reference's batch-1 validation):
        # replicate — every device computes the same thing, results agree
        # with the single-device semantics.
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
