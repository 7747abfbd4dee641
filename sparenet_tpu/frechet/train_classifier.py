"""Train a PointNet classifier to back the FPD metric.

The reference FPD depends on a pretrained checkpoint missing from its
repo (Frechet/cls_model_39.pth, .MISSING_LARGE_BLOBS). This module
trains an equivalent k-way classifier on ground-truth clouds from any of
the framework's datasets so FPD is usable end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .pointnet import PointNetCls


def train_classifier(dataset, num_classes: int = 16, n_points: int = 1024,
                     epochs: int = 10, batch_size: int = 32,
                     lr: float = 1e-3, seed: int = 0, logger=None):
    """dataset: indexable of (taxonomy_id, label, model_id, data) items
    with data['gtcloud']; returns trained variables for PointNetCls."""
    model = PointNetCls(k=num_classes, train=True)
    model_eval = PointNetCls(k=num_classes, train=False)
    rng = jax.random.PRNGKey(seed)
    sample = jnp.zeros((2, n_points, 3), jnp.float32)
    variables = model.init({"params": rng}, sample)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, pc, labels):
        def loss_fn(p):
            (logits, trans, _), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, pc,
                mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            # orthogonality regularizer on the STN transform
            eye = jnp.eye(3)
            reg = jnp.mean(jnp.sum(
                (jnp.einsum("bij,bkj->bik", trans, trans) - eye) ** 2,
                axis=(1, 2)))
            return ce + 1e-3 * reg, (upd["batch_stats"], logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return params, new_bs, opt_state, loss, acc

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n = len(dataset)
    rs = np.random.RandomState(seed)
    for epoch in range(epochs):
        order = rs.permutation(n)
        tot_loss = tot_acc = nb = 0
        for s in range(0, n - batch_size + 1, batch_size):
            idxs = order[s:s + batch_size]
            pcs, labels = [], []
            for i in idxs:
                _, label, _, data = dataset[int(i)]
                gt = data["gtcloud"]
                sel = rs.permutation(gt.shape[0])[:n_points]
                pcs.append(gt[sel])
                labels.append(label)
            pc = jnp.asarray(np.stack(pcs), jnp.float32)
            labels = jnp.asarray(labels, jnp.int32)
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state, pc, labels)
            tot_loss += float(loss)
            tot_acc += float(acc)
            nb += 1
        if logger:
            logger.info("FPD classifier epoch %d: loss=%.4f acc=%.3f"
                        % (epoch, tot_loss / max(nb, 1), tot_acc / max(nb, 1)))
    return {"params": params, "batch_stats": batch_stats}
