"""Compact checkpoint archive: orbax state -> one bf16 .npz in git.

The build environment's /tmp is wiped when the machine recycles between
rounds; orbax checkpoint trees living there were lost after round 4.
This module exports the inference-relevant state (params + batch_stats)
as a single compressed npz with path-string keys — flagship SpareNet is
~25-50 MB at bf16, small enough to commit under docs/artifacts/ — and
restores it into the {"params", "batch_stats"} variables dict the eval
models consume. bf16 storage costs ~3 decimal digits of weight
precision; metrics move at the serving-mode bf16-chain level, so
archived checkpoints are for cross-round quality tracking, not bitwise
resume (orbax remains the training-resume format: runners/base.py).

CLI:
  python -m sparenet_tpu.utils.ckpt_npz export <orbax-ckpt-dir> <out.npz>
  python -m sparenet_tpu.utils.ckpt_npz info <archive.npz>
"""

from __future__ import annotations

import sys

import numpy as np

_SEP = "//"


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{_SEP}{k}" if prefix else k, out)
    else:
        out[prefix] = np.asarray(tree)


def export_npz(state: dict, path: str) -> int:
    """Write {"params", "batch_stats"} (or a full runner state dict
    containing them) to `path`; returns the number of leaves. f32
    leaves are stored bf16-via-u16 (upper half of the f32 bits);
    everything else verbatim."""
    flat: dict = {}
    for part in ("params", "batch_stats"):
        if part in state:
            _flatten(state[part], part, flat)
    payload = {}
    for k, v in flat.items():
        if v.dtype == np.float32:
            payload["bf16:" + k] = (
                v.view(np.uint32) >> np.uint32(16)).astype(np.uint16)
        else:
            payload["raw:" + k] = v
    np.savez_compressed(path, **payload)
    return len(payload)


def load_npz(path: str) -> dict:
    """Restore an archive into {"params": ..., "batch_stats": ...}
    (f32 leaves, host numpy). Feed through jax.device_put before use."""
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        tag, rest = key.split(":", 1)
        leaf = data[key]
        if tag == "bf16":
            leaf = (leaf.astype(np.uint32) << np.uint32(16)).view(
                np.float32)
        node = root
        parts = rest.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def _main():
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    cmd = sys.argv[1]
    if cmd == "export":
        import orbax.checkpoint as ocp
        import os
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(sys.argv[2]))
        state = payload.get("state", payload)
        n = export_npz(state, sys.argv[3])
        sz = os.path.getsize(sys.argv[3]) / 1e6
        print(f"wrote {sys.argv[3]}: {n} leaves, {sz:.1f} MB")
    elif cmd == "info":
        tree = load_npz(sys.argv[2])
        n = sum(leaf.size for part in tree.values()
                for leaf in _iter_leaves(part))
        print(f"{sys.argv[2]}: parts {sorted(tree)}, {n/1e6:.2f} M params")
    else:
        raise SystemExit(f"unknown command {cmd!r}")


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    _main()
