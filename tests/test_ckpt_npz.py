"""bf16 npz checkpoint archive (utils/ckpt_npz.py): round-trip a nested
state tree; f32 leaves come back bf16-rounded, non-f32 leaves exact."""

import numpy as np

from sparenet_tpu.utils.ckpt_npz import export_npz, load_npz


def test_roundtrip(tmp_path, rng):
    state = {
        "params": {
            "enc": {"Conv_0": {"kernel": rng.randn(3, 8).astype(np.float32),
                               "bias": np.zeros(8, np.float32)}},
            "step": np.int32(7),
        },
        "batch_stats": {"bn": {"mean": rng.randn(8).astype(np.float32)}},
        "opt_state": {"ignored": np.ones(4, np.float32)},
    }
    path = str(tmp_path / "a.npz")
    n = export_npz(state, path)
    assert n == 4                      # opt_state excluded
    back = load_npz(path)
    assert sorted(back) == ["batch_stats", "params"]
    k = back["params"]["enc"]["Conv_0"]["kernel"]
    want = state["params"]["enc"]["Conv_0"]["kernel"]
    # bf16 rounding: exact in the upper 16 bits (truncation)
    np.testing.assert_array_equal(
        k.view(np.uint32) >> 16, want.view(np.uint32) >> 16)
    assert np.abs(k - want).max() <= np.abs(want).max() * 2 ** -7
    np.testing.assert_array_equal(back["params"]["step"],
                                  state["params"]["step"])
    np.testing.assert_array_equal(
        back["batch_stats"]["bn"]["mean"].view(np.uint32) >> 16,
        state["batch_stats"]["bn"]["mean"].view(np.uint32) >> 16)
