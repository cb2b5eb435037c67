"""--resume_adapter: partial, non-strict parameter preload
(oracle: reference inference.py:447-451 load_state_dict(strict=False))."""

import numpy as np

import jax.numpy as jnp

from flashvtg_tpu.train.loop import merge_partial_params


def test_merge_partial_params_matching_and_mismatched():
    params = {
        "params": {
            "a": jnp.zeros((2, 2)),
            "b": {"w": jnp.zeros((3,)), "extra": jnp.zeros((4,))},
        }
    }
    loaded = {
        "params": {
            "a": np.ones((2, 2), np.float32),       # path+shape match -> copied
            "b": {"w": np.ones((5,), np.float32)},  # shape mismatch -> kept
            "unknown": np.ones((7,), np.float32),   # path absent in dst -> dropped
        }
    }
    merged = merge_partial_params(params, loaded)
    np.testing.assert_array_equal(np.asarray(merged["params"]["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["params"]["b"]["w"]), 0.0)
    np.testing.assert_array_equal(np.asarray(merged["params"]["b"]["extra"]), 0.0)
    assert "unknown" not in merged["params"]


def test_adapter_roundtrip_orbax(tmp_path):
    from flashvtg_tpu.train.loop import load_checkpoint, save_checkpoint
    from flashvtg_tpu.train.config import ExperimentConfig

    src = {"params": {"lin": {"kernel": jnp.full((2, 3), 5.0)}}}
    path = str(tmp_path / "ckpt" / "model_latest")
    save_checkpoint(path, src, {"count": np.asarray(0)}, 3, ExperimentConfig())

    loaded = load_checkpoint(path)["params"]
    dst = {"params": {"lin": {"kernel": jnp.zeros((2, 3))},
                      "other": jnp.zeros((4,))}}
    merged = merge_partial_params(dst, loaded)
    np.testing.assert_array_equal(np.asarray(merged["params"]["lin"]["kernel"]), 5.0)
    np.testing.assert_array_equal(np.asarray(merged["params"]["other"]), 0.0)
