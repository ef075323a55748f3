"""Checkpoint save/restore/auto-resume tests (reference analog:
``trainer.py:182-211`` resume logic, ``test_pytorch_only.py`` save/load)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import default_config
from nerf_tpu.train.checkpoint import (
    checkpoint_path,
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from nerf_tpu.train.trainer import init_train_state


def test_roundtrip_nested_pytree(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": [jnp.ones((4,)), {"c": jnp.zeros((2, 2), jnp.int32)}],
    }
    path = str(tmp_path / "t.npz")
    save_checkpoint(path, tree, {"epoch": 3, "note": "hi"})
    template = jax.tree.map(jnp.zeros_like, tree)
    restored, meta = restore_checkpoint(path, template)
    assert meta == {"epoch": 3, "note": "hi"}
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip_with_optax(tmp_path):
    cfg = default_config()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "s.npz")
    save_checkpoint(path, state, {"config": cfg.to_dict()})
    blank = init_train_state(jax.random.PRNGKey(1), cfg)
    restored, meta = restore_checkpoint(path, blank)
    np.testing.assert_array_equal(
        np.asarray(state.params["coarse"]["trunk"][0]["w"]),
        np.asarray(restored.params["coarse"]["trunk"][0]["w"]),
    )
    assert meta["config"]["train"]["learning_rate"] == cfg.train.learning_rate


def test_find_latest(tmp_path):
    d = str(tmp_path)
    assert find_latest_checkpoint(d) is None
    tree = {"x": jnp.zeros(1)}
    for epoch in (2, 25, 7):
        save_checkpoint(checkpoint_path(d, epoch), tree, {})
    latest = find_latest_checkpoint(d)
    assert latest is not None and latest.endswith("checkpoint_epoch_25.npz")


def test_missing_leaf_raises(tmp_path):
    path = str(tmp_path / "t.npz")
    save_checkpoint(path, {"a": jnp.zeros(2)}, {})
    with pytest.raises(KeyError):
        restore_checkpoint(path, {"a": jnp.zeros(2), "b": jnp.zeros(2)})
