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


def test_resume_skips_corrupt_checkpoint(tmp_path):
    """A truncated newest checkpoint must not kill resume — fall back to the
    previous good one."""
    import dataclasses

    from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
    from nerf_tpu.train.trainer import NeRFTrainer

    cfg = Config(
        model=ModelConfig(pos_freqs=2, dir_freqs=1, hidden_dim=16,
                          n_layers=2, skip_layer=1, color_hidden_dim=8),
        render=RenderConfig(n_coarse=4, n_fine=4),
        train=TrainConfig(n_rays=16, compute_dtype="float32"),
        checkpoint_dir=str(tmp_path),
    )
    t = NeRFTrainer(cfg, (8, 8))
    t.train_losses = [0.5, 0.4]
    good = t.save_checkpoint("checkpoint_epoch_2.npz")
    # newer but corrupt
    bad = tmp_path / "checkpoint_epoch_5.npz"
    bad.write_bytes(b"this is not an npz file")

    t2 = NeRFTrainer(cfg, (8, 8))
    resumed = t2.try_resume()
    assert resumed == good
    assert t2.train_losses == [0.5, 0.4]


def test_resume_all_corrupt_returns_none(tmp_path):
    import dataclasses

    from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
    from nerf_tpu.train.trainer import NeRFTrainer

    cfg = Config(
        model=ModelConfig(pos_freqs=2, dir_freqs=1, hidden_dim=16,
                          n_layers=2, skip_layer=1, color_hidden_dim=8),
        render=RenderConfig(n_coarse=4, n_fine=4),
        train=TrainConfig(n_rays=16, compute_dtype="float32"),
        checkpoint_dir=str(tmp_path),
    )
    (tmp_path / "checkpoint_epoch_1.npz").write_bytes(b"junk")
    t = NeRFTrainer(cfg, (8, 8))
    assert t.try_resume() is None


def test_bare_params_archive_loads_through_shared_model(tmp_path):
    """A params-only npz keyed by jax.tree_util.keystr paths (the format
    evaluation scripts dump, e.g. results/convergence/final_params.npz)
    loads through SharedModel without a __meta__ header or optimizer
    state."""
    from nerf_tpu.models.nerf import init_nerf_params
    from nerf_tpu.render.engines import SharedModel

    cfg = default_config()
    kc, kf = jax.random.split(jax.random.PRNGKey(7))
    params = {
        "coarse": init_nerf_params(kc, cfg.model),
        "fine": init_nerf_params(kf, cfg.model),
    }
    flat = {
        jax.tree_util.keystr(p): np.asarray(leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    path = str(tmp_path / "bare.npz")
    np.savez(path, **flat)

    shared = SharedModel(cfg).load(path)
    got = jax.tree_util.tree_leaves(shared.params)
    want = jax.tree_util.tree_leaves(params)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
