"""Training tests: jitted step mechanics, loss descent on the procedural
scene, resume (reference analog: ``test_integration.py`` reduced-size 2-epoch
run + ``test_pytorch_only.py``)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from nerf_tpu.data.synthetic import make_procedural_dataset
from nerf_tpu.train.trainer import (
    NeRFTrainer,
    init_train_state,
    make_eval_render,
    make_train_step,
)


def tiny_config(**train_kw) -> Config:
    """Reduced-size config, the reference's fast-fixture pattern
    (``test_integration.py:60-69``)."""
    return Config(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          n_layers=4, skip_layer=2, color_hidden_dim=16),
        render=RenderConfig(n_coarse=12, n_fine=16),
        train=TrainConfig(n_rays=128, compute_dtype="float32",
                          learning_rate=5e-3, **train_kw),
    )


@pytest.fixture(scope="module")
def ds():
    return make_procedural_dataset(n_views=4, img_wh=(48, 48))


def test_single_step_updates_params_and_metrics(ds):
    cfg = tiny_config()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, (48, 48), donate=False)
    item = ds[0]
    new_state, metrics = step(
        state, jnp.asarray(item["image"]), jnp.asarray(item["pose"]),
        jnp.float32(ds.focal), jax.random.PRNGKey(1),
    )
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_coarse"]) > 0 and float(metrics["loss_fine"]) > 0
    before = np.asarray(state.params["fine"]["trunk"][0]["w"])
    after = np.asarray(new_state.params["fine"]["trunk"][0]["w"])
    assert np.max(np.abs(after - before)) > 0


def test_loss_decreases_on_procedural_scene(ds):
    cfg = tiny_config()
    trainer = NeRFTrainer(cfg, (48, 48))
    first = trainer.train_epoch(ds)
    for _ in range(14):
        last = trainer.train_epoch(ds)
    assert last < first * 0.7, f"no learning: first={first:.4f} last={last:.4f}"


def test_trainer_loop_with_validation_and_plot(ds, tmp_path):
    cfg = dataclasses.replace(
        tiny_config(checkpoint_frequency=2, val_frequency=2, n_epochs=2),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
    )
    trainer = NeRFTrainer(cfg, (48, 48))
    logs = []
    trainer.train(ds, val_ds=ds, n_epochs=2, log_fn=logs.append)
    assert len(trainer.train_losses) == 2
    assert len(trainer.val_losses) == 1
    assert (tmp_path / "ckpt" / "checkpoint_epoch_2.npz").exists()
    plot = trainer.plot_losses()
    assert plot is not None

    # resume: a fresh trainer picks up at epoch 2 and continues to 3
    trainer2 = NeRFTrainer(cfg, (48, 48))
    logs2 = []
    trainer2.train(ds, n_epochs=3, log_fn=logs2.append)
    assert any("resumed" in l for l in logs2)
    assert len(trainer2.train_losses) == 3


def test_eval_render_pads_non_divisible_shapes(ds):
    cfg = tiny_config()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    render = make_eval_render(cfg, n_rays_chunk=1000)  # 48*48=2304 -> pad
    rgb, depth = render(state.params, ds[0]["pose"], (48, 48), float(ds.focal))
    assert rgb.shape == (48, 48, 3)
    assert depth.shape == (48, 48)
    assert bool(jnp.all(jnp.isfinite(rgb)))


def test_lr_schedule_matches_reference_formula():
    """lr(t) = lr0 * decay^(t / decay_steps) — the reference's per-step
    ExponentialLR with gamma=decay^(1/decay_steps) (``trainer.py:62-64``)."""
    import optax

    cfg = tiny_config()
    sched = optax.exponential_decay(
        cfg.train.learning_rate, cfg.train.lr_decay_steps, cfg.train.lr_decay
    )
    for t in (0, 1000, 250_000):
        expected = cfg.train.learning_rate * cfg.train.lr_decay ** (
            t / cfg.train.lr_decay_steps
        )
        np.testing.assert_allclose(float(sched(t)), expected, rtol=1e-5)


def test_streaming_training_with_native_sampler(ds):
    """Train from the C++ background ray producer; loss must descend."""
    cfg = tiny_config()
    trainer = NeRFTrainer(cfg, (48, 48))
    logs = []
    first = trainer.train_streaming(ds, n_steps=20, log_every=10,
                                    log_fn=logs.append)
    last = trainer.train_streaming(ds, n_steps=180, log_every=90,
                                   log_fn=logs.append)
    assert last < first, f"no descent: {first} -> {last}"
    assert len(logs) == 4
