"""Sharded-training tests on the 8-virtual-device CPU mesh (the TPU-world
analog of the reference's reduced-size test strategy, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from nerf_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    ray_sharding,
    shard_train_state,
    tp_param_shardings,
)
from nerf_tpu.train.trainer import init_train_state, make_train_step


def tiny_config():
    return Config(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          n_layers=4, skip_layer=2, color_hidden_dim=16),
        render=RenderConfig(n_coarse=8, n_fine=8),
        train=TrainConfig(n_rays=64, compute_dtype="float32"),
    )


@pytest.fixture(scope="module")
def sample():
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (24, 32, 3))
    pose = jnp.eye(4).at[2, 3].set(4.0)
    return image, pose


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "model")
    m2 = make_mesh(n_data=4, n_model=2)
    assert m2.devices.shape == (4, 2)


def test_dp_step_matches_single_device(sample):
    """Data-parallel sharded step produces the same result as the unsharded
    step — sharding is an execution detail, not a numerics change."""
    cfg = tiny_config()
    image, pose = sample
    key = jax.random.PRNGKey(1)

    state0 = init_train_state(jax.random.PRNGKey(2), cfg)
    plain_step = make_train_step(cfg, (24, 32), donate=False)
    s_plain, m_plain = plain_step(state0, image, pose, jnp.float32(30.0), key)

    mesh = make_mesh(n_data=8, n_model=1)
    state1 = shard_train_state(init_train_state(jax.random.PRNGKey(2), cfg), mesh)
    sharded_step = make_sharded_train_step(cfg, (24, 32), mesh, donate=False)
    s_shard, m_shard = sharded_step(state1, image, pose, jnp.float32(30.0), key)

    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_shard["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_plain.params["fine"]["trunk"][0]["w"]),
        np.asarray(s_shard.params["fine"]["trunk"][0]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_dp_tp_combined_step_runs(sample):
    """4-way data x 2-way tensor parallel: compiles, executes, finite loss,
    params actually sharded over the model axis."""
    cfg = tiny_config()
    image, pose = sample
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_train_state(
        init_train_state(jax.random.PRNGKey(3), cfg), mesh, tp=True
    )
    w_shard = state.params["fine"]["trunk"][1]["w"].sharding
    assert w_shard.spec == jax.sharding.PartitionSpec(None, "model")

    step = make_sharded_train_step(cfg, (24, 32), mesh, tp=True, donate=False)
    new_state, metrics = step(state, image, pose, jnp.float32(30.0),
                              jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    # TP layout preserved through the update
    assert new_state.params["fine"]["trunk"][1]["w"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "model")


def test_tp_matches_replicated_numerics(sample):
    cfg = tiny_config()
    image, pose = sample
    key = jax.random.PRNGKey(5)

    mesh1 = make_mesh(n_data=8, n_model=1)
    st_dp = shard_train_state(init_train_state(jax.random.PRNGKey(6), cfg), mesh1)
    dp = make_sharded_train_step(cfg, (24, 32), mesh1, donate=False)
    _, m_dp = dp(st_dp, image, pose, jnp.float32(30.0), key)

    mesh2 = make_mesh(n_data=2, n_model=4)
    st_tp = shard_train_state(
        init_train_state(jax.random.PRNGKey(6), cfg), mesh2, tp=True
    )
    tp = make_sharded_train_step(cfg, (24, 32), mesh2, tp=True, donate=False)
    _, m_tp = tp(st_tp, image, pose, jnp.float32(30.0), key)

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-4
    )


def test_sharded_render_chunk():
    """Rendering shards over rays with no code change: constrain the ray
    batch, same pipeline."""
    from nerf_tpu.render.pipeline import render_rays

    cfg = tiny_config()
    mesh = make_mesh()
    rs = ray_sharding(mesh)
    params = init_train_state(jax.random.PRNGKey(7), cfg).params

    @jax.jit
    def render(ro, rd):
        ro = jax.lax.with_sharding_constraint(ro, rs)
        rd = jax.lax.with_sharding_constraint(rd, rs)
        out = render_rays(params["coarse"], params["fine"], ro, rd,
                          cfg.model, cfg.render, perturb=False)
        return out.fine.rgb

    ro = jnp.zeros((128, 3))
    rd = jax.random.normal(jax.random.PRNGKey(8), (128, 3))
    rgb = render(ro, rd)
    assert rgb.shape == (128, 3)
    assert bool(jnp.all(jnp.isfinite(rgb)))


def test_tp_moments_sharded_like_params(sample):
    """Adam mu/nu must carry the SAME tensor-parallel sharding as their
    params (mapped via optax.tree_map_params, not reflection) — a
    replicated moment next to a sharded param silently multiplies optimizer
    memory by the model-axis size."""
    cfg = tiny_config()
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_train_state(
        init_train_state(jax.random.PRNGKey(3), cfg), mesh, tp=True
    )
    spec = jax.sharding.PartitionSpec(None, "model")
    assert state.params["fine"]["trunk"][1]["w"].sharding.spec == spec
    adam = [s for s in state.opt_state if hasattr(s, "mu")]
    assert adam, "expected a ScaleByAdamState in the chain"
    assert adam[0].mu["fine"]["trunk"][1]["w"].sharding.spec == spec
    assert adam[0].nu["fine"]["trunk"][1]["w"].sharding.spec == spec


def test_tp_weight_decay_matches_replicated(sample):
    """Several steps with non-trivial weight decay: TP and replicated DP
    must agree — exercises the add_decayed_weights + sharded-moment
    interaction (VERDICT r1 weak #5)."""
    import dataclasses

    from nerf_tpu.train.trainer import make_optimizer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, weight_decay=1e-2)
    )
    image, pose = sample
    optimizer = make_optimizer(cfg)

    mesh1 = make_mesh(n_data=8, n_model=1)
    st_dp = shard_train_state(init_train_state(jax.random.PRNGKey(6), cfg), mesh1)
    dp = make_sharded_train_step(cfg, (24, 32), mesh1, donate=False)

    mesh2 = make_mesh(n_data=2, n_model=4)
    st_tp = shard_train_state(
        init_train_state(jax.random.PRNGKey(6), cfg), mesh2, tp=True,
        optimizer=optimizer,
    )
    tp = make_sharded_train_step(cfg, (24, 32), mesh2, tp=True, donate=False)

    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        st_dp, m_dp = dp(st_dp, image, pose, jnp.float32(30.0), key)
        st_tp, m_tp = tp(st_tp, image, pose, jnp.float32(30.0), key)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st_dp.params["fine"]["trunk"][1]["w"]),
        np.asarray(st_tp.params["fine"]["trunk"][1]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_tp_state_checkpoint_roundtrip(sample, tmp_path):
    """A TP-sharded TrainState checkpoints and restores: save gathers to
    host, restore re-places on the mesh; numerics preserved."""
    from nerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = tiny_config()
    image, pose = sample
    mesh = make_mesh(n_data=2, n_model=4)
    state = shard_train_state(
        init_train_state(jax.random.PRNGKey(9), cfg), mesh, tp=True
    )
    step = make_sharded_train_step(cfg, (24, 32), mesh, tp=True, donate=False)
    state, _ = step(state, image, pose, jnp.float32(30.0), jax.random.PRNGKey(10))

    path = str(tmp_path / "tp_state.npz")
    save_checkpoint(path, jax.device_get(state), {"step": int(state.step)})
    template = init_train_state(jax.random.PRNGKey(11), cfg)
    restored, meta = restore_checkpoint(path, template)
    restored = shard_train_state(restored, mesh, tp=True)

    assert restored.params["fine"]["trunk"][1]["w"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "model")
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state.params["fine"]["trunk"][1]["w"])),
        np.asarray(jax.device_get(restored.params["fine"]["trunk"][1]["w"])),
        rtol=0, atol=0,
    )
    # and it keeps training
    state2, metrics = step(restored, image, pose, jnp.float32(30.0),
                           jax.random.PRNGKey(12))
    assert np.isfinite(float(metrics["loss"]))
