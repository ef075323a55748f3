"""Scaling-report machinery on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from nerf_tpu.bench.scaling import scaling_report
from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from nerf_tpu.train.trainer import init_train_state


def test_scaling_report_runs_and_is_consistent():
    cfg = Config(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          n_layers=4, skip_layer=2, color_hidden_dim=16),
        render=RenderConfig(),
        train=TrainConfig(compute_dtype="float32"),
    )
    params = init_train_state(jax.random.PRNGKey(0), cfg).params["fine"]
    logs = []
    rows = scaling_report(
        params, cfg, resolution=(64, 48), spp=8, focal=50.0,
        device_counts=[1, 2, 8], n_frames=1, log=logs.append,
    )
    assert [r.n_devices for r in rows] == [1, 2, 8]
    assert all(r.rays_per_second > 0 for r in rows)
    assert rows[0].efficiency == 1.0
    assert len(logs) == 3


def test_sharded_render_frame_assembly_matches_single_device(tmp_path):
    """The native tile stitcher is the production image-assembly path for
    sharded renders: the frame assembled from 8 per-device shards must equal
    the 1-device render."""
    cfg = Config(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          n_layers=4, skip_layer=2, color_hidden_dim=16),
        render=RenderConfig(),
        train=TrainConfig(compute_dtype="float32"),
    )
    params = init_train_state(jax.random.PRNGKey(0), cfg).params["fine"]
    import os

    import jax.numpy as jnp

    from nerf_tpu.bench.scaling import assemble_frame, _make_sharded_render
    from nerf_tpu.models.nerf import apply_nerf
    from nerf_tpu.parallel.mesh import make_mesh
    from nerf_tpu.utils.cameras import generate_rays

    w, h = 32, 24
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    ro, rd = generate_rays(pose, w, h, 50.0)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    frames = {}
    for nd in (1, 8):
        mesh = make_mesh(n_data=nd, n_model=1, devices=jax.devices()[:nd])
        render = _make_sharded_render(params, cfg, mesh, 8, apply_nerf)
        rgb_g, depth_g = render(params, ro, rd)
        frames[nd] = assemble_frame(rgb_g, depth_g, w * h, (w, h))
    np.testing.assert_allclose(frames[1][0], frames[8][0], atol=1e-5)
    np.testing.assert_allclose(frames[1][1], frames[8][1], atol=1e-5)

    # and the CLI-facing path writes the PNG via the same stitcher
    rows = scaling_report(
        params, cfg, resolution=(w, h), spp=8, focal=50.0,
        device_counts=[8], n_frames=1, log=lambda m: None,
        frame_path=str(tmp_path / "frame.png"),
    )
    assert os.path.exists(tmp_path / "frame.png")
