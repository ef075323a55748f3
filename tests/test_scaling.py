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
