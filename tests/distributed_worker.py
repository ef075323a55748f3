"""Worker for the multi-process distributed test (see test_distributed.py).

Each process contributes 4 virtual CPU devices to a global 8-device mesh and
runs one data-parallel sharded train step on the flagship model (tiny
shapes). Prints the loss so the parent can check cross-process agreement —
the single-host stand-in for a multi-host TPU pod slice (SURVEY.md §5.8).
"""

import os
import sys

# The worker runs as a bare subprocess; make the repo importable even when
# nerf_tpu isn't pip-installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )

    import dataclasses

    import jax.numpy as jnp

    from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
    from nerf_tpu.parallel import make_mesh, make_sharded_train_step, shard_train_state
    from nerf_tpu.train.trainer import init_train_state

    assert len(jax.devices()) == 4 * num_procs, (
        f"expected {4 * num_procs} global devices, got {len(jax.devices())}"
    )

    cfg = Config(
        model=ModelConfig(pos_freqs=2, dir_freqs=1, hidden_dim=16,
                          n_layers=2, skip_layer=1, color_hidden_dim=8),
        render=RenderConfig(n_coarse=4, n_fine=4),
        train=TrainConfig(n_rays=64, compute_dtype="float32"),
    )
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    state = shard_train_state(init_train_state(jax.random.PRNGKey(0), cfg), mesh)
    step = make_sharded_train_step(cfg, (16, 16), mesh, donate=False)

    key = jax.random.PRNGKey(1)
    image = jax.random.uniform(key, (16, 16, 3), jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    _, metrics = step(state, image, pose, jnp.float32(20.0), key)
    loss = float(metrics["loss"])
    print(f"WORKER {pid} LOSS {loss:.8f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
