"""Device meshes and sharding specs.

The reference has no parallelism of any kind (SURVEY.md §2.2: single process,
single device, one model replica). The TPU-native scaling story replaces the
reference's per-device backend forks:

- **data axis** (the big one): rays are embarrassingly parallel at render
  time and a train step's ray batch shards cleanly — each chip renders its
  ray shard, gradients are all-reduced over ICI (XLA inserts the psum from
  the sharding annotations; overlapped with backward).
- **model axis** (tensor parallel): the MLP's 256-wide hidden dim shards
  across chips; XLA inserts the boundary collectives. At this model size TP
  is for demonstration/testing (SURVEY.md §2.2 "likely unneeded at 256") but
  the machinery is real and composes with data parallelism.
- pipeline/expert parallelism: N/A for a 2-network 256-wide NeRF (SURVEY.md
  §2.2); the sample axis stays on-chip (§5.7) — the compositing scan is the
  sequential dimension inside a kernel, not a cross-chip axis.

Multi-host: ``jax.distributed.initialize()`` then the same ``make_mesh`` over
``jax.devices()`` spans hosts; ray shards ride ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh. Default: every available device on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0, (
            f"{len(devices)} devices not divisible by model={n_model}"
        )
        n_data = len(devices) // n_model
    need = n_data * n_model
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis over the data axis; everything trailing
    stays on-chip."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel sharding specs for a NeRF params pytree: trunk weight
    matrices shard their output (hidden) dim over 'model'; biases follow;
    head layers contract over the sharded dim (XLA inserts the reduction).

    Works for single nets and the {'coarse','fine'} dict (any pytree whose
    weight leaves are named 'w'/'b' dicts).
    """

    def spec_for(path, leaf):
        names = [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]
        if "trunk" in names or "bottleneck" in names:
            if names[-1] == "w":
                return NamedSharding(mesh, P(None, "model"))
            if names[-1] == "b":
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())  # heads replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)
