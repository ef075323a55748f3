"""Sharded training: the single-chip jitted step, pjit-ed over a Mesh.

The full step (ray selection, hierarchical render, both MLPs, loss, backward,
optimizer) runs with:
- the ray batch sharded over the mesh's ``data`` axis (constraint inside the
  step; XLA derives the gradient psum over ICI and overlaps it with the
  backward pass),
- params/optimizer state replicated, or tensor-parallel over ``model``
  (``tp_param_shardings``),
- per-host input feeding via ``jax.device_put`` with the same shardings.

This is the TPU-native replacement for what the reference *doesn't have*
(SURVEY.md §2.2: no DP/TP/PP, no collective backend) — scaling is sharding
annotations on one program, not backend forks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_tpu.config import Config
from nerf_tpu.models.nerf import apply_nerf
from nerf_tpu.parallel.mesh import ray_sharding, replicated, tp_param_shardings
from nerf_tpu.train.trainer import TrainState, make_optimizer, make_train_step


def shard_train_state(
    state: TrainState,
    mesh: Mesh,
    tp: bool = False,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    """Place a TrainState on the mesh: replicated, or with tensor-parallel
    params — optimizer moments follow their params via
    ``optax.tree_map_params`` (the supported structural API: no reflection
    over optax internals, no silent replicated fallback; an optimizer-chain
    change that breaks the mapping raises).

    ``optimizer`` identifies the params-shaped leaves inside ``opt_state``;
    it defaults to the trainer's own ``make_optimizer(Config())``, whose
    chain *structure* does not depend on hyperparameter values. Pass the
    actual optimizer when using a custom chain.
    """
    if not tp:
        return jax.device_put(state, replicated(mesh))
    if optimizer is None:
        optimizer = make_optimizer(Config())
    param_spec = tp_param_shardings(state.params, mesh)

    opt_state = optax.tree_map_params(
        optimizer,
        lambda leaf, spec: jax.device_put(leaf, spec),
        state.opt_state,
        param_spec,
        transform_non_params=lambda leaf: jax.device_put(
            leaf, replicated(mesh)
        ),
    )

    return TrainState(
        params=jax.device_put(state.params, param_spec),
        opt_state=opt_state,
        step=jax.device_put(state.step, replicated(mesh)),
    )


def make_sharded_train_step(
    cfg: Config,
    img_hw: Tuple[int, int],
    mesh: Mesh,
    apply_fn=apply_nerf,
    tp: bool = False,
    donate: bool = True,
):
    """Jit the train step with mesh shardings. Inputs (image/pose/focal/key)
    are replicated — they are small; the heavy tensors (rays, samples,
    activations) shard via the in-step constraint."""
    rs = ray_sharding(mesh)
    step = make_train_step(
        cfg, img_hw, apply_fn=apply_fn, donate=False, ray_sharding=rs, jit=False
    )
    rep = replicated(mesh)

    if tp:
        dummy = None  # state shardings inferred from actual arrays
        in_shardings = (None, rep, rep, rep, rep)   # state: use arg shardings
        out_shardings = (None, rep)
    else:
        in_shardings = (rep, rep, rep, rep, rep)
        out_shardings = (rep, rep)

    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate else (),
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``). No-op when
    single-process. Call before any jax op on every host of the pod slice."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
