"""The coarse/fine hierarchical rendering pipeline, shared by training and the
render engines.

Capability parity with reference ``trainer.py:294-316`` (_render_rays) and the
benchmark render path (``base_renderer.py:260-281`` + per-backend
``execute_volume_rendering``), unified into one differentiable function:

- coarse: stratified (optionally perturbed) sampling -> MLP -> composite;
- fine: true inverse-CDF importance sampling from the coarse weights
  (``RenderConfig.use_importance``; the reference's fine pass is uniform
  "simplified" sampling, ``trainer.py:306-309`` — that behavior is the
  ``use_importance=False`` compat mode).

Everything is batched over rays (the shardable axis) with static sample
counts, so one jit/pjit trace covers training and rendering.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerf_tpu.config import ModelConfig, RenderConfig
from nerf_tpu.models.nerf import NeRFParams, apply_nerf
from nerf_tpu.utils.rendering import (
    RenderOutputs,
    importance_sample,
    sample_points_on_rays,
    volume_render,
)


class RayRenderResult(NamedTuple):
    coarse: RenderOutputs
    fine: RenderOutputs


def _eval_and_composite(
    params: NeRFParams,
    points: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    compute_dtype,
    noise_key: Optional[jax.Array],
    apply_fn=apply_nerf,
    composite_fn=None,
) -> RenderOutputs:
    dirs = jnp.broadcast_to(rays_d[..., None, :], points.shape)
    sigma, rgb = apply_fn(params, points, dirs, mcfg, compute_dtype=compute_dtype)
    if composite_fn is not None and noise_key is None:
        return composite_fn(sigma, rgb, z_vals, rays_d, rcfg)
    return volume_render(sigma, rgb, z_vals, rays_d, rcfg, noise_key=noise_key)


def render_rays(
    params_coarse: NeRFParams,
    params_fine: NeRFParams,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    key: Optional[jax.Array] = None,
    perturb: bool = False,
    compute_dtype=jnp.float32,
    apply_fn=apply_nerf,
    composite_fn=None,
) -> RayRenderResult:
    """Render a batch of rays through the coarse+fine pipeline.

    ``apply_fn`` is injectable so execution engines can swap the MLP
    evaluator (XLA jnp vs fused Pallas vs quantized) without duplicating the
    pipeline — the TPU analog of the reference's per-backend renderer classes.
    ``composite_fn`` likewise swaps the compositor (jnp ``volume_render`` vs
    the fused Pallas scan, ``ops/composite_kernel.py``); it is used on
    deterministic (noise-free) passes only.
    """
    if perturb or (rcfg.use_importance and key is not None):
        if key is None:
            raise ValueError("stochastic rendering requires a PRNG key")
        k_coarse, k_imp, k_noise_c, k_noise_f = jax.random.split(key, 4)
    else:
        k_coarse = k_imp = k_noise_c = k_noise_f = None

    pts_c, z_c = sample_points_on_rays(
        rays_o, rays_d, rcfg.near, rcfg.far, rcfg.n_coarse,
        perturb=perturb, key=k_coarse,
    )
    coarse = _eval_and_composite(
        params_coarse, pts_c, z_c, rays_d, mcfg, rcfg, compute_dtype,
        k_noise_c if perturb else None, apply_fn, composite_fn,
    )

    if rcfg.use_importance:
        pts_f, z_f = importance_sample(
            rays_o, rays_d, z_c, coarse.weights, rcfg.n_fine,
            key=k_imp, deterministic=(k_imp is None), combine=True,
        )
    else:
        # reference-compat: uniform unperturbed fine sampling
        # (``trainer.py:306-309``)
        pts_f, z_f = sample_points_on_rays(
            rays_o, rays_d, rcfg.near, rcfg.far, rcfg.n_fine, perturb=False
        )
    fine = _eval_and_composite(
        params_fine, pts_f, z_f, rays_d, mcfg, rcfg, compute_dtype,
        k_noise_f if perturb else None, apply_fn, composite_fn,
    )
    return RayRenderResult(coarse=coarse, fine=fine)
