"""Volume-rendering math: ray sampling, hierarchical importance sampling, and
alpha compositing — pure jax.numpy, fully differentiable, static shapes.

Capability parity with reference ``src/utils/rendering.py`` (VolumeRenderer):

- ``sample_points_on_rays``: stratified depths ``z = near*(1-t) + far*t`` with
  optional mid-point jitter (``rendering.py:36-47``).
- ``importance_sample``: inverse-CDF sampling from coarse weights
  (``rendering.py:54-100``). The reference defines this but never calls it
  (fine pass is uniform, ``trainer.py:306-309``); we wire it in for real,
  gated by ``RenderConfig.use_importance``.
- ``volume_render``: reference-exact compositing — per-sample distances with
  a 1e10 sentinel for the last sample, scaled by ||ray_d||; alpha =
  1-exp(-relu(sigma)*dist); exclusive cumulative product transmittance with a
  +1e-10 epsilon; rgb/depth/acc maps (``rendering.py:116-143``).

TPU notes: everything is vectorized over the ray axis (the shardable axis —
see ``parallel/``); the only sequential dependence is the transmittance
prefix-product along the sample axis, here a ``cumprod`` (log-space-free, as
in the reference) and in the fused path a Pallas on-chip scan
(``ops/composite_kernel.py``). Both paths use the associative composite rule
``(c1,T1) o (c2,T2) = (c1 + T1*c2, T1*T2)`` so blockwise merging is exact.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_tpu.config import RenderConfig


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # [N, 3]
    depth: jnp.ndarray    # [N]
    acc: jnp.ndarray      # [N] accumulated opacity
    weights: jnp.ndarray  # [N, S] per-sample compositing weights


def sample_points_on_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified sampling along rays.

    Returns ``(points [N, S, 3], z_vals [N, S])``. With ``perturb`` (training),
    each depth is jittered uniformly within its stratum, exactly the
    reference's lower/upper-mids scheme (``rendering.py:41-47``).
    """
    n_rays = rays_o.shape[0]
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    z_vals = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires a PRNG key")
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    points = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return points, z_vals


def sample_pdf(
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_importance`` new depths from the coarse
    weight distribution. ``z_vals [N, S]``, ``weights [N, S]`` -> ``[N, S2]``.

    Mirrors the reference's formulation (``rendering.py:54-100``): a
    piecewise-constant pdf over the coarse depths (weights + 1e-5), CDF with a
    leading zero, uniform draws, bin location, and linear interpolation
    between bracketing CDF knots. ``deterministic`` uses evenly spaced u's
    (midpoints) instead of random draws — used for parity gates and eval.

    TPU note: the bin search is NOT a ``searchsorted`` — a vmapped binary
    search lowers to serial gather rounds and measured 30 ms/step at
    2048x128x64 on v5e. Instead the bin membership indicator
    ``in_bin[n, s, j] = (cdf[j] <= u[s] < cdf[j+1])`` is formed by one
    broadcast comparison (the CDF is monotone, so adjacent-difference of the
    comparison matrix is exactly the one-hot bin), and every gather
    (cdf/z at below/above) becomes a tiny batched matmul against it:
    1.1 ms for the same shapes, bit-identical results.
    """
    n_rays, n_bins = z_vals.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, S+1]

    if deterministic:
        u = (jnp.arange(n_importance, dtype=z_vals.dtype) + 0.5) / n_importance
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=z_vals.dtype)

    # one-hot bin indicator via adjacent-difference of the <= comparison
    # matrix; cdf[0] = 0 <= u guarantees a bin fires, and the final knot is
    # treated as +inf (its comparison column forced to 0) so a draw landing
    # past cdf[-1] — possible when rounding leaves the cumsum just under 1 —
    # falls in the last bin, matching the reference's index clip. ``below =
    # j``, ``above = j+1`` (clipped to the last z bin by z_shift's repeated
    # final entry), matching searchsorted(side="right") semantics.
    cmp = (cdf[:, None, :-1] <= u[..., None]).astype(z_vals.dtype)  # [N, S2, S]
    cmp = jnp.concatenate([cmp, jnp.zeros_like(cmp[..., :1])], axis=-1)
    in_bin = cmp[..., :-1] - cmp[..., 1:]                         # [N, S2, S]
    z_shift = jnp.concatenate([z_vals[:, 1:], z_vals[:, -1:]], axis=-1)

    # one batched matmul picks all four bracketing values at once —
    # four separate einsums lowered to VPU multiply-reduce fusions
    # (19 ms/frame at 400x300@64 on v5e); a single [N, S2, S] @ [N, S, 4]
    # dot_general keeps the contraction on the MXU
    vals = jnp.stack([cdf[:, :-1], cdf[:, 1:], z_vals, z_shift], axis=-1)
    picked = jax.lax.dot_general(
        in_bin, vals,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=z_vals.dtype,
    )                                                             # [N, S2, 4]
    cdf_below, cdf_above = picked[..., 0], picked[..., 1]
    z_below, z_above = picked[..., 2], picked[..., 3]

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return z_below + t * (z_above - z_below)


def importance_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
    combine: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical fine sampling. Returns ``(points [N, S', 3], z [N, S'])``
    where ``S' = S + n_importance`` when ``combine`` (depths sorted so the
    compositor's adjacent-difference distances stay valid), else just the new
    samples (the reference's never-used version returns only the new ones).
    """
    z_new = sample_pdf(z_vals, jax.lax.stop_gradient(weights), n_importance,
                       key=key, deterministic=deterministic)
    if combine:
        z_all = jnp.sort(jnp.concatenate([z_vals, z_new], axis=-1), axis=-1)
    else:
        z_all = z_new
    points = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    return points, z_all


def volume_render(
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: RenderConfig = RenderConfig(),
    noise_key: Optional[jax.Array] = None,
) -> RenderOutputs:
    """Alpha-composite per-sample ``(sigma [N, S], rgb [N, S, 3])`` into per-ray
    rgb/depth/acc maps. Reference-exact numerics (``rendering.py:116-143``).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], cfg.dist_sentinel)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    if noise_key is not None and cfg.raw_noise_std > 0.0:
        sigma = sigma + cfg.raw_noise_std * jax.random.normal(
            noise_key, sigma.shape, sigma.dtype
        )

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(1.0 - alpha + cfg.transmittance_eps, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)

    if cfg.white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, depth_map, acc_map, weights)


def normalized_depth(out: RenderOutputs, eps: float = 1e-6) -> jnp.ndarray:
    """Expected depth normalized by accumulated opacity:
    ``sum(w*z) / sum(w)`` — the formulation the reference documents for its
    depth extraction (``DEPTH_EXTRACTION_README.md``: "depth = sum(w_i d_i) /
    sum(w_i)"). The raw ``RenderOutputs.depth`` is the unnormalized
    ``sum(w*z)`` the reference's code actually computes (``rendering.py:135``);
    this helper provides the documented variant (background pixels read as
    far-plane-ish instead of 0)."""
    return out.depth / jnp.maximum(out.acc, eps)
