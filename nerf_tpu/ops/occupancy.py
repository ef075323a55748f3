"""Occupancy-grid accelerated sampling — empty-space skipping, TPU style.

Beyond-reference optimization (the reference samples uniformly along every
ray, ``base_renderer.py:260-281``): a dense density grid baked from the
trained model marks which cells of the scene AABB contain matter. At render
time each ray probes the grid at many cheap positions (a memory gather — ~4
bytes vs the ~1 MFLOP MLP evaluation) and concentrates its *actual* MLP
samples in occupied regions via the same inverse-CDF machinery as
hierarchical sampling. Empty space costs gathers, not network evaluations.

This is the TPU-shaped version of occupancy-grid/early-termination
acceleration (NerfAcc-style): per-sample *skipping* is a scalar-loop concept
that does not map to SIMD hardware, but per-ray *redistribution* of a fixed
sample budget is dense, static-shaped, and jit-friendly — same budget, spent
where the scene is.

Output is quality-gated, not bit-identical: a different (better-placed)
sample distribution produces slightly different pixels than uniform
sampling; the accel engine is therefore PSNR-gated against the XLA engine in
the benchmark suite rather than allclose-gated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.nerf import NeRFParams, apply_nerf
from nerf_tpu.utils.rendering import sample_pdf


class OccupancyGrid(NamedTuple):
    occupancy: jnp.ndarray   # [G^3] float32 (flat, x-major): {0, 1} when
                             # baked with store="binary", raw relu(sigma)
                             # with store="density"
    aabb_lo: jnp.ndarray     # [3]
    aabb_hi: jnp.ndarray     # [3]
    resolution: int


def build_occupancy_grid(
    params: NeRFParams,
    cfg: ModelConfig,
    resolution: int = 128,
    aabb: Tuple[float, float] = (-1.5, 1.5),
    density_threshold: float = 5.0,
    apply_fn=apply_nerf,
    chunk: int = 1 << 18,
    compute_dtype=jnp.bfloat16,
    store: str = "binary",
) -> OccupancyGrid:
    """Bake an occupancy grid by evaluating the model's density at every
    cell center (one dense pass; ~2M evaluations at G=128 — a fraction of a
    single frame's cost). ``store="binary"`` thresholds post-ReLU density
    to {0, 1}; ``store="density"`` keeps relu(sigma) itself, enabling the
    alpha/transmittance probe weightings in ``grid_guided_z_vals`` (the
    baked-grid analog of a coarse network pass)."""
    g = resolution
    lo, hi = float(aabb[0]), float(aabb[1])
    centers = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g * (hi - lo) + lo
    X, Y, Z = jnp.meshgrid(centers, centers, centers, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)       # [G^3, 3]

    @jax.jit
    def eval_chunk(p):
        sigma, _ = apply_fn(params, p, jnp.zeros_like(p), cfg,
                            compute_dtype=compute_dtype)
        return jax.nn.relu(sigma)

    n = pts.shape[0]
    occ = []
    for i in range(0, n, chunk):
        occ.append(eval_chunk(pts[i : i + chunk]))
    sigma = jnp.concatenate(occ)
    if store == "density":
        occupancy = sigma.astype(jnp.float32)
    else:
        occupancy = (sigma > density_threshold).astype(jnp.float32)
    return OccupancyGrid(
        occupancy=occupancy,
        aabb_lo=jnp.full((3,), lo),
        aabb_hi=jnp.full((3,), hi),
        resolution=g,
    )


def downsample_grid(grid: OccupancyGrid, factor: int) -> OccupancyGrid:
    """Conservative (max-pool, i.e. dilating) downsample: a supercell is
    occupied iff ANY of its factor^3 children is. Probing a coarser grid
    needs proportionally fewer probes per ray without ever *missing* matter
    the fine grid knows about — probe spacing only has to undercut the
    coarse cell size. The cost is looser sample placement (more samples in
    near-empty supercells), which the GT quality gate prices."""
    g = grid.resolution
    assert g % factor == 0, (g, factor)
    gc = g // factor
    occ = grid.occupancy.reshape(gc, factor, gc, factor, gc, factor)
    occ = occ.max(axis=(1, 3, 5))
    return OccupancyGrid(
        occupancy=occ.reshape(-1),
        aabb_lo=grid.aabb_lo,
        aabb_hi=grid.aabb_hi,
        resolution=gc,
    )


def query_occupancy(grid: OccupancyGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Nearest-cell occupancy lookup for ``points [..., 3]`` -> [...] in
    {0, 1}; out-of-AABB points read 0."""
    g = grid.resolution
    t = (points - grid.aabb_lo) / (grid.aabb_hi - grid.aabb_lo)
    idx = jnp.floor(t * g).astype(jnp.int32)
    in_bounds = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    flat = (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]
    occ = jnp.take(grid.occupancy, flat.reshape(-1), axis=0).reshape(flat.shape)
    return occ * in_bounds.astype(occ.dtype)


def grid_guided_z_vals(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    n_probe: int = 128,
    key: Optional[jax.Array] = None,
    floor: float = 1e-3,
    ray_stride: int = 1,
    weight_mode: str = "occupancy",
) -> jnp.ndarray:
    """Place ``n_samples`` depths per ray, concentrated where the occupancy
    grid says the scene is. ``n_probe`` uniform gather-probes per ray build a
    piecewise-constant occupancy pdf; ``floor`` keeps a small uniform
    component so fully-probed-empty rays degrade to uniform sampling (and
    thin features missed by probing still get some coverage).

    ``ray_stride > 1`` probes only every ``stride``-th ray and shares its
    occupancy profile with the ``stride - 1`` following rays. Rays arrive in
    scanline order, so a stride group is a run of adjacent pixels whose rays
    traverse nearly identical grid cells; the XLA occupancy gather is the
    dominant probe cost on TPU (115 of ~125 ms/frame at 400x300xP96,
    ``scripts/probe_microbench.py``) and drops by exactly the stride factor.
    Misses at depth edges are backstopped by the dilated probe mip
    (``downsample_grid``) + ``floor``, and priced by the GT quality gate
    (``results/perf/accel_sweep.json``) like every other accel knob."""
    n_rays = rays_o.shape[0]
    t = (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) / n_probe
    z_probe_row = near + (far - near) * t                   # [P]
    if ray_stride > 1:
        n_groups = -(-n_rays // ray_stride)
        rep = jnp.minimum(
            jnp.arange(n_groups) * ray_stride, n_rays - 1
        )
        ro_p = jnp.take(rays_o, rep, axis=0)
        rd_p = jnp.take(rays_d, rep, axis=0)
    else:
        n_groups = n_rays
        ro_p, rd_p = rays_o, rays_d
    z_probe = jnp.broadcast_to(z_probe_row, (n_groups, n_probe))
    pts = ro_p[:, None, :] + rd_p[:, None, :] * z_probe[..., None]
    occ = query_occupancy(grid, pts)                        # [N/stride, P]
    if weight_mode == "occupancy":
        # binary grids: flat pdf over occupied probe segments
        weights = occ + floor
    else:
        # density-stored grids (store="density"): treat each probe segment
        # as a fat sample of the baked field. "alpha" concentrates on
        # opacity; "transmittance" additionally discounts by the exclusive
        # transmittance along the probes — the true volume-rendering weight
        # at probe resolution, i.e. a coarse NeRF pass priced at a memory
        # gather instead of an MLP evaluation (reference coarse pass
        # semantics, ``trainer.py:294-316``, from the cache instead of the
        # network).
        dz = (far - near) / n_probe * jnp.linalg.norm(
            rd_p, axis=-1, keepdims=True)                   # [N/stride, 1]
        alpha = 1.0 - jnp.exp(-occ * dz)
        if weight_mode == "alpha":
            weights = alpha + floor
        elif weight_mode == "transmittance":
            log_t = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
            t_excl = jnp.exp(
                jnp.cumsum(log_t, axis=-1) - log_t)         # exclusive
            weights = alpha * t_excl + floor
        else:
            raise ValueError(f"unknown weight_mode {weight_mode!r}")
    if key is None:
        # deterministic quantiles + shared group weights -> identical z per
        # group, so invert the CDF once per group and repeat; quantiles are
        # increasing and the inverse CDF is monotone, so z is already sorted
        # per ray (asserted in tests)
        z = sample_pdf(z_probe, weights, n_samples, deterministic=True)
        if ray_stride > 1:
            z = jnp.repeat(z, ray_stride, axis=0)[:n_rays]
        return z
    if ray_stride > 1:
        weights = jnp.repeat(weights, ray_stride, axis=0)[:n_rays]
    z_probe_full = jnp.broadcast_to(z_probe_row, (n_rays, n_probe))
    z = sample_pdf(z_probe_full, weights, n_samples, key=key,
                   deterministic=False)
    return jnp.sort(z, axis=-1)
