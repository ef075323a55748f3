"""Unit tests for sampling + compositing (reference analog:
``test_system.py:138-177``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import RenderConfig
from nerf_tpu.utils.rendering import (
    importance_sample,
    sample_pdf,
    sample_points_on_rays,
    volume_render,
)


@pytest.fixture
def rays():
    key = jax.random.PRNGKey(0)
    rays_o = jnp.zeros((32, 3))
    rays_d = jax.random.normal(key, (32, 3))
    return rays_o, rays_d


def test_uniform_sampling_shapes_and_bounds(rays):
    rays_o, rays_d = rays
    pts, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    assert pts.shape == (32, 16, 3)
    assert z.shape == (32, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 6.0, rtol=1e-6)
    assert bool(jnp.all(jnp.diff(z, axis=-1) > 0))


def test_perturbed_sampling_stays_in_strata(rays):
    rays_o, rays_d = rays
    _, z_ref = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    _, z = sample_points_on_rays(
        rays_o, rays_d, 2.0, 6.0, 16, perturb=True, key=jax.random.PRNGKey(1)
    )
    # each jittered z_i stays within [lower_i, upper_i] so ordering holds
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))
    assert bool(jnp.all(z >= 2.0)) and bool(jnp.all(z <= 6.0))
    assert float(jnp.max(jnp.abs(z - z_ref))) > 0  # actually perturbed


def test_volume_render_shapes_and_conservation(rays):
    rays_o, rays_d = rays
    pts, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    key = jax.random.PRNGKey(2)
    sigma = jax.random.uniform(key, z.shape) * 5.0
    rgb = jax.random.uniform(key, pts.shape)
    out = volume_render(sigma, rgb, z, rays_d)
    assert out.rgb.shape == (32, 3)
    assert out.depth.shape == (32,)
    assert out.weights.shape == (32, 16)
    # weights are a sub-probability distribution
    assert bool(jnp.all(out.weights >= 0))
    assert bool(jnp.all(out.acc <= 1.0 + 1e-4))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out.weights, -1)), np.asarray(out.acc), rtol=1e-5
    )


def test_opaque_first_sample_dominates(rays):
    """A very dense first sample should absorb the ray: rgb ~= its color,
    depth ~= its z (validates the 1e10 sentinel + exclusive cumprod)."""
    rays_o, rays_d = rays
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 8)
    sigma = jnp.zeros(z.shape).at[:, 0].set(1e4)
    rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (32, 8, 3))
    out = volume_render(sigma, rgb, z, rays_d)
    np.testing.assert_allclose(np.asarray(out.rgb[:, 0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(z[:, 0]), atol=1e-3)


def test_empty_space_renders_background(rays):
    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 8)
    sigma = jnp.zeros(z.shape)
    rgb = jnp.ones((32, 8, 3)) * 0.5
    out = volume_render(sigma, rgb, z, rays_d)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.0, atol=1e-5)
    white = volume_render(
        sigma, rgb, z, rays_d, RenderConfig(white_background=True)
    )
    np.testing.assert_allclose(np.asarray(white.rgb), 1.0, atol=1e-5)


def test_sample_pdf_concentrates_on_peak(rays):
    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    # weights peaked at bin 8 (z ~= 4.13)
    w = jnp.zeros(z.shape).at[:, 8].set(1.0)
    z_new = sample_pdf(z, w, 32, deterministic=True)
    assert z_new.shape == (32, 32)
    frac_near = jnp.mean((jnp.abs(z_new - z[:, 8:9]) < 0.3).astype(jnp.float32))
    assert float(frac_near) > 0.9


def test_sample_pdf_uniform_weights_spread(rays):
    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    w = jnp.ones(z.shape)
    z_new = sample_pdf(z, w, 64, deterministic=True)
    assert 2.0 <= float(z_new.min()) and float(z_new.max()) <= 6.0
    # roughly uniform: mean near 4
    assert abs(float(z_new.mean()) - 4.0) < 0.2


def test_importance_sample_combined_sorted(rays):
    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    w = jax.random.uniform(jax.random.PRNGKey(3), z.shape)
    pts, z_all = importance_sample(
        rays_o, rays_d, z, w, 24, key=jax.random.PRNGKey(4)
    )
    assert z_all.shape == (32, 40)
    assert pts.shape == (32, 40, 3)
    assert bool(jnp.all(jnp.diff(z_all, axis=-1) >= 0))


def test_volume_render_differentiable(rays):
    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 8)

    def loss(sigma):
        rgb = jnp.ones((32, 8, 3)) * 0.5
        return jnp.sum(volume_render(sigma, rgb, z, rays_d).rgb)

    g = jax.grad(loss)(jnp.ones(z.shape))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_normalized_depth(rays):
    from nerf_tpu.utils.rendering import normalized_depth

    rays_o, rays_d = rays
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 8)
    # half-opaque uniform medium: raw depth underestimates, normalized
    # depth recovers the expected-z under the weight distribution
    sigma = jnp.full(z.shape, 0.2)
    rgb = jnp.ones((32, 8, 3))
    out = volume_render(sigma, rgb, z, rays_d)
    nd = normalized_depth(out)
    assert bool(jnp.all(nd >= out.depth - 1e-5))
    np.testing.assert_allclose(
        np.asarray(nd), np.asarray(out.depth / out.acc), rtol=1e-5
    )


def test_sample_pdf_outputs_stay_in_range(rays):
    """No stochastic draw may escape [near, far] — in particular a u at or
    above the final CDF knot (possible when rounding leaves the cumsum just
    under 1) must land in the last bin, not collapse to z=0."""
    import jax

    rays_o, rays_d = rays
    _, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, 16)
    w = jnp.ones(z.shape)
    for seed in range(8):
        z_new = sample_pdf(z, w, 128, key=jax.random.PRNGKey(seed))
        assert float(z_new.min()) >= 2.0 - 1e-5
        assert float(z_new.max()) <= 6.0 + 1e-5
