"""Fused compositing kernel: numerics + gradient gate vs the jnp path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import RenderConfig
from nerf_tpu.ops.composite_kernel import fused_volume_render
from nerf_tpu.utils.rendering import sample_points_on_rays, volume_render


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n, s = 100, 33
    rays_d = jax.random.normal(k1, (n, 3))
    _, z = sample_points_on_rays(jnp.zeros((n, 3)), rays_d, 2.0, 6.0, s)
    sigma = jax.random.normal(k2, (n, s)) * 3.0
    rgb = jax.random.uniform(k3, (n, s, 3))
    return sigma, rgb, z, rays_d


def test_matches_jnp_compositor(data):
    sigma, rgb, z, rays_d = data
    ref = volume_render(sigma, rgb, z, rays_d)
    out = fused_volume_render(sigma, rgb, z, rays_d, RenderConfig(),
                              block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), np.asarray(ref.weights),
                               rtol=1e-4, atol=1e-5)


def test_white_background(data):
    sigma, rgb, z, rays_d = data
    cfg = RenderConfig(white_background=True)
    ref = volume_render(jnp.zeros_like(sigma), rgb, z, rays_d, cfg)
    out = fused_volume_render(jnp.zeros_like(sigma), rgb, z, rays_d, cfg,
                              block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.rgb), 1.0, atol=1e-5)


def test_opaque_first_sample(data):
    _, rgb, z, rays_d = data
    sigma = jnp.zeros(z.shape).at[:, 0].set(1e4)
    out = fused_volume_render(sigma, rgb, z, rays_d, RenderConfig(),
                              block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb[:, 0]),
                               atol=1e-3)


def test_gradients_match_jnp(data):
    sigma, rgb, z, rays_d = data
    sigma, rgb, z, rays_d = sigma[:16], rgb[:16], z[:16], rays_d[:16]
    target = jnp.full((16, 3), 0.4)

    def loss_fused(sigma, rgb):
        out = fused_volume_render(sigma, rgb, z, rays_d, RenderConfig(),
                                  block=16, interpret=True)
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.depth) * 0.01

    def loss_jnp(sigma, rgb):
        out = volume_render(sigma, rgb, z, rays_d)
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.depth) * 0.01

    gs_f, gr_f = jax.grad(loss_fused, argnums=(0, 1))(sigma, rgb)
    gs_j, gr_j = jax.grad(loss_jnp, argnums=(0, 1))(sigma, rgb)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_j),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_j),
                               rtol=1e-4, atol=1e-7)


def test_non_divisible_ray_count(data):
    sigma, rgb, z, rays_d = data
    out = fused_volume_render(sigma[:37], rgb[:37], z[:37], rays_d[:37],
                              RenderConfig(), block=32, interpret=True)
    ref = volume_render(sigma[:37], rgb[:37], z[:37], rays_d[:37])
    assert out.rgb.shape == (37, 3)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               rtol=1e-4, atol=1e-5)


def test_interleaved_compositor_matches_jnp(data):
    """fused_volume_render_interleaved consuming the render kernels' raw
    r-major [N, 4S] layout must match the jnp compositor exactly (the
    selector-matmul de-interleave is one exact 1.0*x product per element)."""
    from nerf_tpu.ops.composite_kernel import fused_volume_render_interleaved

    sigma, rgb, z, rays_d = data
    n, s = sigma.shape
    # build the interleaved view the kernels emit: row r = (sig, r, g, b)
    # per sample, s-major within the row
    raw = jnp.concatenate([sigma[..., None], rgb], axis=-1).reshape(n, 4 * s)
    ref = volume_render(sigma, rgb, z, rays_d)
    out = fused_volume_render_interleaved(raw, z, rays_d, RenderConfig(),
                                          block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.weights),
                               np.asarray(ref.weights),
                               rtol=1e-4, atol=1e-5)


def test_interleaved_white_background(data):
    from nerf_tpu.ops.composite_kernel import fused_volume_render_interleaved

    sigma, rgb, z, rays_d = data
    n, s = sigma.shape
    raw = jnp.concatenate([sigma[..., None], rgb], axis=-1).reshape(n, 4 * s)
    cfg = RenderConfig(white_background=True)
    ref = volume_render(sigma, rgb, z, rays_d, cfg)
    out = fused_volume_render_interleaved(raw, z, rays_d, cfg,
                                          block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               rtol=1e-4, atol=1e-5)
