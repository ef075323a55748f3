"""Ray-blocked fused render kernel: parity with the XLA sample-then-evaluate
path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig, bmild_config
from nerf_tpu.models import apply_nerf, init_nerf_params, load_bmild_weights
from nerf_tpu.ops.render_kernel import fused_render_samples
from nerf_tpu.utils.rendering import sample_points_on_rays

BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


@pytest.fixture(scope="module")
def rays():
    key = jax.random.PRNGKey(0)
    rays_o = jnp.zeros((50, 3)).at[:, 2].set(4.0)
    rays_d = jax.random.normal(key, (50, 3)) * jnp.asarray([0.2, 0.2, 1.0])
    rays_d = rays_d.at[:, 2].set(-jnp.abs(rays_d[:, 2]) - 0.5)
    return rays_o, rays_d


def _xla_reference(params, cfg, rays_o, rays_d, S):
    pts, z = sample_points_on_rays(rays_o, rays_d, 2.0, 6.0, S)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    sigma, rgb = apply_nerf(params, pts, dirs, cfg)
    return sigma, rgb, z


def test_matches_xla_path_reference_variant(rays):
    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    s_ref, c_ref, z_ref = _xla_reference(params, cfg, rays_o, rays_d, 16)
    s_k, c_k, z_k = fused_render_samples(
        params, rays_o, rays_d, 2.0, 6.0, 16, cfg,
        block_samples=128, dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_matches_xla_path_bmild_variant(rays):
    """bmild variant includes the in-kernel direction normalization."""
    rays_o, rays_d = rays
    cfg = bmild_config().model
    params = load_bmild_weights(BMILD_WEIGHTS)
    s_ref, c_ref, z_ref = _xla_reference(params, cfg, rays_o, rays_d, 12)
    s_k, c_k, _ = fused_render_samples(
        params, rays_o, rays_d, 2.0, 6.0, 12, cfg,
        block_samples=96, dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               rtol=1e-3, atol=1e-3)


def test_ray_count_padding(rays):
    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    # 50 rays, block_rays = 128//8 = 16 -> pad to 64
    s_ref, c_ref, _ = _xla_reference(params, cfg, rays_o, rays_d, 8)
    s_k, c_k, _ = fused_render_samples(
        params, rays_o, rays_d, 2.0, 6.0, 8, cfg,
        block_samples=128, dtype=jnp.float32, interpret=True,
    )
    assert s_k.shape == (50, 8)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fused_render_zvals: arbitrary per-ray depths
# ---------------------------------------------------------------------------

def _random_zvals(key, n, s):
    z = jax.random.uniform(key, (n, s), minval=2.0, maxval=6.0)
    return jnp.sort(z, axis=-1)


def test_zvals_matches_xla_both_variants(rays):
    from nerf_tpu.ops.render_kernel import fused_render_zvals

    rays_o, rays_d = rays
    for cfg in (ModelConfig(), bmild_config().model):
        params = init_nerf_params(jax.random.PRNGKey(1), cfg)
        z = _random_zvals(jax.random.PRNGKey(2), rays_o.shape[0], 24)
        s_k, c_k = fused_render_zvals(
            params, rays_o, rays_d, z, cfg,
            block_samples=256, dtype=jnp.float32, interpret=True,
        )
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        s_ref, c_ref = apply_nerf(params, pts, dirs, cfg)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                                   rtol=1e-4, atol=1e-5)


def test_zvals_grads_are_exactly_xla(rays):
    """The custom VJP recomputes via the XLA path: grads must be bit-equal
    to differentiating apply_nerf on materialized points."""
    from nerf_tpu.ops.render_kernel import fused_render_zvals

    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    z = _random_zvals(jax.random.PRNGKey(2), rays_o.shape[0], 16)

    def loss_fused(p):
        s, c = fused_render_zvals(p, rays_o, rays_d, z, cfg,
                                  block_samples=256, dtype=jnp.bfloat16,
                                  interpret=True)
        return jnp.mean(c) + 1e-3 * jnp.mean(s)

    def loss_xla(p):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        s, c = apply_nerf(p, pts, dirs, cfg, compute_dtype=jnp.bfloat16)
        return jnp.mean(c) + 1e-3 * jnp.mean(s)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_xla)(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_fused_samples_accepts_quantized_weights(rays):
    """QuantizedPackedWeights flow through the ray-blocked kernel with
    in-VMEM dequant; output must match the sample-streaming quant kernel
    (same dequant math, so tolerances are numerical only)."""
    from nerf_tpu.ops.quant import quantize_model, quantized_nerf_apply

    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    q = quantize_model({"fine": params}, cfg, bits=8, prune_fraction=0.0)[0]["fine"]
    s_k, c_k, z = fused_render_samples(
        q, rays_o, rays_d, 2.0, 6.0, 16, cfg,
        block_samples=128, dtype=jnp.float32, interpret=True,
    )
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    s_ref, c_ref = quantized_nerf_apply(
        q, pts, rays_d[:, None, :], cfg, block=128,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_zvals_accepts_quantized_weights(rays):
    from nerf_tpu.ops.quant import quantize_model, quantized_nerf_apply
    from nerf_tpu.ops.render_kernel import fused_render_zvals

    rays_o, rays_d = rays
    cfg = bmild_config().model
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    q = quantize_model({"fine": params}, cfg, bits=8, prune_fraction=0.1)[0]["fine"]
    z = _random_zvals(jax.random.PRNGKey(2), rays_o.shape[0], 24)
    s_k, c_k = fused_render_zvals(
        q, rays_o, rays_d, z, cfg,
        block_samples=256, dtype=jnp.float32, interpret=True,
    )
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    s_ref, c_ref = quantized_nerf_apply(
        q, pts, rays_d[:, None, :], cfg, block=128,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_zvals_bmild_weights_hierarchical_shape(rays):
    """End-to-end shape/compat check on the real bundled weights when
    present (skipped otherwise)."""
    import os

    if not os.path.exists(BMILD_WEIGHTS):
        pytest.skip("bundled example weights unavailable")
    from nerf_tpu.ops.render_kernel import fused_render_zvals

    rays_o, rays_d = rays
    cfg = bmild_config().model
    params = load_bmild_weights(BMILD_WEIGHTS)
    z = _random_zvals(jax.random.PRNGKey(3), rays_o.shape[0], 32)
    sigma, rgb = fused_render_zvals(params, rays_o, rays_d, z, cfg,
                                    block_samples=256, interpret=True)
    assert sigma.shape == z.shape and rgb.shape == z.shape + (3,)
    assert bool(jnp.all(jnp.isfinite(sigma))) and bool(jnp.all((rgb >= 0) & (rgb <= 1)))


def test_planar_outputs_bit_identical_to_interleaved(rays):
    """planar=True scatters channels into [R, S] planes via exact one-hot
    matmuls (every element is one 1.0*x product) — bit-identical to the
    interleaved output, just already in the compositor's input layout."""
    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    s_i, c_i, z_i = fused_render_samples(
        params, rays_o, rays_d, 2.0, 6.0, 16, cfg,
        block_samples=128, dtype=jnp.float32, interpret=True,
    )
    s_p, planes, z_p = fused_render_samples(
        params, rays_o, rays_d, 2.0, 6.0, 16, cfg,
        block_samples=128, dtype=jnp.float32, interpret=True, planar=True,
    )
    assert isinstance(planes, tuple) and len(planes) == 3
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_i))
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(planes[c]), np.asarray(c_i[..., c])
        )
    np.testing.assert_array_equal(np.asarray(z_p), np.asarray(z_i))


def test_planar_zvals_bit_identical_to_interleaved(rays):
    from nerf_tpu.ops.render_kernel import (
        fused_render_zvals,
        fused_render_zvals_planar,
    )

    rays_o, rays_d = rays
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(3), (rays_o.shape[0], 16),
                           minval=2.0, maxval=6.0), axis=-1
    )
    s_i, c_i = fused_render_zvals(params, rays_o, rays_d, z, cfg,
                                  128, jnp.float32, True)
    s_p, planes = fused_render_zvals_planar(params, rays_o, rays_d, z, cfg,
                                            128, jnp.float32, True)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_i))
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(planes[c]), np.asarray(c_i[..., c])
        )


def test_composite_accepts_plane_tuple(rays):
    """fused_volume_render consumes rgb as a tuple of [N, S] planes (the
    planar kernels' output) identically to the stacked [N, S, 3] array."""
    from nerf_tpu.config import RenderConfig
    from nerf_tpu.ops.composite_kernel import fused_volume_render

    rays_o, rays_d = rays
    key = jax.random.PRNGKey(4)
    n, s = rays_o.shape[0], 16
    sigma = jax.random.normal(key, (n, s))
    rgb = jax.random.uniform(jax.random.PRNGKey(5), (n, s, 3))
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(6), (n, s), minval=2.0,
                           maxval=6.0), axis=-1
    )
    rcfg = RenderConfig()
    a = fused_volume_render(sigma, rgb, z, rays_d, rcfg, interpret=True)
    b = fused_volume_render(
        sigma, (rgb[..., 0], rgb[..., 1], rgb[..., 2]), z, rays_d, rcfg,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.weights), np.asarray(b.weights))
