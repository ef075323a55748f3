"""Compressed/quantized path tests (reference analog: compressed renderer
coverage in ``test_new_renderers.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig
from nerf_tpu.models import apply_nerf, init_nerf_params
from nerf_tpu.ops.quant import (
    make_quantized_apply_fn,
    prune_params,
    quantize_model,
    quantized_nerf_apply,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (300, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(key, (300, 3))
    return cfg, params, pos, dirs


def test_prune_zeroes_smallest_weights(setup):
    cfg, params, _, _ = setup
    pruned = prune_params(params, 0.3)
    w = np.asarray(pruned["trunk"][2]["w"])
    sparsity = float((w == 0).mean())
    assert 0.28 < sparsity < 0.33
    # biases untouched
    np.testing.assert_array_equal(
        np.asarray(pruned["trunk"][2]["b"]), np.asarray(params["trunk"][2]["b"])
    )


def test_quantized_outputs_close_to_f32(setup):
    cfg, params, pos, dirs = setup
    qmodels, stats = quantize_model(
        {"fine": params}, cfg, bits=8, prune_fraction=0.0
    )
    s_ref, c_ref = apply_nerf(params, pos, dirs, cfg)
    s_q, c_q = quantized_nerf_apply(
        qmodels["fine"], pos, dirs, cfg, block=128,
        dtype=jnp.float32, interpret=True,
    )
    # int8 per-channel: rgb within a few percent
    np.testing.assert_allclose(np.asarray(c_q), np.asarray(c_ref), atol=0.08)
    scale = max(float(jnp.std(s_ref)), 1.0)
    np.testing.assert_allclose(
        np.asarray(s_q), np.asarray(s_ref), atol=0.1 * scale
    )


def test_int16_tighter_than_int8(setup):
    cfg, params, pos, dirs = setup
    _, c_ref = apply_nerf(params, pos, dirs, cfg)
    err = {}
    for bits in (8, 16):
        qm, _ = quantize_model({"fine": params}, cfg, bits=bits, prune_fraction=0.0)
        _, c_q = quantized_nerf_apply(
            qm["fine"], pos, dirs, cfg, block=128,
            dtype=jnp.float32, interpret=True,
        )
        err[bits] = float(jnp.max(jnp.abs(c_q - c_ref)))
    assert err[16] < err[8]
    assert err[16] < 5e-3


BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


def test_int8_compute_close_to_f32():
    """int8 COMPUTE (s8 x s8 -> s32 trunk matmuls + quantized activations)
    stays within quantization-predicted tolerance of the f32 path, on a
    *real trained model* (random-init nets are ReLU-dead and prove
    nothing)."""
    import os

    if not os.path.exists(BMILD_WEIGHTS):
        pytest.skip("bundled bmild weights not available")
    from nerf_tpu.config import bmild_config
    from nerf_tpu.models import load_bmild_weights

    cfg = bmild_config().model
    params = load_bmild_weights(BMILD_WEIGHTS)
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (600, 3), minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(k2, (600, 3))

    qm, stats = quantize_model(
        {"fine": params}, cfg, bits=8, prune_fraction=0.0,
        act_bits=8, pos_bound=2.0,
    )
    assert stats["act_bits"] == 8
    s_ref, c_ref = apply_nerf(params, pos, dirs, cfg)
    s_q, c_q = quantized_nerf_apply(
        qm["fine"], pos, dirs, cfg, block=128,
        dtype=jnp.float32, interpret=True,
    )
    # rgb is sigmoid-bounded: activations add ~1/127-grade noise per layer
    # on top of the weight quantization
    c_err = float(jnp.sqrt(jnp.mean((c_q - c_ref) ** 2)))
    assert c_err < 0.05, f"rgb rms error {c_err}"
    # sigma field must track the trained geometry
    cc = np.corrcoef(
        np.asarray(s_q).ravel(), np.asarray(s_ref).ravel()
    )[0, 1]
    assert cc > 0.99, f"sigma correlation {cc}"


def test_int8_compute_positions_beyond_bound_saturate(setup):
    """xyz outside pos_bound must clip (saturate), not wrap."""
    cfg, params, _, dirs = setup
    qm, _ = quantize_model(
        {"fine": params}, cfg, bits=8, prune_fraction=0.0,
        act_bits=8, pos_bound=1.0,            # deliberately too small
    )
    far_pos = jnp.full((64, 3), 5.0)          # 5x beyond the bound
    s_q, c_q = quantized_nerf_apply(
        qm["fine"], far_pos, dirs[:64], cfg, block=64,
        dtype=jnp.float32, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(s_q)))
    assert bool(jnp.all(jnp.isfinite(c_q)))


def test_int8_compute_requires_8bit_weights(setup):
    cfg, params, _, _ = setup
    with pytest.raises(ValueError):
        quantize_model({"fine": params}, cfg, bits=16, act_bits=8)


def test_int8_compute_fused_render_kernels(setup):
    """Int8PackedWeights flow through the ray-blocked kernels (the engine's
    hot path) via ``_weights_for``."""
    cfg, params, _, _ = setup
    from nerf_tpu.ops.render_kernel import (
        fused_render_samples,
        fused_render_zvals,
    )

    qm, _ = quantize_model(
        {"fine": params}, cfg, bits=8, prune_fraction=0.0,
        act_bits=8, pos_bound=6.0,
    )
    rays_o = jnp.zeros((8, 3))
    rays_d = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    sigma, rgb, z = fused_render_samples(
        qm["fine"], rays_o, rays_d, 2.0, 6.0, 8, cfg,
        block_samples=64, interpret=True,
    )
    assert sigma.shape == (8, 8) and rgb.shape == (8, 8, 3)
    sigma2, rgb2 = fused_render_zvals(
        qm["fine"], rays_o, rays_d, z, cfg,
        block_samples=64, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sigma2), np.asarray(sigma), rtol=2e-2, atol=2e-2
    )

    # against the unquantized XLA evaluation at the same points
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    dirs_b = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    s_ref, c_ref = apply_nerf(params, pts, dirs_b, cfg)
    scale = max(float(jnp.std(s_ref)), 1.0)
    np.testing.assert_allclose(
        np.asarray(sigma), np.asarray(s_ref), atol=0.3 * scale
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(c_ref), atol=0.15)


def test_int8_engine_registered():
    from nerf_tpu.render.engines import ENGINE_CLASSES, Int8ComputeEngine

    assert ENGINE_CLASSES["int8"] is Int8ComputeEngine


def test_compression_stats_report(setup):
    cfg, params, _, _ = setup
    _, stats = quantize_model(
        {"coarse": params, "fine": params}, cfg, bits=8, prune_fraction=0.1
    )
    assert stats["bits"] == 8
    for net in ("coarse", "fine"):
        s = stats["networks"][net]
        # int8 + f32 scales/biases: close to 4x smaller
        assert 3.0 < s["compression_ratio"] < 4.5
        assert 0.08 < s["sparsity"] < 0.13


def test_pipeline_integration(setup):
    """Quantized apply_fn slots into the shared render pipeline."""
    cfg, params, _, _ = setup
    from nerf_tpu.config import RenderConfig
    from nerf_tpu.render.pipeline import render_rays

    qmodels, _ = quantize_model(
        {"coarse": params, "fine": params}, cfg, bits=8, prune_fraction=0.1
    )
    apply_fn = make_quantized_apply_fn(block=128, interpret=True)
    rays_o = jnp.zeros((16, 3))
    rays_d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    out = render_rays(
        qmodels["coarse"], qmodels["fine"], rays_o, rays_d,
        cfg, RenderConfig(n_coarse=8, n_fine=8, use_importance=False),
        perturb=False, apply_fn=apply_fn,
    )
    assert out.fine.rgb.shape == (16, 3)
    assert bool(jnp.all(jnp.isfinite(out.fine.rgb)))
