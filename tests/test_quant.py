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
