"""Fused Pallas MLP kernel: numerics gate vs the XLA path (SURVEY.md §7.2
step 4: "allclose vs core/ path"), both architecture variants, gradients.

Runs in interpreter mode on CPU; the same kernel compiles for TPU (exercised
by bench.py / the render engines on hardware).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig, bmild_config
from nerf_tpu.models import apply_nerf, init_nerf_params, load_bmild_weights
from nerf_tpu.ops.mlp_kernel import fused_nerf_apply, pack_params

BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (600, 3), minval=-2.0, maxval=2.0)
    dirs = jax.random.normal(k2, (600, 3))
    return pos, dirs


def test_reference_variant_matches_xla_f32(inputs):
    pos, dirs = inputs
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    s_ref, c_ref = apply_nerf(params, pos, dirs, cfg)
    s_k, c_k = fused_nerf_apply(
        params, pos, dirs, cfg, block=256, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_bmild_variant_matches_xla_f32(inputs):
    pos, dirs = inputs
    cfg = bmild_config().model
    params = load_bmild_weights(BMILD_WEIGHTS)
    s_ref, c_ref = apply_nerf(params, pos, dirs, cfg)
    s_k, c_k = fused_nerf_apply(
        params, pos, dirs, cfg, block=256, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=1e-4, atol=1e-4)


def test_bf16_close_to_f32(inputs):
    pos, dirs = inputs
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(2), cfg)
    _, c_ref = apply_nerf(params, pos, dirs, cfg)
    _, c_k = fused_nerf_apply(
        params, pos, dirs, cfg, block=256, dtype=jnp.bfloat16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=0.05)


def test_non_divisible_batch_padding(inputs):
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(3), cfg)
    pos = jnp.ones((37, 3)) * 0.2
    dirs = jnp.ones((37, 3))
    s_ref, c_ref = apply_nerf(params, pos, dirs, cfg)
    s_k, c_k = fused_nerf_apply(
        params, pos, dirs, cfg, block=128, dtype=jnp.float32, interpret=True
    )
    assert s_k.shape == (37,)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_leading_batch_dims(inputs):
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(4), cfg)
    pos = jnp.ones((4, 9, 3)) * 0.1
    dirs = jnp.ones((4, 1, 3))  # broadcast over samples, as the pipeline does
    s_k, c_k = fused_nerf_apply(
        params, pos, jnp.broadcast_to(dirs, pos.shape), cfg,
        block=128, dtype=jnp.float32, interpret=True,
    )
    assert s_k.shape == (4, 9)
    assert c_k.shape == (4, 9, 3)


def test_gradients_match_xla_path(inputs):
    """The custom VJP must yield the same param grads as differentiating the
    XLA path directly (backward is an XLA recompute by construction; this
    pins the plumbing: cotangent routing, shape restoration)."""
    pos, dirs = inputs
    pos, dirs = pos[:64], dirs[:64]
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(5), cfg)

    def loss_fused(p):
        s, c = fused_nerf_apply(
            p, pos, dirs, cfg, block=64, dtype=jnp.float32, interpret=True
        )
        return jnp.mean(s**2) + jnp.mean((c - 0.5) ** 2)

    def loss_xla(p):
        s, c = apply_nerf(p, pos, dirs, cfg)
        return jnp.mean(s**2) + jnp.mean((c - 0.5) ** 2)

    g_fused = jax.grad(loss_fused)(params)
    g_xla = jax.grad(loss_xla)(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_pack_params_rejects_wrong_arch():
    cfg = ModelConfig(hidden_dim=64)
    params = init_nerf_params(jax.random.PRNGKey(6), cfg)
    with pytest.raises(AssertionError):
        pack_params(params, cfg)


def test_fast_sin_accuracy():
    """The bf16-path polynomial sine must stay far below bf16 quantization
    (eps ~4e-3) across the full positional-encoding phase range (top octave
    |p| ~ 2^9 * pi * |x|)."""
    from nerf_tpu.ops.mlp_kernel import _fast_sin

    p = np.random.RandomState(0).uniform(-10000, 10000, 100000).astype(np.float32)
    got = np.asarray(_fast_sin(jnp.asarray(p)))
    want = np.sin(p.astype(np.float64))
    assert np.abs(got - want).max() < 1e-5
