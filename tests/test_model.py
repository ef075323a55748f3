"""Unit tests for the NeRF MLP (reference analog: ``test_system.py:95-135``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig, bmild_config
from nerf_tpu.models import apply_nerf, init_nerf_params, load_bmild_weights
from nerf_tpu.models.nerf import count_params

BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


@pytest.fixture(scope="module")
def ref_setup():
    cfg = ModelConfig()
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    return cfg, params


def test_output_shapes_and_ranges(ref_setup):
    cfg, params = ref_setup
    key = jax.random.PRNGKey(2)
    pos = jax.random.normal(key, (64, 3))
    dirs = jax.random.normal(key, (64, 3))
    sigma, rgb = apply_nerf(params, pos, dirs, cfg)
    assert sigma.shape == (64,)
    assert rgb.shape == (64, 3)
    # reference variant applies in-model ReLU to density (``nerf.py:114``)
    assert bool(jnp.all(sigma >= 0))
    assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))


def test_batch_polymorphism(ref_setup):
    cfg, params = ref_setup
    pos = jnp.zeros((4, 8, 3))
    dirs = jnp.ones((4, 8, 3))
    sigma, rgb = apply_nerf(params, pos, dirs, cfg)
    assert sigma.shape == (4, 8)
    assert rgb.shape == (4, 8, 3)


def test_param_shapes(ref_setup):
    cfg, params = ref_setup
    assert params["trunk"][0]["w"].shape == (63, 256)
    assert params["trunk"][cfg.skip_layer]["w"].shape == (256 + 63, 256)
    assert params["density"]["w"].shape == (256, 1)
    assert params["color0"]["w"].shape == (256 + 27, 128)
    assert params["color1"]["w"].shape == (128, 3)


def test_directions_none_is_usable(ref_setup):
    """Unlike the reference (dimensionally broken at ``nerf.py:117-121``),
    directions=None evaluates with a zero direction encoding."""
    cfg, params = ref_setup
    sigma, rgb = apply_nerf(params, jnp.zeros((5, 3)), None, cfg)
    assert rgb.shape == (5, 3)


def test_grad_flows(ref_setup):
    cfg, params = ref_setup

    def loss(p):
        s, c = apply_nerf(p, jnp.ones((16, 3)) * 0.3, jnp.ones((16, 3)), cfg)
        return jnp.mean(s) + jnp.mean(c)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # the first trunk layer must receive gradient
    assert float(jnp.max(jnp.abs(g["trunk"][0]["w"]))) > 0


def test_bfloat16_compute_close_to_f32(ref_setup):
    cfg, params = ref_setup
    pos = jax.random.normal(jax.random.PRNGKey(3), (128, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(4), (128, 3))
    s32, c32 = apply_nerf(params, pos, dirs, cfg, compute_dtype=jnp.float32)
    s16, c16 = apply_nerf(params, pos, dirs, cfg, compute_dtype=jnp.bfloat16)
    assert s16.dtype == jnp.float32  # outputs always f32
    np.testing.assert_allclose(np.asarray(c32), np.asarray(c16), atol=0.05)


def test_bmild_weights_load_and_eval():
    cfg = bmild_config().model
    params = load_bmild_weights(BMILD_WEIGHTS)
    assert params["trunk"][5]["w"].shape == (319, 256)  # skip layer
    assert params["bottleneck"]["w"].shape == (256, 256)
    assert count_params(params) == sum(
        int(np.prod(s)) for s in [
            (63, 256), (256,), (256, 256), (256,), (256, 256), (256,),
            (256, 256), (256,), (256, 256), (256,), (319, 256), (256,),
            (256, 256), (256,), (256, 256), (256,), (256, 256), (256,),
            (283, 128), (128,), (128, 3), (3,), (256, 1), (1,),
        ]
    )
    # evaluate near the scene: some densities should be positive
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (512, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(key, (512, 3))
    sigma, rgb = apply_nerf(params, pos, dirs, cfg)
    assert bool(jnp.any(sigma > 0))
    assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))


def test_torch_state_dict_roundtrip(ref_setup):
    cfg, params = ref_setup
    from nerf_tpu.models.nerf import (
        params_from_torch_state_dict,
        params_to_torch_state_dict,
    )

    sd = params_to_torch_state_dict(params)
    back = params_from_torch_state_dict(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
