"""PSNR/SSIM metric properties — notably the SSIM <= 1 bound: the round-2
quality gate once recorded SSIM = 1.0009 because f32 variance estimates
(blur(x*x) - mu^2) went negative on near-constant patches."""

import numpy as np
import jax.numpy as jnp

from nerf_tpu.utils.metrics import mse, psnr, ssim


def test_psnr_identical_is_capped_by_eps():
    img = jnp.ones((16, 16, 3)) * 0.5
    assert float(psnr(img, img)) >= 100.0


def test_ssim_identical_is_exactly_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((24, 24, 3)), jnp.float32)
    assert float(ssim(img, img)) == 1.0


def test_ssim_never_exceeds_one_on_near_constant_images():
    # near-constant patches are where the f32 cancellation pushed the
    # variance negative and SSIM above 1.0
    rng = np.random.default_rng(1)
    base = np.full((32, 32, 3), 0.73, np.float32)
    a = jnp.asarray(base + rng.normal(0, 1e-4, base.shape).astype(np.float32))
    b = jnp.asarray(base + rng.normal(0, 1e-4, base.shape).astype(np.float32))
    s = float(ssim(a, b))
    assert s <= 1.0
    assert s > 0.5


def test_ssim_orders_by_distortion():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    small = img + 0.01 * jnp.asarray(rng.standard_normal(img.shape), jnp.float32)
    big = img + 0.2 * jnp.asarray(rng.standard_normal(img.shape), jnp.float32)
    assert float(ssim(img, small)) > float(ssim(img, big))
    assert float(psnr(img, small)) > float(psnr(img, big))


def test_mse_psnr_consistency():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    m = float(mse(a, b))
    assert np.isclose(float(psnr(a, b)), 10 * np.log10(1.0 / m), rtol=1e-5)
