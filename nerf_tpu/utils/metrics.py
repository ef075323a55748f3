"""Image-quality metrics: MSE, PSNR, SSIM.

The reference tracks MSE losses (``trainer.py:120-122``) and its docs report
PSNR/SSIM (``CONVERGENCE_ANALYSIS.md``, ``BASELINE_SUMMARY.md``); here they
are first-class jnp functions usable inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    m = mse(pred, target)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def psnr_from_mse(m: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an ``[H, W, C]`` image pair (Gaussian-windowed, the
    standard Wang et al. formulation, matching tf.image.ssim defaults)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    hw = filter_size // 2
    x = jnp.arange(filter_size, dtype=jnp.float32) - hw
    g = jnp.exp(-0.5 * (x / filter_sigma) ** 2)
    g = g / jnp.sum(g)

    def blur(img):
        # separable Gaussian along H then W, channelwise ("valid" padding)
        out = img.astype(jnp.float32)
        out = jax.vmap(
            lambda ch: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, g, mode="valid"), 0, ch
            ),
            in_axes=-1, out_axes=-1,
        )(out)
        out = jax.vmap(
            lambda ch: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, g, mode="valid"), 1, ch
            ),
            in_axes=-1, out_axes=-1,
        )(out)
        return out

    mu0, mu1 = blur(img0), blur(img1)
    # Variance estimates blur(x*x) - mu^2 can go slightly negative in f32
    # (catastrophic cancellation on near-constant patches), which lets the
    # ratio exceed 1.0 — an impossible SSIM. Clamp variances to >= 0 and the
    # covariance to Cauchy-Schwarz (|s01| <= sqrt(s00*s11)), which bounds the
    # structure term to [-1, 1] and the mean SSIM to [-1, 1].
    s00 = jnp.maximum(blur(img0 * img0) - mu0 * mu0, 0.0)
    s11 = jnp.maximum(blur(img1 * img1) - mu1 * mu1, 0.0)
    s01 = blur(img0 * img1) - mu0 * mu1
    bound = jnp.sqrt(s00 * s11)
    s01 = jnp.clip(s01, -bound, bound)
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)
