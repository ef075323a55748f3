"""Unit tests for positional encoding (reference test analog:
``test_system.py:61-92``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.models.encoding import encoded_dim, positional_encoding


def test_output_dim():
    x = jnp.ones((7, 3))
    for L in (0, 1, 4, 10):
        out = positional_encoding(x, L)
        assert out.shape == (7, encoded_dim(3, L))
    assert encoded_dim(3, 10) == 63
    assert encoded_dim(3, 4) == 27


def test_identity_prefix():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    out = positional_encoding(x, 6)
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)


def test_ordering_matches_reference_layout():
    """Layout is [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with
    f_i = 2^i * pi (reference ``nerf.py:40-45``)."""
    x = jnp.asarray([[0.1, -0.2, 0.3]])
    L = 3
    out = np.asarray(positional_encoding(x, L, include_pi=True))
    xn = np.asarray(x)
    expected = [xn]
    for i in range(L):
        f = (2.0**i) * np.pi
        expected.append(np.sin(f * xn))
        expected.append(np.cos(f * xn))
    np.testing.assert_allclose(out, np.concatenate(expected, -1), rtol=1e-5, atol=1e-6)


def test_no_pi_variant():
    """bmild/original-NeRF encoding omits the pi factor."""
    x = jnp.asarray([[0.5, 0.0, -0.5]])
    out = np.asarray(positional_encoding(x, 2, include_pi=False))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[:, 3:6], np.sin(xn), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * xn), rtol=1e-6, atol=1e-7)


def test_batch_shapes():
    x = jnp.zeros((2, 4, 5, 3))
    out = positional_encoding(x, 4)
    assert out.shape == (2, 4, 5, 27)


def test_differentiable():
    f = lambda x: jnp.sum(positional_encoding(x, 4) ** 2)
    g = jax.grad(f)(jnp.ones((3,)))
    assert g.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(g)))
