"""Numeric parity gates vs the reference PyTorch implementation.

These tests import the reference (read-only, ``/root/reference``) and assert
``allclose`` between our jnp math and the reference's torch math on identical
inputs/weights — the BASELINE.json "bit-comparable renders / grads" gate.
Deterministic paths only (perturb off, fixed weights), since torch/jax PRNG
trajectories can never match (SURVEY.md §7.4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch

from nerf_tpu.config import ModelConfig, RenderConfig
from nerf_tpu.models import apply_nerf
from nerf_tpu.models.encoding import positional_encoding
from nerf_tpu.models.nerf import params_from_torch_state_dict
from nerf_tpu.utils.cameras import generate_rays, orbit_poses
from nerf_tpu.utils.rendering import (
    sample_pdf,
    sample_points_on_rays,
    volume_render,
)

TOL = dict(rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def ref(reference_src):
    from src.models.nerf import NeRFModel, PositionalEncoding
    from src.utils.rendering import VolumeRenderer

    torch.manual_seed(0)
    model = NeRFModel()
    model.eval()
    return {
        "NeRFModel": NeRFModel,
        "PositionalEncoding": PositionalEncoding,
        "VolumeRenderer": VolumeRenderer,
        "model": model,
    }


def test_positional_encoding_parity(ref):
    x = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(positional_encoding(jnp.asarray(x), 10, include_pi=True))
    theirs = ref["PositionalEncoding"](10).encode(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_mlp_forward_parity(ref):
    """Same torch-initialized weights -> identical (sigma, rgb)."""
    model = ref["model"]
    cfg = ModelConfig()
    params = params_from_torch_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    pos = rng.normal(size=(256, 3)).astype(np.float32)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)

    with torch.no_grad():
        sigma_t, rgb_t = model(torch.from_numpy(pos), torch.from_numpy(dirs))
    sigma_j, rgb_j = apply_nerf(params, jnp.asarray(pos), jnp.asarray(dirs), cfg)

    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy()[:, 0], **TOL)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), **TOL)


def test_ray_generation_parity(ref):
    """Ray origins/directions match the reference's transposed-meshgrid
    convention (``base_renderer.py:223-258``) for benchmark poses."""
    from src.benchmark.base_renderer import BaseUnifiedRenderer

    class Concrete(BaseUnifiedRenderer):
        def execute_volume_rendering(self, *a, **k):
            raise NotImplementedError

        def render_image(self, *a, **k):
            raise NotImplementedError

    r = Concrete("parity", "cpu")
    for pose in orbit_poses(3):
        ro_t, rd_t = r.generate_rays(torch.from_numpy(pose), 20, 15, focal=800.0)
        ro_j, rd_j = generate_rays(jnp.asarray(pose), 20, 15, 800.0)
        np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), **TOL)
        np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), **TOL)


def test_uniform_sampling_parity(ref):
    vr = ref["VolumeRenderer"]("cpu")
    rng = np.random.default_rng(2)
    ro = rng.normal(size=(17, 3)).astype(np.float32)
    rd = rng.normal(size=(17, 3)).astype(np.float32)
    pts_t, z_t = vr.sample_points_on_rays(
        torch.from_numpy(ro), torch.from_numpy(rd), 2.0, 6.0, 33, perturb=False
    )
    pts_j, z_j = sample_points_on_rays(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, 33)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(pts_j), pts_t.numpy(), **TOL)


def test_volume_render_parity(ref):
    """Compositing matches bit-for-bit-ish: 1e10 sentinel, ||d|| scaling,
    double ReLU, exclusive cumprod with +1e-10 (``rendering.py:116-143``)."""
    vr = ref["VolumeRenderer"]("cpu")
    rng = np.random.default_rng(3)
    n, s = 29, 41
    sigma = rng.normal(size=(n, s, 1)).astype(np.float32) * 3.0
    rgb = rng.uniform(size=(n, s, 3)).astype(np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, size=(n, s)).astype(np.float32), axis=-1)
    rd = rng.normal(size=(n, 3)).astype(np.float32)

    rgb_t, depth_t, acc_t, w_t = vr.volume_render(
        torch.from_numpy(sigma), torch.from_numpy(rgb),
        torch.from_numpy(z), torch.from_numpy(rd),
    )
    out = volume_render(
        jnp.asarray(sigma[..., 0]), jnp.asarray(rgb), jnp.asarray(z), jnp.asarray(rd)
    )
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_t.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.depth), depth_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), acc_t.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.weights), w_t.numpy(), **TOL)


def test_reference_importance_sample_is_broken(ref):
    """The reference's ``importance_sample`` (``rendering.py:54-100``) is dead
    code (no call sites, SURVEY.md §2.1) and in fact crashes on a shape
    mismatch in its z_vals gather — pin that fact so the parity target for
    importance sampling is understood to be the *formulation*, not the code."""
    vr = ref["VolumeRenderer"]("cpu")
    n, s = 4, 8
    z = torch.linspace(2.0, 6.0, s).expand(n, s)
    w = torch.ones(n, s)
    with pytest.raises(RuntimeError):
        vr.importance_sample(torch.zeros(n, 3), torch.ones(n, 3), z, w, 16)


def test_importance_cdf_vs_numpy_oracle():
    """Our inverse-CDF transform matches an independent numpy implementation
    of the standard NeRF sample_pdf (the formulation the reference's broken
    version intends: +1e-5 floor, CDF with leading zero, searchsorted-right,
    linear interpolation)."""
    rng = np.random.default_rng(4)
    n, s, si = 13, 16, 24
    z = np.sort(rng.uniform(2.0, 6.0, size=(n, s)).astype(np.float32), axis=-1)
    w = rng.uniform(size=(n, s)).astype(np.float32)
    u = rng.uniform(size=(n, si)).astype(np.float32)

    # numpy oracle
    wf = w + 1e-5
    pdf = wf / wf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n, 1), np.float32), np.cumsum(pdf, -1)], -1)
    expected = np.empty((n, si), np.float32)
    for r in range(n):
        idx = np.searchsorted(cdf[r], u[r], side="right")
        below = np.clip(idx - 1, 0, s - 1)
        above = np.clip(idx, 0, s - 1)
        denom = cdf[r][above] - cdf[r][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cdf[r][below]) / denom
        expected[r] = z[r][below] + t * (z[r][above] - z[r][below])

    z_ours = _sample_pdf_with_u(jnp.asarray(z), jnp.asarray(w), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(z_ours), expected, rtol=1e-4, atol=1e-4)


def _sample_pdf_with_u(z_vals, weights, u):
    """sample_pdf with externally supplied uniforms (mirrors the reference's
    +1e-5 pdf floor; ours adds the floor before normalizing, as they do)."""
    n_bins = z_vals.shape[-1]
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(idx - 1, 0, n_bins - 1)
    above = jnp.clip(idx, 0, n_bins - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    z_b = jnp.take_along_axis(z_vals, below, axis=-1)
    z_a = jnp.take_along_axis(z_vals, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return z_b + t * (z_a - z_b)


def test_end_to_end_render_parity(ref):
    """Full deterministic render of a small frame: reference pipeline
    (fine-only, uniform sampling, benchmark conventions) vs ours."""
    model = ref["model"]
    vr = ref["VolumeRenderer"]("cpu")
    cfg = ModelConfig()
    params = params_from_torch_state_dict(model.state_dict(), cfg)
    pose = orbit_poses(2)[1]
    W, H, S = 16, 12, 9

    # --- reference-style pipeline in torch
    from src.benchmark.base_renderer import BaseUnifiedRenderer

    class Concrete(BaseUnifiedRenderer):
        def execute_volume_rendering(self, *a, **k):
            raise NotImplementedError

        def render_image(self, *a, **k):
            raise NotImplementedError

    r = Concrete("parity", "cpu")
    ro_t, rd_t = r.generate_rays(torch.from_numpy(pose), W, H, focal=800.0)
    ro_t, rd_t = ro_t.reshape(-1, 3), rd_t.reshape(-1, 3)
    pts_t, z_t = vr.sample_points_on_rays(ro_t, rd_t, 2.0, 6.0, S, perturb=False)
    dirs_t = rd_t[:, None, :].expand_as(pts_t).reshape(-1, 3)
    with torch.no_grad():
        sig_t, rgb_t = model(pts_t.reshape(-1, 3), dirs_t)
    sig_t = sig_t.reshape(H * W, S, 1)
    rgb_t = rgb_t.reshape(H * W, S, 3)
    rgb_map_t, depth_t, _, _ = vr.volume_render(sig_t, rgb_t, z_t, rd_t)

    # --- ours
    ro, rd = generate_rays(jnp.asarray(pose), W, H, 800.0)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    pts, z = sample_points_on_rays(ro, rd, 2.0, 6.0, S)
    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
    sig, rgb = apply_nerf(params, pts, dirs, cfg)
    out = volume_render(sig, rgb, z, rd)

    np.testing.assert_allclose(np.asarray(out.rgb), rgb_map_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), depth_t.numpy(), rtol=1e-3, atol=1e-3)


def test_pixel_gradient_parity(ref):
    """d(loss)/d(params) matches torch autograd on a deterministic mini
    render — the BASELINE.json grads-allclose gate."""
    model = ref["NeRFModel"]()
    torch.manual_seed(7)
    cfg = ModelConfig()
    vr = ref["VolumeRenderer"]("cpu")

    rng = np.random.default_rng(7)
    n, s = 8, 6
    ro = np.zeros((n, 3), np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    target = rng.uniform(size=(n, 3)).astype(np.float32)

    # torch forward+backward
    ro_t, rd_t = torch.from_numpy(ro), torch.from_numpy(rd)
    pts_t, z_t = vr.sample_points_on_rays(ro_t, rd_t, 2.0, 6.0, s, perturb=False)
    dirs_t = rd_t[:, None, :].expand_as(pts_t).reshape(-1, 3)
    sig_t, rgb_t = model(pts_t.reshape(-1, 3), dirs_t)
    rgb_map_t, _, _, _ = vr.volume_render(
        sig_t.reshape(n, s, 1), rgb_t.reshape(n, s, 3), z_t, rd_t
    )
    loss_t = torch.mean((rgb_map_t - torch.from_numpy(target)) ** 2)
    loss_t.backward()
    grads_t = {k: p.grad.numpy() for k, p in model.named_parameters()}

    # jax forward+grad
    params = params_from_torch_state_dict(model.state_dict(), cfg)

    def loss_fn(p):
        pts, z = sample_points_on_rays(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, s)
        dirs = jnp.broadcast_to(jnp.asarray(rd)[:, None, :], pts.shape)
        sig, rgb = apply_nerf(p, pts, dirs, cfg)
        out = volume_render(sig, rgb, z, jnp.asarray(rd))
        return jnp.mean((out.rgb - jnp.asarray(target)) ** 2)

    g = jax.grad(loss_fn)(params)

    np.testing.assert_allclose(
        float(loss_fn(params)), float(loss_t.detach()), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g["trunk"][0]["w"]).T, grads_t["layers.0.weight"], rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g["density"]["w"]).T, grads_t["density_head.weight"], rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g["color1"]["w"]).T, grads_t["color_layers.1.weight"], rtol=5e-3, atol=1e-6
    )
