"""In-kernel volume rendering (the ``fuse_composite`` engine mode).

The composited kernels (``ops/render_kernel.py`` ``composited=True``) run
sampling + MLP + volume rendering in one pallas_call. They are exact on TPU
(5.5e-6 vs the two-kernel pipeline, ``results/perf/fuse_probe.json``) and
kept as an opt-in; these interpret-mode gates pin their numerics against the
XLA path (reference math ``rendering.py:116-143``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig, RenderConfig, default_config
from nerf_tpu.models.nerf import apply_nerf, init_nerf_params
from nerf_tpu.ops.render_kernel import (
    composited_to_outputs,
    fused_render_samples_composited,
    fused_render_zvals_composited,
)
from nerf_tpu.utils.rendering import sample_points_on_rays, volume_render


@pytest.fixture(scope="module")
def setup():
    mcfg = ModelConfig()
    rcfg = RenderConfig(white_background=True)
    params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
    ro = jax.random.normal(jax.random.PRNGKey(1), (100, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(2), (100, 3))
    return mcfg, rcfg, params, ro, rd


def _xla_reference(params, ro, rd, z, mcfg, rcfg):
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
    sigma, rgb = apply_nerf(params, pts, dirs, mcfg,
                            compute_dtype=jnp.bfloat16)
    return volume_render(sigma, rgb, z, rd, rcfg)


def test_composited_uniform_matches_xla(setup):
    mcfg, rcfg, params, ro, rd = setup
    near, far, S = 2.0, 6.0, 64
    _, z = sample_points_on_rays(ro, rd, near, far, S)
    ref = _xla_reference(params, ro, rd, z, mcfg, rcfg)

    out8, wts, zk = fused_render_samples_composited(
        params, ro, rd, near, far, S, mcfg, interpret=True,
        with_weights=True, sentinel=rcfg.dist_sentinel,
        eps=rcfg.transmittance_eps,
    )
    got = composited_to_outputs(out8, wts, rcfg)
    np.testing.assert_allclose(np.asarray(zk), np.asarray(z), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(ref.rgb),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(ref.weights),
                               atol=5e-5)


def test_composited_zvals_matches_xla(setup):
    mcfg, rcfg, params, ro, rd = setup
    # non-uniform sorted depths, non-power-of-two S (the hierarchical shape)
    S = 96
    z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (100, S),
                                    minval=2.0, maxval=6.0), axis=-1)
    ref = _xla_reference(params, ro, rd, z, mcfg, rcfg)
    out8, wts = fused_render_zvals_composited(
        params, ro, rd, z, mcfg, interpret=True, with_weights=True,
        sentinel=rcfg.dist_sentinel, eps=rcfg.transmittance_eps,
    )
    got = composited_to_outputs(out8, wts, rcfg)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(ref.rgb),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(wts), np.asarray(ref.weights),
                               atol=5e-5)


def test_fused_engine_matches_xla_engine_both_modes():
    """End to end: PallasEngine(fuse_composite=True) against XLAEngine on a
    tiny frame, benchmark AND hierarchical modes."""
    from nerf_tpu.render.engines import PallasEngine, SharedModel, XLAEngine
    from nerf_tpu.utils.cameras import spherical_pose

    cfg = default_config()
    shared = SharedModel(cfg).load(None)
    xla = XLAEngine(shared, chunk_rays=1024)
    pal = PallasEngine(shared, chunk_rays=1024, fuse_composite=True)
    assert pal.composited_sample_eval_fn() is not None
    pose = spherical_pose(30.0, -30.0, 4.0)
    for mode in ("benchmark", "hierarchical"):
        a = xla.render_image(pose, (40, 30), 16, mode=mode, monitor=False)
        b = pal.render_image(pose, (40, 30), 16, mode=mode, monitor=False)
        assert np.max(np.abs(a.rgb - b.rgb)) < 5e-3, mode
        assert np.max(np.abs(a.depth - b.depth)) < 5e-2, mode


def test_raw_bf16_intermediate_close_to_f32():
    """The bf16-intermediate raw pipeline stays within bf16 rounding of the
    f32 pipeline (opt-in bandwidth mode, fuse_probe.json)."""
    from nerf_tpu.render.engines import PallasEngine, SharedModel
    from nerf_tpu.utils.cameras import spherical_pose

    cfg = default_config()
    shared = SharedModel(cfg).load(None)
    f32 = PallasEngine(shared, chunk_rays=1024)
    b16 = PallasEngine(shared, chunk_rays=1024, raw_dtype="bfloat16")
    pose = spherical_pose(30.0, -30.0, 4.0)
    a = f32.render_image(pose, (40, 30), 16, monitor=False)
    b = b16.render_image(pose, (40, 30), 16, monitor=False)
    assert np.max(np.abs(a.rgb - b.rgb)) < 1e-2
