"""Closed-loop interop: weights exported by this framework render identically
through the REFERENCE'S OWN consuming code.

Round-4 had each half-proof (``.pth`` ingestion test, ``cmd_export``
round-trip test); this closes the loop: our params -> the ``cmd_export``
payload (``cli/main.py:cmd_export``) -> ``torch.save`` -> the reference's
``SharedNeRFModel.load_models`` (``base_renderer.py:28-78``) -> a render via
its ``PyTorchCPURenderer`` (``pytorch_renderers.py:99-170``) -> compared
against our ``xla`` engine's render of the same pose. "Same trained weights,
either ecosystem" becomes a single executed assertion.
"""

import numpy as np
import jax
import pytest

import torch

from nerf_tpu.config import Config
from nerf_tpu.models.nerf import init_nerf_params, params_to_torch_state_dict
from nerf_tpu.utils.cameras import orbit_poses
from nerf_tpu.utils.metrics import psnr


@pytest.mark.parametrize("spp", [16])
def test_exported_pth_renders_identically_in_reference(
    reference_src, tmp_path, spp
):
    cfg = Config()  # reference-variant model, white_background=False
    kc, kf = jax.random.split(jax.random.PRNGKey(3))
    params = {
        "coarse": init_nerf_params(kc, cfg.model),
        "fine": init_nerf_params(kf, cfg.model),
    }

    # the cmd_export payload (cli/main.py:cmd_export), written to disk
    pth = tmp_path / "exported.pth"
    torch.save(
        {
            "coarse_model": {
                k: torch.from_numpy(v.copy())
                for k, v in params_to_torch_state_dict(params["coarse"]).items()
            },
            "fine_model": {
                k: torch.from_numpy(v.copy())
                for k, v in params_to_torch_state_dict(params["fine"]).items()
            },
            "config": {},
        },
        pth,
    )

    # --- the reference's own load + render path
    from src.benchmark.pytorch_renderers import PyTorchCPURenderer

    r = PyTorchCPURenderer()
    r.setup(str(pth))
    W, H = 32, 24
    pose = orbit_poses(2)[1]
    with torch.no_grad():
        rgb_t, depth_t = r.render_image(torch.from_numpy(pose), (W, H), spp)
    rgb_ref = rgb_t.numpy()

    # --- our xla engine, same weights (in memory), same pose/conventions
    from nerf_tpu.render.engines import SharedModel, XLAEngine

    shared = SharedModel(cfg)
    shared.params = params
    ours = XLAEngine(shared, chunk_rays=W * H).render_image(
        pose, (W, H), spp, focal=800.0, monitor=False
    )

    p = float(psnr(np.asarray(ours.rgb, np.float32), rgb_ref))
    assert p >= 40.0, f"cross-ecosystem render PSNR {p:.1f} dB < 40"
    np.testing.assert_allclose(ours.rgb, rgb_ref, rtol=5e-3, atol=5e-3)
