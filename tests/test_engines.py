"""Engine + benchmark-suite tests on CPU with tiny shapes (reference analog:
``test_new_renderers.py`` + ``test_system.py:290-333`` mini end-to-end render
with a fake checkpoint)."""

import os

import numpy as np
import jax
import pytest

from nerf_tpu.bench.suite import UnifiedBenchmarkSuite
from nerf_tpu.config import Config, bmild_config
from nerf_tpu.render.engines import (
    ENGINE_CLASSES,
    SharedModel,
    XLAEngine,
    available_engines,
)
from nerf_tpu.utils.cameras import orbit_poses

BMILD_WEIGHTS = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


@pytest.fixture(scope="module")
def shared_random():
    """Random-weights fallback — the reference's fake-checkpoint test pattern
    (``test_system.py:195-201``, ``base_renderer.py:62-76``)."""
    return SharedModel(Config()).load(None)


def test_engine_registry_probes_all(shared_random):
    engines = available_engines(shared_random)
    assert set(engines) == {"xla", "pallas", "compressed", "int8", "accel"}


def test_xla_engine_renders(shared_random):
    e = XLAEngine(shared_random, chunk_rays=512)
    res = e.render_image(orbit_poses(2)[0], (24, 18), samples_per_ray=8)
    assert res.rgb.shape == (18, 24, 3)
    assert res.depth.shape == (18, 24)
    assert np.all(np.isfinite(res.rgb))
    assert res.stats.wall_time_s > 0


def test_all_engines_agree_on_bmild_weights():
    """The unified-benchmark invariant: same weights -> (nearly) same image
    across execution methods. The reference only eyeballed this
    (``compare_renderers.py``); here it is an assertion."""
    from nerf_tpu.utils.cameras import focal_from_angle

    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    engines = available_engines(shared)
    # orbit pose 0 is the only one that faces the scene: the reference's
    # pose generator rotates the camera in place at (0,0,4)
    # (``benchmark_suite.py:132-149``), it does not orbit the object.
    pose = orbit_poses(4)[0]
    focal = focal_from_angle(32, 0.6911112070083618)  # proportional FOV
    imgs = {}
    for name, e in engines.items():
        e.chunk_rays = 512
        res = e.render_image(
            pose, (32, 24), samples_per_ray=12, focal=focal, monitor=False
        )
        imgs[name] = res.rgb
    # xla vs pallas: same math, bf16-vs-interpret differences only
    np.testing.assert_allclose(imgs["xla"], imgs["pallas"], atol=0.03)
    # compressed: int8 tolerance
    np.testing.assert_allclose(imgs["xla"], imgs["compressed"], atol=0.15)
    # and it must not be a black/blank frame
    assert imgs["xla"].std() > 0.02


def test_compressed_engine_uses_fused_paths(shared_random):
    """CompressedEngine inherits the ray-blocked fused kernels: both eval
    hooks are non-None and a hierarchical render (coarse fused pass +
    fine fused zvals pass, quantized weights) completes."""
    from nerf_tpu.render.engines import CompressedEngine

    e = CompressedEngine(shared_random, chunk_rays=512)
    assert e.sample_eval_fn() is not None
    assert e.zvals_eval_fn() is not None
    res = e.render_image(
        orbit_poses(2)[0], (16, 12), samples_per_ray=8, mode="hierarchical",
        monitor=False,
    )
    assert res.rgb.shape == (12, 16, 3)
    assert np.all(np.isfinite(res.rgb))


def test_hierarchical_mode(shared_random):
    e = XLAEngine(shared_random, chunk_rays=512)
    res = e.render_image(
        orbit_poses(2)[0], (16, 12), samples_per_ray=8, mode="hierarchical"
    )
    assert res.rgb.shape == (12, 16, 3)


def test_benchmark_suite_end_to_end(tmp_path, shared_random):
    """Mini sweep -> results, CSV, JSON, chart, sample renders (reference
    ``test_integration.py:100-151`` at 100x75@16x1)."""
    suite = UnifiedBenchmarkSuite(Config(), output_dir=str(tmp_path))
    suite.add_available_renderers(names=["xla"])
    suite.engines["xla"].chunk_rays = 512
    results = suite.run_benchmark(
        None, resolutions=[(40, 30)], samples=[8], n_views=2
    )
    # one row PER VIEW (reference ``benchmark_suite.py:180-233``)
    assert len(results) == 2
    assert [r.view_idx for r in results] == [0, 1]
    assert all(r.success and r.rays_per_second > 0 for r in results)
    paths = suite.generate_report()
    assert os.path.exists(paths["csv"])
    assert os.path.exists(paths["json"])
    assert os.path.exists(paths["chart"])
    assert os.path.exists(
        tmp_path / "sample_renders" / "xla" / "view0_40x30_s8_rgb.png"
    )


def test_benchmark_fault_isolation(tmp_path, shared_random):
    """A failing engine records an unsuccessful row, doesn't abort the sweep
    (reference ``benchmark_suite.py:212-216``)."""
    suite = UnifiedBenchmarkSuite(Config(), output_dir=str(tmp_path))
    suite.add_available_renderers(names=["xla"])

    class Boom(Exception):
        pass

    def explode(*a, **k):
        raise Boom("synthetic failure")

    suite.engines["xla"].render_image = explode
    results = suite.run_benchmark(None, resolutions=[(16, 12)], samples=[4],
                                  n_views=1)
    assert len(results) == 1
    assert not results[0].success
    assert "Boom" in results[0].error


def test_quality_report(tmp_path):
    from nerf_tpu.config import bmild_config

    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    suite = UnifiedBenchmarkSuite(bmild_config(), output_dir=str(tmp_path))
    suite.shared = shared
    suite.engines = available_engines(shared, names=["xla", "compressed"])
    for e in suite.engines.values():
        e.chunk_rays = 512
    report = suite.quality_report(resolutions=[(32, 24), (24, 18)], spp=8,
                                  focal=25.0, n_views=2)
    assert "compressed" in report
    assert report["compressed"]["psnr_db"] > 20.0
    assert report["compressed"]["ssim"] > 0.7
    # SSIM is clamped to a possible value and the gate covers 2 views x 2
    # resolutions (VERDICT round-2: one hardcoded view was too thin)
    assert report["compressed"]["ssim"] <= 1.0
    assert report["compressed"]["ssim_min"] <= report["compressed"]["ssim"]
    assert len(report["compressed"]["cells"]) == 4
    suite.generate_report()
    import json

    with open(tmp_path / "benchmark_results.json") as f:
        data = json.load(f)
    assert "quality" in data and "compressed" in data["quality"]


def test_gt_quality_report(tmp_path):
    """Ground-truth-anchored gate: engines scored at several spp against a
    high-spp truth, with per-cell rays/s (the accel engine's value proof)."""
    shared = SharedModel(bmild_config()).load(BMILD_WEIGHTS)
    suite = UnifiedBenchmarkSuite(bmild_config(), output_dir=str(tmp_path))
    suite.shared = shared
    suite.engines = available_engines(shared, names=["xla"])
    for e in suite.engines.values():
        e.chunk_rays = 512
    report = suite.gt_quality_report(
        resolution=(32, 24), gt_spp=32, spps=(8, 32), focal=25.0, n_views=1
    )
    assert report["_meta"]["gt_spp"] == 32
    cells = report["xla"]
    assert set(cells) == {"8", "32"}
    # the GT engine at the GT's own spp is the same deterministic render:
    # the gate must score it as a near-perfect match
    assert cells["32"]["psnr_db_vs_gt"] > 60.0
    assert cells["32"]["psnr_db_vs_gt"] > cells["8"]["psnr_db_vs_gt"]
    assert all(c["rays_per_second"] > 0 for c in cells.values())


def test_pth_checkpoint_ingestion(tmp_path):
    """A reference-format torch checkpoint ({'coarse_model': state_dict,
    'fine_model': state_dict}, the dict the reference trainer writes at
    ``trainer.py:374-388`` and its benchmark consumes via ``torch.load`` at
    ``base_renderer.py:42``) loads directly into SharedModel and renders —
    the 'same trained weights, any ecosystem' loop, inbound direction
    (cmd_export is the outbound one)."""
    torch = pytest.importorskip("torch")

    from nerf_tpu.models.nerf import (
        init_nerf_params,
        params_to_torch_state_dict,
    )

    cfg = Config()
    kc, kf = jax.random.split(jax.random.PRNGKey(7))
    truth = {
        "coarse": init_nerf_params(kc, cfg.model),
        "fine": init_nerf_params(kf, cfg.model),
    }
    path = tmp_path / "final_model.pth"
    torch.save(
        {
            "coarse_model": {
                k: torch.from_numpy(np.asarray(v).copy())
                for k, v in params_to_torch_state_dict(truth["coarse"]).items()
            },
            "fine_model": {
                k: torch.from_numpy(np.asarray(v).copy())
                for k, v in params_to_torch_state_dict(truth["fine"]).items()
            },
            "optimizer": {},  # extra reference keys must be ignored
            "train_losses": [1.0, 0.5],
        },
        str(path),
    )

    shared = SharedModel(cfg).load(str(path))
    for net in ("coarse", "fine"):
        for a, b in zip(jax.tree.leaves(truth[net]),
                        jax.tree.leaves(shared.params[net])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    eng = XLAEngine(shared, chunk_rays=256)
    out = eng.render_image(orbit_poses(1, radius=4.0)[0], (16, 12), 8,
                           focal=12.0, monitor=False)
    assert np.isfinite(out.rgb).all()


@pytest.mark.parametrize("engine_name", ["pallas", "compressed", "accel"])
def test_hierarchical_mode_kernel_engines(shared_random, engine_name):
    """The fused hierarchical path (raw coarse pass -> sample_pdf -> raw
    fine pass -> interleaved compositor) for every Pallas-family engine —
    the round-4 smoke run caught this path failing on TPU while only the
    XLA engine's hierarchical mode was under test."""
    e = ENGINE_CLASSES[engine_name](shared_random, chunk_rays=512)
    res = e.render_image(
        orbit_poses(2)[0], (16, 12), samples_per_ray=8, mode="hierarchical",
        monitor=False,
    )
    assert res.rgb.shape == (12, 16, 3)
    assert np.isfinite(res.rgb).all()
