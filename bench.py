"""Headline benchmark: lego 800x600 @ 64 samples/ray, fused-Pallas engine.

Prints ONE JSON line:
  {"metric": "rays_per_second", "value": N, "unit": "rays/s",
   "vs_baseline": N / 21238}

Baseline: the reference's best backend (PyTorch MPS on M3 Pro) at the same
config — 22.6 s/frame = 21,238 rays/s (BASELINE.md; reference
``FINAL_INVESTIGATION_SUMMARY.md:66-71``). Uses the bundled original-NeRF
lego weights so the workload is a real trained model. Progress goes to
stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


BASELINE_RAYS_PER_S = 800 * 600 / 22.6   # reference M3 MPS full-frame
BMILD = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import bmild_config, default_config
    from nerf_tpu.render.engines import PallasEngine, SharedModel, XLAEngine
    from nerf_tpu.utils.cache import enable_compilation_cache
    from nerf_tpu.utils.cameras import focal_from_angle, spherical_pose
    from nerf_tpu.utils.monitor import sync

    enable_compilation_cache()

    W, H, SPP = 800, 600, 64
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        # CPU fallback (keeps bench.py runnable anywhere): tiny frame, XLA engine
        W, H, SPP = 80, 60, 16

    if os.path.exists(BMILD):
        cfg, ckpt = bmild_config(), BMILD
    else:
        cfg, ckpt = default_config(), None
    shared = SharedModel(cfg).load(ckpt)
    engine = (PallasEngine if on_tpu else XLAEngine)(shared, chunk_rays=16384)

    focal = focal_from_angle(W, 0.6911112070083618)
    poses = [spherical_pose(30.0 + 17.0 * i, -30.0, 4.0) for i in range(4)]

    log(f"device: {jax.devices()[0]}  config: {W}x{H}@{SPP}")
    t0 = time.time()
    engine.render_image(poses[0], (W, H), SPP, focal=focal, monitor=False)
    log(f"compile+first render: {time.time() - t0:.1f}s")

    times = []
    for i, pose in enumerate(poses[1:], 1):
        res = engine.render_image(pose, (W, H), SPP, focal=focal, monitor=True)
        times.append(res.stats.wall_time_s)
        log(f"view {i}: {res.stats.wall_time_s:.3f}s "
            f"({W * H / res.stats.wall_time_s:,.0f} rays/s) "
            f"rgb mean {res.rgb.mean():.3f}")

    t = float(np.median(times))
    rays_per_s = W * H / t
    print(json.dumps({
        "metric": "rays_per_second",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
