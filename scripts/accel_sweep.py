"""Accel-engine probe sweep: ground-truth quality vs throughput across
(probe_resolution, n_probe) at small sample budgets.

The committed GT gate (results/benchmark) showed accel@16 reaches uniform-64
quality, but its z-sampler (XLA grid gathers) costs ~2x the 16-spp MLP work,
so pallas@64 still wins net rays/s at that quality. This sweep prices the
probe-side levers: a dilated occupancy mip (``downsample_grid``) lets fewer
probes cover the scene conservatively. Writes results/perf/accel_sweep.json.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", default="400x300")
    ap.add_argument("--spps", default="16,32")
    ap.add_argument("--gt_spp", type=int, default=256)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default="results/perf/accel_sweep.json")
    args = ap.parse_args()

    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import bmild_config
    from nerf_tpu.render.engines import (
        AccelEngine,
        PallasEngine,
        SharedModel,
        XLAEngine,
    )
    from nerf_tpu.utils.cameras import BENCHMARK_FOCAL, orbit_poses
    from nerf_tpu.utils.metrics import psnr

    W, H = (int(v) for v in args.resolution.split("x"))
    spps = [int(s) for s in args.spps.split(",")]
    shared = SharedModel(bmild_config()).load(
        "/root/reference/data/lego_example_weights/model_fine_200000.npy"
    )
    pose = orbit_poses(2)[0]     # the suite's view 0 (the informative one)

    print("rendering ground truth...", file=sys.stderr, flush=True)
    gt = XLAEngine(shared).render_image(
        pose, (W, H), args.gt_spp, monitor=False
    ).rgb

    def score(engine, spp):
        engine.render_image(pose, (W, H), spp, monitor=False)   # warm
        times = []
        for _ in range(args.frames):
            r = engine.render_image(pose, (W, H), spp)
            times.append(r.stats.wall_time_s)
        t = sorted(times)[len(times) // 2]
        p = float(psnr(jnp.asarray(r.rgb), jnp.asarray(gt)))
        return {"psnr_db_vs_gt": p, "rays_per_second": W * H / t,
                "frame_ms": t * 1e3}

    rows = []
    # uniform baselines at the same budgets + the quality-matched pallas@64
    pallas = PallasEngine(shared)
    for spp in sorted(set(spps + [64])):
        row = {"engine": "pallas", "spp": spp, **score(pallas, spp)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    grid_variants = [
        {"probe_resolution": 0, "n_probe": 128,      # original full-grid
         "probe_ray_stride": 1},                     # baseline
        {"probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 1},
        {"probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 4},
        {"probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 8},
        {"probe_resolution": 32, "n_probe": 48, "probe_ray_stride": 4},
        {"probe_resolution": 32, "n_probe": 48, "probe_ray_stride": 8},
    ]
    for gv in grid_variants:
        engine = AccelEngine(shared, **gv)
        for spp in spps:
            try:
                row = {"engine": "accel", "spp": spp, **gv,
                       **score(engine, spp)}
            except Exception as e:
                row = {"engine": "accel", "spp": spp, **gv,
                       "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {
        "config": {
            "resolution": args.resolution, "gt_spp": args.gt_spp,
            "gt_engine": "xla", "frames": args.frames,
            "device": str(jax.devices()[0]),
            "view": "orbit view 0", "weights": "bundled bmild lego",
        },
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
