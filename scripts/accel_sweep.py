"""Accel-engine sweep v2: ground-truth quality vs throughput across BOTH
the probe-cost levers (probe_resolution, n_probe, ray stride — round 4) and
the quality-side levers the round-4 VERDICT flagged as unprobed: grid 256
with a 128 mip, and probe pdfs weighted by the BAKED DENSITY instead of
binary occupancy ("alpha" / "transmittance" weight modes — the latter is a
coarse NeRF pass priced at a memory gather, ``ops/occupancy.py``).

Scored on look-at-origin gate poses (mean of 2 informative views).
Writes results/perf/accel_sweep.json.
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
    from nerf_tpu.utils.cameras import gate_poses
    from nerf_tpu.utils.metrics import psnr

    W, H = (int(v) for v in args.resolution.split("x"))
    spps = [int(s) for s in args.spps.split(",")]
    shared = SharedModel(bmild_config()).load(
        "/root/reference/data/lego_example_weights/model_fine_200000.npy"
    )
    poses = gate_poses(2)        # look-at-origin: every view informative

    print("rendering ground truth...", file=sys.stderr, flush=True)
    gts = [XLAEngine(shared).render_image(
        p, (W, H), args.gt_spp, monitor=False).rgb for p in poses]

    def score(engine, spp):
        engine.render_image(poses[0], (W, H), spp, monitor=False)   # warm
        psnrs, times = [], []
        for v, pose in enumerate(poses):
            for _ in range(args.frames):
                r = engine.render_image(pose, (W, H), spp)
                times.append(r.stats.wall_time_s)
            psnrs.append(float(psnr(jnp.asarray(r.rgb),
                                    jnp.asarray(gts[v]))))
        t = sorted(times)[len(times) // 2]
        return {"psnr_db_vs_gt": float(np.mean(psnrs)),
                "psnr_db_per_view": [round(p, 2) for p in psnrs],
                "rays_per_second": W * H / t,
                "frame_ms": t * 1e3}

    rows = []
    # uniform baselines at the same budgets + quality-matched pallas points
    pallas = PallasEngine(shared)
    for spp in sorted(set(spps + [64, 128])):
        row = {"engine": "pallas", "spp": spp, **score(pallas, spp)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    grid_variants = [
        # round-4 probe-cost winners (binary occupancy)
        {"probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 4},
        # quality-side levers (VERDICT r4 task 5)
        {"grid_resolution": 256, "probe_resolution": 128, "n_probe": 128,
         "probe_ray_stride": 4},
        {"grid_store": "density", "weight_mode": "transmittance",
         "probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 4},
        {"grid_store": "density", "weight_mode": "alpha",
         "probe_resolution": 64, "n_probe": 96, "probe_ray_stride": 4},
        {"grid_resolution": 256, "grid_store": "density",
         "weight_mode": "transmittance", "probe_resolution": 128,
         "n_probe": 128, "probe_ray_stride": 4},
        {"grid_resolution": 256, "grid_store": "density",
         "weight_mode": "transmittance", "probe_resolution": 0,
         "n_probe": 192, "probe_ray_stride": 4},
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
            "views": "gate_poses(2) look-at-origin, mean PSNR",
            "weights": "bundled bmild lego",
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
