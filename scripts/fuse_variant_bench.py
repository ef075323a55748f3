"""Reproduce the in-kernel-compositing probe (results/perf/fuse_probe.json).

Benchmarks the three shipping configurations of the pallas render path at
the headline workload (lego bmild, 800x600 @ 64 spp):

  raw       — two-kernel raw interleaved pipeline (the default)
  raw_bf16  — same, with the [N, 4S] intermediate in bfloat16
  fused     — volume rendering fused into the render kernel
              (fuse_composite=True; exact, single pallas_call, measured
              slower — see fuse_probe.json for the ablation matrix)

The finer-grained ablations recorded in fuse_probe.json (zeros / novpu /
mm_scan / hybrid / sandwich) were one-off kernel-body edits; their numbers
and failure modes are preserved in the JSON.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.config import bmild_config
from nerf_tpu.render.engines import PallasEngine, SharedModel
from nerf_tpu.utils.cache import enable_compilation_cache
from nerf_tpu.utils.cameras import focal_from_angle, spherical_pose

BMILD = "/root/reference/data/lego_example_weights/model_fine_200000.npy"


def main():
    enable_compilation_cache()
    cfg = bmild_config()
    shared = SharedModel(cfg).load(BMILD)
    engines = {
        "raw": PallasEngine(shared, chunk_rays=16384),
        "raw_bf16": PallasEngine(shared, chunk_rays=16384,
                                 raw_dtype="bfloat16"),
        "fused": PallasEngine(shared, chunk_rays=16384, fuse_composite=True),
    }
    W, H, SPP = 800, 600, 64
    focal = focal_from_angle(W, 0.6911112070083618)
    ref_rgb = None
    for name, eng in engines.items():
        t0 = time.time()
        first = eng.render_image(spherical_pose(47.0, -30.0, 4.0), (W, H),
                                 SPP, focal=focal, monitor=False)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        if ref_rgb is None:
            ref_rgb = first.rgb
        else:
            print(f"{name}: rgb maxabs vs raw "
                  f"{np.max(np.abs(first.rgb - ref_rgb)):.2e}", flush=True)
        ts = []
        for i in range(4):
            r = eng.render_image(spherical_pose(30.0 + 17 * i, -30.0, 4.0),
                                 (W, H), SPP, focal=focal, monitor=True)
            ts.append(r.stats.wall_time_s)
        t = float(np.median(ts))
        print(f"{name}: median {t:.3f}s = {W*H/t:,.0f} rays/s  "
              f"(all: {[round(x, 3) for x in ts]})", flush=True)


if __name__ == "__main__":
    main()
