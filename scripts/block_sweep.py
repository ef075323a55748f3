"""MXU-schedule sweep: rows-per-grid-step (block_samples) in the ray-blocked
render kernels vs throughput.

docs/PERF.md's ceiling analysis names the untested lever: the trunk matmuls
are [block, 256] x [256, 256]; a 2048-row block only half-fills the MXU
pipeline relative to its deeper sweet spot. Wider blocks trade VMEM
(activations scale with block) for pipeline depth. This script measures the
pallas and compressed engines at the headline cell (800x600 @ 64 spp,
benchmark mode, bundled lego weights) across block widths and writes
results/perf/block_sweep.json.

Usage: python scripts/block_sweep.py [--blocks 2048,4096,8192,16384]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="2048,4096,8192,16384")
    ap.add_argument("--engines", default="pallas,compressed")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default="results/perf/block_sweep.json")
    args = ap.parse_args()

    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nerf_tpu.config import bmild_config
    from nerf_tpu.render.engines import ENGINE_CLASSES, SharedModel
    from nerf_tpu.utils.cameras import spherical_pose

    bmild = "/root/reference/data/lego_example_weights/model_fine_200000.npy"
    cfg = bmild_config()
    shared = SharedModel(cfg).load(bmild if os.path.exists(bmild) else None)
    pose = spherical_pose(30.0, -30.0, 4.0)
    res = (args.width, args.height)
    n_rays = args.width * args.height

    blocks = [int(b) for b in args.blocks.split(",")]
    engines = args.engines.split(",")
    rows = []
    for name in engines:
        for bs in blocks:
            engine = ENGINE_CLASSES[name](shared, block_samples=bs)
            try:
                t0 = time.time()
                engine.render_image(pose, res, args.samples, monitor=False)
                compile_s = time.time() - t0
                times = []
                for _ in range(args.frames):
                    r = engine.render_image(pose, res, args.samples)
                    times.append(r.stats.wall_time_s)
                best = min(times)
                med = sorted(times)[len(times) // 2]
                row = {
                    "engine": name, "block_samples": bs,
                    "frame_ms_median": med * 1e3, "frame_ms_best": best * 1e3,
                    "rays_per_second": n_rays / med,
                    "compile_s": compile_s,
                }
            except Exception as e:
                row = {"engine": name, "block_samples": bs,
                       "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {
        "config": {"resolution": list(res), "samples": args.samples,
                   "frames": args.frames,
                   "device": str(jax.devices()[0])},
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
