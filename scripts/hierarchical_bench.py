"""Hierarchical (quality) path throughput: coarse uniform pass + importance
sampling + fine pass at merged depths — the path the reference's trainer
exercises per step (reference ``src/training/trainer.py:294-316``) and its
renderers' quality mode.

Measures the fully fused hierarchical branch (``render/engines.py``:
ray-blocked coarse pass -> one-dot_general ``sample_pdf`` -> ray-blocked
fine pass at per-ray depths) at the VERDICT cells and writes
results/perf/hierarchical.json — the committed artifact behind the README's
hierarchical claim.

Usage: python scripts/hierarchical_bench.py [--cells 400x300,800x600]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="400x300,800x600")
    ap.add_argument("--engines", default="pallas,xla")
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default="results/perf/hierarchical.json")
    args = ap.parse_args()

    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nerf_tpu.config import bmild_config
    from nerf_tpu.render.engines import ENGINE_CLASSES, SharedModel
    from nerf_tpu.utils.cameras import spherical_pose

    import dataclasses

    bmild = "/root/reference/data/lego_example_weights/model_fine_200000.npy"
    cfg = bmild_config()
    # hierarchical mode reads n_coarse/n_fine from cfg.render
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, n_coarse=args.coarse, n_fine=args.fine,
            use_importance=True,
        ),
    )
    shared = SharedModel(cfg).load(bmild if os.path.exists(bmild) else None)
    pose = spherical_pose(30.0, -30.0, 4.0)

    cells = []
    for c in args.cells.split(","):
        w, h = c.split("x")
        cells.append((int(w), int(h)))

    rows = []
    for name in args.engines.split(","):
        engine = ENGINE_CLASSES[name](shared)
        for (w, h) in cells:
            try:
                t0 = time.time()
                engine.render_image(pose, (w, h), args.coarse,
                                    mode="hierarchical", monitor=False)
                compile_s = time.time() - t0
                times = []
                for _ in range(args.frames):
                    r = engine.render_image(pose, (w, h), args.coarse,
                                            mode="hierarchical")
                    times.append(r.stats.wall_time_s)
                med = sorted(times)[len(times) // 2]
                row = {
                    "engine": name, "resolution": f"{w}x{h}",
                    "coarse": args.coarse, "fine": args.fine,
                    "frame_ms_median": med * 1e3,
                    "frame_ms_best": min(times) * 1e3,
                    "rays_per_second": w * h / med,
                    "samples_per_second": w * h * (2 * args.coarse + args.fine) / med,
                    "compile_s": compile_s,
                }
            except Exception as e:
                row = {"engine": name, "resolution": f"{w}x{h}",
                       "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {
        "config": {
            "mode": "hierarchical",
            "n_coarse": args.coarse, "n_fine": args.fine,
            "fine_pass_samples": args.coarse + args.fine,
            "frames": args.frames,
            "device": str(jax.devices()[0]),
            "weights": "bundled bmild lego fine/coarse",
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
