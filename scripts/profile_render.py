"""Capture a device trace of the headline render (800x600 @ 64 spp, pallas
engine, bundled lego weights) and aggregate device time by op — the
trace-backed bottleneck analysis behind docs/PERF.md.

Writes results/perf/trace_summary.json (per-op device microseconds over N
frames) and prints the table. The raw profiler dump (xplane + perfetto
trace) stays in a temp dir — only the aggregate is committed.

Usage: python scripts/profile_render.py [--frames 5] [--out results/perf]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile


def aggregate_trace(trace_dir):
    """Sum 'X' (complete) events on TPU tracks by op name, in microseconds."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(paths[0]))
    events = data.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e.get("pid")] = e["args"].get("name", "")
    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_names.get(e.get("pid"), "")
        if "TPU" not in pname:
            continue
        # the 'XLA Ops' track carries per-op timing; module/step tracks
        # duplicate the same wall span
        by_op[e["name"]] += e.get("dur", 0.0)
    return by_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--mode", default="benchmark",
                    choices=["benchmark", "hierarchical"])
    ap.add_argument("--out", default="results/perf")
    args = ap.parse_args()

    import jax

    from nerf_tpu.config import bmild_config
    from nerf_tpu.render.engines import ENGINE_CLASSES, SharedModel
    from nerf_tpu.utils.cache import enable_compilation_cache
    from nerf_tpu.utils.cameras import spherical_pose

    enable_compilation_cache()

    bmild = "/root/reference/data/lego_example_weights/model_fine_200000.npy"
    cfg = bmild_config()
    shared = SharedModel(cfg).load(bmild if os.path.exists(bmild) else None)
    engine = ENGINE_CLASSES[args.engine](shared)
    pose = spherical_pose(30.0, -30.0, 4.0)
    res = (args.width, args.height)

    # warm/compile outside the trace
    r = engine.render_image(pose, res, args.samples, mode=args.mode)
    print(f"warm: {r.stats.wall_time_s:.3f}s "
          f"({args.width*args.height/r.stats.wall_time_s:,.0f} rays/s)",
          file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="nerf_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(args.frames):
            r = engine.render_image(pose, res, args.samples, mode=args.mode,
                                    monitor=False)
        float(r.rgb[0, 0, 0].item()) if hasattr(r.rgb[0, 0, 0], "item") else None

    by_op = aggregate_trace(tmp)
    os.makedirs(args.out, exist_ok=True)
    frame_us = {}
    # the jit_render umbrella event double-counts its children; report both
    rows = []
    for name, us in by_op.most_common(40):
        rows.append({"op": name, "device_us_total": us,
                     "device_us_per_frame": us / args.frames})
    summary = {
        "config": {"resolution": res, "samples": args.samples,
                   "engine": args.engine, "mode": args.mode,
                   "frames": args.frames,
                   "device": str(jax.devices()[0])},
        "steady_state_rays_per_s": args.width * args.height
        / r.stats.wall_time_s if r.stats.wall_time_s else None,
        "ops": rows,
    }
    path = os.path.join(args.out,
                        f"trace_{args.mode}_{args.width}x{args.height}"
                        f"_s{args.samples}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)
    for row in rows[:20]:
        print(f"{row['device_us_per_frame']:>12,.0f} us/frame  {row['op'][:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
