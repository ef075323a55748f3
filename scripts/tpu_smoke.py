"""Real-TPU lowering smoke gate: compile+run every engine x render mode.

Interpret-mode pytest verifies kernel *semantics* but provably cannot catch
Mosaic *lowering* hangs — round 3 shipped a planar kernel default that passed
the whole suite and then hung the TPU compiler for >300 s (BENCH_r03 rc=124,
no headline at HEAD). This script is the gate that makes that class of
failure impossible to ship again:

- every cell (engine x {benchmark, hierarchical}) runs in its OWN subprocess
  with a hard wall-clock timeout (process-group kill, so a wedged XLA/Mosaic
  compile cannot outlive its budget),
- the frame is small but the chunk/spp shapes are the HEADLINE shapes
  (chunk=16384 rays @ 64 spp), so passing smoke also warms the exact
  executables bench.py and the benchmark grid use,
- output is one loud PASS/FAIL table + results/smoke/tpu_smoke.json
  (commit hash, per-cell seconds, rgb stats), nonzero exit on any failure.

Ritual: run before every end-of-round commit; commit the JSON.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_smoke.py

Analog of the reference's availability probing
(``/root/reference/src/benchmark/benchmark_suite.py:45-94``) — but for
compiler lowering, which no in-process probe can bound.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BMILD = "/root/reference/data/lego_example_weights/model_fine_200000.npy"
# pallas_fused = PallasEngine(fuse_composite=True), the opt-in in-kernel
# compositing path (results/perf/fuse_probe.json) — gated here so the
# opt-in cannot silently rot into a lowering hang
ENGINES = ["xla", "pallas", "pallas_fused", "compressed", "int8", "accel"]
MODES = ["benchmark", "hierarchical"]


def run_cell(engine: str, mode: str, spp: int, width: int, height: int) -> int:
    """Child: construct the engine, render one frame, print one JSON line."""
    import numpy as np

    sys.path.insert(0, REPO)
    import jax

    from nerf_tpu.config import bmild_config, default_config
    from nerf_tpu.render.engines import ENGINE_CLASSES, SharedModel
    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    cfg, ckpt = (bmild_config(), BMILD) if os.path.exists(BMILD) else (
        default_config(), None)
    shared = SharedModel(cfg).load(ckpt)
    if engine == "pallas_fused":
        eng = ENGINE_CLASSES["pallas"](shared, fuse_composite=True)
    else:
        eng = ENGINE_CLASSES[engine](shared)

    t0 = time.time()
    out = eng.render_image(_pose(), (width, height), spp,
                           mode=mode, monitor=False)
    dt = time.time() - t0
    rgb = np.asarray(out.rgb)
    ok = bool(np.isfinite(rgb).all())
    print(json.dumps({
        "cell": f"{engine}:{mode}", "platform": platform,
        "seconds": round(dt, 1), "rgb_mean": round(float(rgb.mean()), 4),
        "rgb_std": round(float(rgb.std()), 4), "finite": ok,
    }), flush=True)
    return 0 if ok else 3


def _pose():
    from nerf_tpu.utils.cameras import spherical_pose

    return spherical_pose(30.0, -30.0, 4.0)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cell", help="internal: run one engine:mode child")
    ap.add_argument("--engines", default=",".join(ENGINES))
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--timeout", type=float, default=420.0,
                    help="hard per-cell wall-clock budget, seconds "
                         "(compile through the tunnel is ~1-3 min cold)")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--out", default=os.path.join(REPO, "results", "smoke"))
    ap.add_argument("--allow-cpu", action="store_true",
                    help="permit non-TPU platforms (interpret-mode kernels; "
                         "does NOT validate Mosaic lowering)")
    args = ap.parse_args()

    if args.cell:
        engine, mode = args.cell.split(":")
        return run_cell(engine, mode, args.spp, args.width, args.height)

    import jax

    platform = jax.devices()[0].platform
    if platform != "tpu" and not args.allow_cpu:
        print(f"FAIL: platform is {platform!r}, not TPU — this gate exists "
              "to validate Mosaic lowering on real hardware "
              "(pass --allow-cpu to run anyway)", file=sys.stderr)
        return 2

    cells = [(e, m) for e in args.engines.split(",")
             for m in args.modes.split(",")]
    results, failed = [], []
    for engine, mode in cells:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--cell", f"{engine}:{mode}", "--spp", str(args.spp),
               "--width", str(args.width), "--height", str(args.height)]
        t0 = time.time()
        # own process group: a wedged Mosaic compile ignores SIGTERM-to-child
        # semantics through Python, so we kill the whole group on timeout
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                start_new_session=True, cwd=REPO)
        try:
            out, err = proc.communicate(timeout=args.timeout)
            dt = time.time() - t0
            line = out.strip().splitlines()[-1] if out.strip() else "{}"
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {}
            rec.update(cell=f"{engine}:{mode}", rc=proc.returncode,
                       wall_seconds=round(dt, 1))
            if proc.returncode != 0:
                rec["status"] = "FAIL"
                rec["stderr_tail"] = err.strip().splitlines()[-5:]
                failed.append(rec)
            else:
                rec["status"] = "PASS"
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            rec = {"cell": f"{engine}:{mode}", "status": "COMPILE-HANG",
                   "rc": None, "wall_seconds": round(time.time() - t0, 1),
                   "note": f"killed at {args.timeout:.0f}s — Mosaic/XLA "
                           "lowering did not complete"}
            failed.append(rec)
        results.append(rec)
        print(f"  {rec['cell']:<24} {rec['status']:<12} "
              f"{rec['wall_seconds']:>7.1f}s  "
              f"rgb_mean={rec.get('rgb_mean', '-')}", flush=True)

    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    os.makedirs(args.out, exist_ok=True)
    payload = {
        "commit": head, "platform": platform,
        "config": {"spp": args.spp, "width": args.width,
                   "height": args.height, "timeout_s": args.timeout},
        "cells": results,
        "passed": len(results) - len(failed), "failed": len(failed),
    }
    path = os.path.join(args.out, "tpu_smoke.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\nsmoke: {payload['passed']}/{len(results)} cells green "
          f"at {head[:9]} -> {path}")
    if failed:
        print("FAILED CELLS:", file=sys.stderr)
        for rec in failed:
            print(f"  {rec['cell']}: {rec['status']} "
                  f"{rec.get('note', '')}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
