"""Mosaic lowering probe for planar-output strategies (round-3 regression).

The planar 4-plane writer (``render_kernel._plane_writer``: one-hot matmul
scatter) hangs Mosaic lowering on TPU (BENCH_r03 rc=124). This probe
compiles candidate formulations in subprocesses with hard timeouts to find
one that lowers, before any of them ships as a default:

  multi_out   — 4-output pallas_call writing zeros (isolates: is the
                multi-output plumbing itself the hang?)
  matmul      — the round-3 one-hot matmul scatter (expected: hang)
  reshape     — plane = raw_column.reshape(R_b, S) (r-major layout makes
                the [B,1] column *be* the plane; relayout, no matmul)
  strided     — plane via strided ref store: out_ref[:, s::?] — not
                expressible; instead per-channel jnp row-slice reshape
  composite   — de-interleave inside the *compositor* kernel: consume the
                render kernel's interleaved [B,4] output directly and build
                [R,S] planes in VMEM there (no change to the render kernel)

Each cell prints compile+run seconds or is killed at the timeout.
Writes results/perf/planar_probe.json.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(variant: str, R_b: int, S: int, n_blocks: int) -> int:
    import numpy as np

    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = R_b * S
    R = R_b * n_blocks
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.standard_normal((R * S, 4)), jnp.float32)

    plane_spec = pl.BlockSpec((R_b, S), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    plane_shape = jax.ShapeDtypeStruct((R, S), jnp.float32)
    in_spec = pl.BlockSpec((B, 4), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    if variant == "multi_out":
        def kernel(x_ref, *out_refs):
            v = jnp.sum(x_ref[:])
            for o in out_refs:
                o[:] = jnp.zeros((R_b, S), jnp.float32) + v

    elif variant == "matmul":
        def kernel(x_ref, *out_refs):
            x = x_ref[:]
            rowT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 0)
            colT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 1)
            selT = (colT // S == rowT).astype(jnp.float32)
            zrow = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
            zcol = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            onehot_s = (zrow % S == zcol).astype(jnp.float32)
            for c, o in enumerate(out_refs):
                o[:] = jnp.dot(selT, x[:, c:c + 1] * onehot_s,
                               preferred_element_type=jnp.float32)

    elif variant == "reshape":
        def kernel(x_ref, *out_refs):
            x = x_ref[:]
            for c, o in enumerate(out_refs):
                o[:] = x[:, c].reshape(R_b, S)

    elif variant == "matmul_cat":
        # single output [R_b, 4S] = the 4 plane matmuls concatenated along
        # lanes — isolates the matmul scatter from the multi-output plumbing
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            rowT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 0)
            colT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 1)
            selT = (colT // S == rowT).astype(jnp.float32)
            zrow = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
            zcol = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            onehot_s = (zrow % S == zcol).astype(jnp.float32)
            planes = [
                jnp.dot(selT, x[:, c:c + 1] * onehot_s,
                        preferred_element_type=jnp.float32)
                for c in range(4)
            ]
            o_ref[:] = jnp.concatenate(planes, axis=1)

    elif variant == "reshape_cat":
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            o_ref[:] = jnp.concatenate(
                [x[:, c].reshape(R_b, S) for c in range(4)], axis=1
            )

    elif variant == "fold":
        # the [B, 4] -> [R_b, 4S] row fold (r-major: row r = interleaved
        # (sig,r,g,b) per sample). If this lowers, the render kernel can emit
        # the compositor's input shape directly and the XLA-level reshape
        # (tiled-layout copy, 21 ms/frame at 800x600@64) disappears.
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(R_b, 4 * S)

    else:
        raise ValueError(variant)

    single_out = variant.endswith("_cat") or variant == "fold"
    if single_out:
        out_specs = pl.BlockSpec((R_b, 4 * S), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((R, 4 * S), jnp.float32)
    else:
        out_specs = (plane_spec,) * 4
        out_shape = (plane_shape,) * 4

    fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    t0 = time.time()
    outs = jax.jit(fn)(raw)
    first = outs[0] if isinstance(outs, (tuple, list)) else outs
    got = float(jnp.sum(first))  # host fetch = tunnel-honest sync
    dt = time.time() - t0
    # correctness for the de-interleave variants
    ok = True
    want = np.asarray(raw[:, 0]).reshape(R, S)
    if variant in ("matmul", "reshape"):
        ok = bool(np.allclose(np.asarray(first), want, atol=1e-6))
    elif variant.endswith("_cat"):
        ok = bool(np.allclose(np.asarray(first)[:, :S], want, atol=1e-6))
    elif variant == "fold":
        ok = bool(np.array_equal(np.asarray(first),
                                 np.asarray(raw).reshape(R, 4 * S)))
    print(json.dumps({"variant": variant, "compile_run_s": round(dt, 1),
                      "correct": ok, "checksum": got}), flush=True)
    return 0 if ok else 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", help="internal child")
    ap.add_argument("--variants",
                    default="multi_out,reshape,matmul,reshape_cat,matmul_cat")
    ap.add_argument("--rb", type=int, default=32)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--timeout", type=float, default=240.0)
    args = ap.parse_args()

    if args.cell:
        return _probe(args.cell, args.rb, args.spp, args.blocks)

    results = []
    for v in args.variants.split(","):
        t0 = time.time()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--cell", v,
             "--rb", str(args.rb), "--spp", str(args.spp),
             "--blocks", str(args.blocks)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            start_new_session=True, cwd=REPO,
        )
        try:
            out, err = proc.communicate(timeout=args.timeout)
            line = out.strip().splitlines()[-1] if out.strip() else "{}"
            rec = json.loads(line) if line.startswith("{") else {}
            rec.update(variant=v, rc=proc.returncode)
            if proc.returncode != 0:
                rec["stderr_tail"] = err.strip().splitlines()[-5:]
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            rec = {"variant": v, "status": "COMPILE-HANG",
                   "killed_at_s": round(time.time() - t0, 1)}
        results.append(rec)
        print(rec, flush=True)

    out_path = os.path.join(REPO, "results", "perf", "planar_probe.json")
    merged = {r["variant"]: r for r in results}
    if os.path.exists(out_path):  # merge with earlier probe runs by variant
        try:
            with open(out_path) as f:
                for r in json.load(f).get("probes", []):
                    merged.setdefault(r["variant"], r)
        except (json.JSONDecodeError, KeyError):
            pass
    with open(out_path, "w") as f:
        json.dump({"shape": {"rb": args.rb, "spp": args.spp,
                             "blocks": args.blocks},
                   "probes": list(merged.values())}, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
