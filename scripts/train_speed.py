"""Measure training steps/s at the reference's exact recipe.

Recipe (reference ``main.py:27-62`` + ``trainer.py:83-136``): 800x800
images, 2048 rays/step, 64 coarse + 128 fine samples, hierarchical
importance sampling ON, Adam + grad clip + per-step exponential decay.
One image per step, rays re-drawn each step — the default
``nerf-tpu train`` path (``make_train_step``), not the streaming path.

Prints per-step wall time over ``--steps`` steps with a host-fetch sync
every step (the honest number: includes the per-dispatch tunnel floor),
plus the amortized ``make_multi_train_step`` number (K steps per dispatch,
what a real training run uses).
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--inner", type=int, default=10,
                    help="scan length for the multi-step variant")
    ap.add_argument("--out", default="results/perf/train_speed.json",
                    help="JSON artifact path ('' to skip)")
    ap.add_argument("--batch_sweep", default="2048,8192,16384",
                    help="n_rays sweep ('' to skip): steps/s + rays/s per "
                         "batch size, plus an equal-ray-budget convergence "
                         "check on the procedural scene. (32768 is omitted "
                         "from the default: its train-step compile did not "
                         "complete in 25 min through the tunnel — recorded "
                         "in the artifact note.)")
    ap.add_argument("--budget_rays", type=int, default=8_000_000,
                    help="total rays for the convergence-neutrality check")
    args = ap.parse_args()

    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import default_config
    from nerf_tpu.train.trainer import (
        default_train_apply_fn,
        init_train_state,
        make_multi_train_step,
        make_train_step,
    )

    cfg = default_config()
    H = W = args.size
    apply_fn = default_train_apply_fn(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, (H, W), apply_fn, donate=True)

    key = jax.random.PRNGKey(1)
    image = jax.random.uniform(key, (H, W, 3), jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    focal = jnp.float32(0.5 * W / 0.357)

    print(f"device: {jax.devices()[0]}  recipe: {W}x{H}, "
          f"{cfg.train.n_rays} rays, {cfg.render.n_coarse}+"
          f"{cfg.render.n_fine} samples, importance="
          f"{cfg.render.use_importance}", file=sys.stderr, flush=True)

    t0 = time.time()
    state, metrics = step(state, image, pose, focal, key)
    float(metrics["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    times = []
    for i in range(args.steps):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        state, metrics = step(state, image, pose, focal, k)
        float(metrics["loss"])                       # host fetch = hard sync
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"single-dispatch: median {med*1e3:.1f} ms/step "
          f"({1/med:.1f} steps/s) over {args.steps} steps", flush=True)

    # amortized: K steps per dispatch via lax.scan (what convergence_run uses)
    multi = make_multi_train_step(cfg, (H, W), args.inner, apply_fn,
                                  donate=True)
    images = jnp.broadcast_to(image, (args.inner, H, W, 3))
    poses = jnp.broadcast_to(pose, (args.inner, 4, 4))
    state2, m = multi(state, images, poses, focal, key)
    float(m["loss"][-1])
    t0 = time.time()
    n_outer = max(1, args.steps // args.inner)
    for i in range(n_outer):
        state2, m = multi(state2, images, poses, focal,
                          jax.random.fold_in(key, 1000 + i))
        float(m["loss"][-1])
    per = (time.time() - t0) / (n_outer * args.inner)
    print(f"scan x{args.inner}:      {per*1e3:.1f} ms/step "
          f"({1/per:.1f} steps/s) amortized", flush=True)

    batch_rows = []
    if args.batch_sweep:
        import dataclasses

        from nerf_tpu.data.synthetic import make_procedural_dataset
        from nerf_tpu.render.pipeline import render_rays
        from nerf_tpu.utils.cameras import generate_rays
        from nerf_tpu.utils.metrics import psnr as psnr_fn

        # the batch-size lever a pod-slice user pulls: rays/step up, along
        # with an equal-ray-budget convergence check (does the larger batch
        # buy throughput without costing sample efficiency?)
        hw = 128
        train_ds = make_procedural_dataset(n_views=20, img_wh=(hw, hw),
                                           seed=0)
        val_ds = make_procedural_dataset(n_views=1, img_wh=(hw, hw), seed=1,
                                         split="val")
        vimg = jnp.asarray(val_ds.images[0])
        vpose = jnp.asarray(val_ds.poses[0])

        for n_rays in [int(v) for v in args.batch_sweep.split(",")]:
            cfg_b = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, n_rays=n_rays))
            apply_b = default_train_apply_fn(cfg_b)
            st = init_train_state(jax.random.PRNGKey(0), cfg_b)
            step_b = make_train_step(cfg_b, (hw, hw), apply_b, donate=True)
            n_steps = max(1, args.budget_rays // n_rays)

            k = jax.random.PRNGKey(2)
            st, m = step_b(st, jnp.asarray(train_ds.images[0]),
                           jnp.asarray(train_ds.poses[0]),
                           jnp.float32(train_ds.focal), k)
            float(m["loss"])                          # compile + warm
            t0 = time.time()
            for i in range(n_steps):
                v = i % train_ds.images.shape[0]
                st, m = step_b(st, jnp.asarray(train_ds.images[v]),
                               jnp.asarray(train_ds.poses[v]),
                               jnp.float32(train_ds.focal),
                               jax.random.fold_in(k, i))
            loss = float(m["loss"])                   # sync once at the end
            dt = time.time() - t0

            # held-out view PSNR at the equal-ray budget
            ro, rd = generate_rays(vpose, hw, hw, float(train_ds.focal))
            out = render_rays(st.params["coarse"], st.params["fine"],
                              ro.reshape(-1, 3), rd.reshape(-1, 3),
                              cfg_b.model, cfg_b.render, key=None,
                              perturb=False)
            pred = out.fine.rgb.reshape(hw, hw, 3)
            val_psnr = float(psnr_fn(pred, vimg))
            row = {
                "n_rays": n_rays, "steps": n_steps,
                "ms_per_step": dt / n_steps * 1e3,
                "steps_per_second": n_steps / dt,
                "rays_per_second": n_steps * n_rays / dt,
                "final_loss": loss,
                "val_psnr_db_at_equal_ray_budget": val_psnr,
            }
            batch_rows.append(row)
            print(f"n_rays={n_rays}: {row['ms_per_step']:.1f} ms/step, "
                  f"{row['rays_per_second']:,.0f} rays/s, "
                  f"val {val_psnr:.2f} dB @ {args.budget_rays:,} rays",
                  flush=True)

    if args.out:
        import json
        import os

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({
                "recipe": {
                    "image": f"{W}x{H}", "rays_per_step": cfg.train.n_rays,
                    "n_coarse": cfg.render.n_coarse,
                    "n_fine": cfg.render.n_fine,
                    "use_importance": cfg.render.use_importance,
                    "steps_measured": args.steps,
                    "device": str(jax.devices()[0]),
                },
                "single_dispatch": {
                    "ms_per_step_median": med * 1e3,
                    "steps_per_second": 1 / med,
                },
                "scan_amortized": {
                    "inner": args.inner,
                    "ms_per_step": per * 1e3,
                    "steps_per_second": 1 / per,
                },
                "batch_scaling": {
                    "note": "procedural 128x128 scene; equal total-ray "
                            "budget per row, so val PSNR compares sample "
                            "efficiency across batch sizes. n_rays=32768 "
                            "omitted: its train-step compile did not "
                            "complete in 25 min through the tunnel "
                            "(2048/8192/16384 compile in 2-6 min).",
                    "budget_rays": args.budget_rays,
                    "rows": batch_rows,
                },
            }, f, indent=2)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
