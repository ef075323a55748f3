"""Training-convergence evidence run (reference analog:
``CONVERGENCE_ANALYSIS.md:17-26`` + ``baseline_training_run_500epochs/``).

Trains the full NeRF (reference architecture, importance sampling on, fused
Pallas fwd+bwd kernels) on the procedural multi-view scene at 400x400 for
--steps optimizer steps on the TPU, logging a val-PSNR trajectory, and
writes committed artifacts under results/convergence/:

  psnr_curve.png       val PSNR + train loss over steps
  trajectory.json      the raw numbers (step, train_loss, val_mse, val_psnr)
  final_rgb.png        final render of a held-out view
  final_depth.png      its depth map
  final_params.npz     trained model parameters

Quality bar (documented in results/convergence/README.md): >= 28 dB val
PSNR at the end of the run. The reference's bar on lego was ~25.4 dB at
epoch 200 (``CONVERGENCE_ANALYSIS.md:5-13``); the procedural sphere scene
is geometrically simpler, hence the higher bar. The lego dataset itself is
not present in this environment (only its example weights are bundled);
``nerf-tpu train --data-dir <path>`` runs the same trainer on real lego.

Usage:  python scripts/convergence_run.py [--steps 12000] [--out results/convergence]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--out", default="results/convergence")
    ap.add_argument("--img", type=int, default=400)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--val-every", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nerf_tpu.config import Config, RenderConfig, TrainConfig
    from nerf_tpu.data.synthetic import make_procedural_dataset
    from nerf_tpu.train.trainer import NeRFTrainer
    from nerf_tpu.utils.metrics import psnr_from_mse

    os.makedirs(args.out, exist_ok=True)
    wh = (args.img, args.img)
    cfg = Config(
        render=RenderConfig(white_background=True),
        train=TrainConfig(n_rays=2048),
        img_wh=wh,
        checkpoint_dir=os.path.join(args.out, "ckpt"),
        output_dir=args.out,
    )

    print(f"devices: {jax.devices()}", flush=True)
    train_ds = make_procedural_dataset(args.views, wh, seed=0, split="train")
    val_ds = make_procedural_dataset(8, wh, seed=123, split="val")

    trainer = NeRFTrainer(cfg, (wh[1], wh[0]))
    steps_per_epoch = len(train_ds)
    n_epochs = (args.steps + steps_per_epoch - 1) // steps_per_epoch

    traj = []
    t0 = time.perf_counter()
    for epoch in range(n_epochs):
        loss = trainer.train_epoch(train_ds)
        step = (epoch + 1) * steps_per_epoch
        if step % args.val_every < steps_per_epoch or epoch == n_epochs - 1:
            val_mse = trainer.validate(val_ds)
            val_psnr = float(10 * np.log10(1.0 / max(val_mse, 1e-12)))
            traj.append({"step": step, "train_loss": loss,
                         "val_mse": val_mse, "val_psnr_db": val_psnr})
            dt = time.perf_counter() - t0
            print(f"step {step:6d}  loss {loss:.6f}  val_mse {val_mse:.6f}  "
                  f"val_psnr {val_psnr:.2f} dB  ({dt:.0f}s, "
                  f"{step/dt:.1f} steps/s incl. val)", flush=True)
        trainer.train_losses.append(loss)

    with open(os.path.join(args.out, "trajectory.json"), "w") as f:
        json.dump({
            "config": {"img_wh": wh, "views": args.views,
                       "n_rays": cfg.train.n_rays,
                       "samples": [cfg.render.n_coarse, cfg.render.n_fine],
                       "importance": cfg.render.use_importance,
                       "steps": args.steps,
                       "device": str(jax.devices()[0])},
            "trajectory": traj,
            "wall_time_s": time.perf_counter() - t0,
        }, f, indent=2)

    # curve PNG
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(8, 5))
    steps = [t["step"] for t in traj]
    ax1.plot(steps, [t["val_psnr_db"] for t in traj], "o-", color="tab:blue",
             label="val PSNR")
    ax1.set_xlabel("optimizer step")
    ax1.set_ylabel("val PSNR (dB)", color="tab:blue")
    ax1.axhline(28.0, color="tab:blue", ls=":", lw=1, label="28 dB bar")
    ax2 = ax1.twinx()
    ax2.plot(steps, [t["train_loss"] for t in traj], "s--", color="tab:red",
             alpha=0.6, label="train loss")
    ax2.set_ylabel("train MSE", color="tab:red")
    ax2.set_yscale("log")
    ax1.set_title(f"NeRF convergence, procedural scene {wh[0]}x{wh[1]}, "
                  f"{args.views} views")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "psnr_curve.png"), dpi=120)

    # final held-out render
    from PIL import Image

    item = val_ds[0]
    rgb, depth = trainer.render_image(trainer.state.params, item["pose"],
                                      (wh[1], wh[0]), float(val_ds.focal))
    rgb_u8 = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(rgb_u8).save(os.path.join(args.out, "final_rgb.png"))
    gt_u8 = (np.clip(np.asarray(item["image"]), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(gt_u8).save(os.path.join(args.out, "ground_truth.png"))
    d = np.asarray(depth)
    dn = (d - d.min()) / max(d.max() - d.min(), 1e-9)
    Image.fromarray((dn * 255).astype(np.uint8)).save(
        os.path.join(args.out, "final_depth.png"))

    flat = {}
    import jax.tree_util as tu
    for path, leaf in tu.tree_flatten_with_path(trainer.state.params)[0]:
        flat[tu.keystr(path)] = np.asarray(leaf)
    np.savez_compressed(os.path.join(args.out, "final_params.npz"), **flat)

    final = traj[-1]["val_psnr_db"]
    print(f"FINAL val PSNR {final:.2f} dB "
          f"({'PASS' if final >= 28.0 else 'FAIL'} vs 28 dB bar)", flush=True)
    return 0 if final >= 28.0 else 1


if __name__ == "__main__":
    sys.exit(main())
