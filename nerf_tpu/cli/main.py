"""CLI entry points: train -> benchmark pipeline, render, compare.

Capability parity with reference ``main.py`` (train/benchmark orchestration,
``main.py:198-266``) and ``compare_renderers.py`` (side-by-side engine
comparison grid). Subcommands:

    nerf-tpu train      --data_dir D --epochs N [--resume]
    nerf-tpu benchmark  --checkpoint C [--resolutions ...] [--samples ...]
    nerf-tpu render     --weights {bmild|PATH} --width W --height H --samples S
    nerf-tpu compare    --checkpoint C [--size 128]
    nerf-tpu pipeline   --data_dir D --epochs N     # train then benchmark

The reference's single-script flag set (``--epochs --skip_training
--checkpoint --benchmark_only``, ``main.py:200-219``) maps onto
``pipeline`` / ``benchmark``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import List, Optional

import numpy as np

# The bundled original-NeRF lego example weights. Overridable for standalone
# deployments (the default points at the reference checkout used in CI).
BMILD_DEFAULT = os.environ.get(
    "NERF_TPU_EXAMPLE_WEIGHTS",
    "/root/reference/data/lego_example_weights/model_fine_200000.npy",
)


def _parse_resolutions(vals: List[str]):
    out = []
    for v in vals:
        w, h = v.lower().split("x")
        out.append((int(w), int(h)))
    return out


def _maybe_init_distributed(args) -> None:
    """Wire the CLI's multi-host flags to ``jax.distributed.initialize``
    BEFORE any other jax call on this host (required ordering). No-op for
    single-process runs. Exact commands: docs/SCALING.md."""
    if getattr(args, "num_processes", 0) and args.num_processes > 1:
        from nerf_tpu.parallel.train import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )


def cmd_train(args) -> int:
    _maybe_init_distributed(args)
    import jax.numpy as jnp

    from nerf_tpu.config import default_config
    from nerf_tpu.data.blender import load_blender_data
    from nerf_tpu.data.synthetic import make_procedural_dataset
    from nerf_tpu.train import NeRFTrainer

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        data_dir=args.data_dir,
        checkpoint_dir=args.checkpoint_dir,
        output_dir=args.output_dir,
        train=dataclasses.replace(
            cfg.train, n_epochs=args.epochs,
            n_rays=args.n_rays or cfg.train.n_rays,
        ),
    )
    w = h = args.image_size
    if os.path.isdir(args.data_dir) and os.path.exists(
        os.path.join(args.data_dir, "transforms_train.json")
    ):
        data = load_blender_data(args.data_dir, (w, h), splits=("train", "val"))
        train_ds, val_ds = data["train"], data["val"]
    else:
        print(f"no blender dataset at {args.data_dir}; using procedural scene")
        train_ds = make_procedural_dataset(n_views=20, img_wh=(w, h), seed=0)
        val_ds = make_procedural_dataset(n_views=4, img_wh=(w, h), seed=1,
                                         split="val")

    if getattr(args, "num_processes", 0) and args.num_processes > 1:
        return _train_distributed(args, cfg, train_ds, (h, w))

    trainer = NeRFTrainer(cfg, (h, w))
    if args.streaming_steps:
        if not args.no_resume:
            trainer.try_resume()
        trainer.train_streaming(train_ds, n_steps=args.streaming_steps)
    else:
        trainer.train(train_ds, val_ds, n_epochs=args.epochs,
                      resume=not args.no_resume)
    path = trainer.save_checkpoint("final_model.npz")
    trainer.plot_losses()
    print(f"final checkpoint: {path}")
    return 0


def _train_distributed(args, cfg, train_ds, img_hw) -> int:
    """Multi-host training loop: every host runs this same program, the ray
    axis shards over the GLOBAL device mesh, grads all-reduce via the
    XLA-derived collective (``parallel/train.py``). Hosts feed identical
    per-step inputs (replicated sharding), process 0 logs and saves. The
    pod-slice capability the reference lacks entirely (SURVEY.md §2.2);
    exact 2-process CPU rehearsal commands: docs/SCALING.md."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_train_state,
    )
    from nerf_tpu.train.checkpoint import save_checkpoint
    from nerf_tpu.train.trainer import init_train_state

    h, w = img_hw
    pid = jax.process_index()
    n_dev = len(jax.devices())
    print(f"[proc {pid}/{jax.process_count()}] global devices: {n_dev}")

    mesh = make_mesh(n_data=n_dev, n_model=1)
    state = shard_train_state(init_train_state(jax.random.PRNGKey(0), cfg),
                              mesh)
    step = make_sharded_train_step(cfg, (h, w), mesh, donate=False)

    n_views = train_ds.images.shape[0]
    n_steps = args.streaming_steps or args.epochs * n_views
    if n_steps <= 0:
        raise SystemExit("distributed training needs n_steps > 0 "
                         "(set --epochs or --streaming_steps)")
    key = jax.random.PRNGKey(1)  # same on every host: replicated inputs
    focal = jnp.float32(train_ds.focal)
    loss = float("nan")
    for i in range(n_steps):
        v = i % n_views
        key, k = jax.random.split(key)
        state, metrics = step(state, jnp.asarray(train_ds.images[v]),
                              jnp.asarray(train_ds.poses[v]), focal, k)
        if pid == 0 and ((i + 1) % 100 == 0 or i + 1 == n_steps):
            loss = float(metrics["loss"])
            print(f"step {i + 1}/{n_steps} loss={loss:.6f}", flush=True)
    if loss != loss:
        loss = float(metrics["loss"])
    print(f"PROC {pid} FINAL LOSS {loss:.8f}", flush=True)
    if pid == 0:
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        path = os.path.join(args.checkpoint_dir, "final_model.npz")
        # fully-addressable on every host (replicated params): host 0 writes
        save_checkpoint(path, jax.device_get(state),
                        {"config": cfg.to_dict(), "distributed": True})
        print(f"final checkpoint: {path}")
    return 0


def cmd_benchmark(args) -> int:
    from nerf_tpu.bench.suite import UnifiedBenchmarkSuite
    from nerf_tpu.config import bmild_config, default_config

    ckpt = args.checkpoint
    cfg = bmild_config() if (ckpt or "").endswith(".npy") else default_config()
    suite = UnifiedBenchmarkSuite(cfg, output_dir=args.output_dir)
    suite.add_available_renderers(args.engines)
    suite.run_benchmark(
        ckpt,
        resolutions=_parse_resolutions(args.resolutions),
        samples=[int(s) for s in args.samples],
        n_views=args.views,
    )
    if len(suite.engines) > 1 and "xla" in suite.engines:
        suite.quality_report()
    if getattr(args, "gt_gate", False) and "xla" in suite.engines:
        suite.gt_quality_report(
            resolution=(400, 300), gt_spp=args.gt_spp,
            spps=(16, 32, 64, 128), n_views=4,
        )
    paths = suite.generate_report()
    for k, v in paths.items():
        print(f"{k}: {v}")
    return 0


def cmd_render(args) -> int:
    import jax.numpy as jnp

    from nerf_tpu.config import bmild_config, default_config
    from nerf_tpu.render.engines import ENGINE_CLASSES, SharedModel
    from nerf_tpu.utils.cameras import focal_from_angle, spherical_pose

    weights = args.weights
    if weights == "bmild":
        weights = BMILD_DEFAULT
    cfg = bmild_config() if weights.endswith(".npy") else default_config()
    shared = SharedModel(cfg).load(weights)
    engine = ENGINE_CLASSES[args.engine](shared)

    pose = spherical_pose(args.theta, args.phi, args.radius)
    focal = (
        args.focal
        if args.focal is not None
        else focal_from_angle(args.width, 0.6911112070083618)
    )
    if args.trace:
        from nerf_tpu.utils.monitor import profile_trace

        with profile_trace(args.trace):
            res = engine.render_image(
                pose, (args.width, args.height), args.samples,
                focal=focal, mode=args.mode,
            )
        print(f"profiler trace written to {args.trace}")
    else:
        res = engine.render_image(
            pose, (args.width, args.height), args.samples,
            focal=focal, mode=args.mode,
        )
    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    rgb_path = os.path.join(args.out, "rgb.png")
    Image.fromarray((np.clip(res.rgb, 0, 1) * 255).astype(np.uint8)).save(rgb_path)
    d = res.depth
    dn = (d - d.min()) / max(float(d.max() - d.min()), 1e-9)
    depth_path = os.path.join(args.out, "depth.png")
    Image.fromarray((dn * 255).astype(np.uint8)).save(depth_path)
    print(
        f"rendered {args.width}x{args.height}@{args.samples} with {args.engine} "
        f"in {res.stats.wall_time_s:.3f}s "
        f"({args.width*args.height/res.stats.wall_time_s:,.0f} rays/s)"
    )
    print(f"wrote {rgb_path}, {depth_path}")
    return 0


def cmd_compare(args) -> int:
    """Side-by-side RGB/depth grid across all engines on one novel view, with
    black-image debug stats (``compare_renderers.py:104-109``)."""
    from nerf_tpu.config import bmild_config, default_config
    from nerf_tpu.render.engines import SharedModel, available_engines
    from nerf_tpu.utils.cameras import focal_from_angle, spherical_pose

    ckpt = args.checkpoint
    if ckpt == "bmild":
        ckpt = BMILD_DEFAULT
    cfg = bmild_config() if (ckpt or "").endswith(".npy") else default_config()
    shared = SharedModel(cfg).load(ckpt)
    engines = available_engines(shared)
    pose = spherical_pose(40.0, -30.0, 4.0)
    focal = focal_from_angle(args.size, 0.6911112070083618)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(engines)
    fig, axes = plt.subplots(2, n, figsize=(4 * n, 8), squeeze=False)
    for col, (name, engine) in enumerate(engines.items()):
        res = engine.render_image(
            pose, (args.size, args.size), args.samples, focal=focal
        )
        mean = float(res.rgb.mean())
        status = "BLACK IMAGE?" if mean < 0.01 else f"mean={mean:.3f}"
        print(f"{name}: {res.stats.wall_time_s:.3f}s {status}")
        axes[0][col].imshow(np.clip(res.rgb, 0, 1))
        axes[0][col].set_title(f"{name}\n{res.stats.wall_time_s:.2f}s {status}")
        axes[0][col].axis("off")
        d = res.depth
        axes[1][col].imshow((d - d.min()) / max(float(d.max() - d.min()), 1e-9),
                            cmap="viridis")
        axes[1][col].set_title(f"{name} depth")
        axes[1][col].axis("off")
    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(args.output_dir, "renderer_comparison.png")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    print(f"wrote {path}")
    return 0


def cmd_scale(args) -> int:
    """Scaling report: rays/s and parallel efficiency over 1..N devices."""
    _maybe_init_distributed(args)
    import jax

    from nerf_tpu.bench.scaling import scaling_report
    from nerf_tpu.config import bmild_config, default_config
    from nerf_tpu.render.engines import SharedModel

    ckpt = args.checkpoint
    if ckpt == "bmild":
        ckpt = BMILD_DEFAULT
    cfg = bmild_config() if (ckpt or "").endswith(".npy") else default_config()
    shared = SharedModel(cfg).load(ckpt)
    w, h = _parse_resolutions([args.resolution])[0]
    print(f"devices available: {len(jax.devices())}")
    os.makedirs(args.output_dir, exist_ok=True)
    rows = scaling_report(
        shared.params["fine"], cfg, resolution=(w, h), spp=args.samples,
        focal=args.focal,
        device_counts=[int(d) for d in args.devices] if args.devices else None,
        frame_path=os.path.join(args.output_dir, "scaling_frame.png"),
    )
    import json as _json

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "scaling_report.json")
    with open(out, "w") as f:
        _json.dump([r.__dict__ for r in rows], f, indent=2)
    print(f"wrote {out}")
    return 0


def cmd_export(args) -> int:
    """Cross-framework interop: convert our .npz checkpoint to the
    reference's torch .pth format (coarse+fine state_dicts + config), so a
    reference-repo user can consume models trained here."""
    import torch

    from nerf_tpu.config import Config
    from nerf_tpu.models.nerf import params_to_torch_state_dict
    from nerf_tpu.train.checkpoint import restore_checkpoint
    from nerf_tpu.train.trainer import init_train_state

    import jax

    with __import__("numpy").load(args.checkpoint) as data:
        import json as _json

        meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
    cfg = Config.from_dict(meta.get("config", {}))
    template = init_train_state(jax.random.PRNGKey(0), cfg)
    state, meta = restore_checkpoint(args.checkpoint, template)

    payload = {
        "coarse_model": {
            k: torch.from_numpy(v.copy())
            for k, v in params_to_torch_state_dict(state.params["coarse"]).items()
        },
        "fine_model": {
            k: torch.from_numpy(v.copy())
            for k, v in params_to_torch_state_dict(state.params["fine"]).items()
        },
        "config": meta.get("config", {}),
        "train_losses": meta.get("train_losses", []),
        "val_losses": meta.get("val_losses", []),
    }
    torch.save(payload, args.out)
    print(f"exported {args.checkpoint} -> {args.out} "
          f"(reference-compatible state_dict format)")
    return 0


def cmd_smoke(args) -> int:
    """Fast end-to-end sanity check: tiny procedural train -> checkpoint ->
    resume -> render -> mini benchmark. The reference's test orchestrator
    references a ``smoke_test.py`` that is absent from its repo
    (``run_tests.py:49``, SURVEY.md §4); this is that capability, real."""
    import tempfile
    import dataclasses

    import numpy as np

    from nerf_tpu.bench.suite import UnifiedBenchmarkSuite
    from nerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
    from nerf_tpu.data.synthetic import make_procedural_dataset
    from nerf_tpu.train import NeRFTrainer

    t0 = __import__("time").time()
    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config(
            model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                              n_layers=4, skip_layer=2, color_hidden_dim=16),
            render=RenderConfig(n_coarse=8, n_fine=12),
            train=TrainConfig(n_rays=128, compute_dtype="float32",
                              learning_rate=5e-3, checkpoint_frequency=1),
            checkpoint_dir=f"{tmp}/ckpt",
            output_dir=f"{tmp}/out",
        )
        ds = make_procedural_dataset(n_views=4, img_wh=(32, 32))
        trainer = NeRFTrainer(cfg, (32, 32))
        trainer.train(ds, n_epochs=2, log_fn=lambda m: print(f"  {m}"))
        assert len(trainer.train_losses) == 2
        print("  train OK")

        trainer2 = NeRFTrainer(cfg, (32, 32))
        assert trainer2.try_resume() is not None
        print("  resume OK")

        rgb, depth = trainer.render_image(
            trainer.state.params, ds[0]["pose"], (32, 32), float(ds.focal)
        )
        assert np.all(np.isfinite(np.asarray(rgb)))
        print("  render OK")

        suite = UnifiedBenchmarkSuite(cfg, output_dir=f"{tmp}/out")
        suite.add_available_renderers(names=["xla"])
        results = suite.run_benchmark(
            None, resolutions=[(32, 24)], samples=[8], n_views=1,
            save_sample_renders=False,
        )
        assert results and results[0].success
        print("  benchmark OK")
    print(f"smoke test passed in {__import__('time').time() - t0:.1f}s")
    return 0


def cmd_pipeline(args) -> int:
    """Reference ``main.py`` behavior: train (unless skipped) then benchmark."""
    if not args.benchmark_only and not args.skip_training:
        rc = cmd_train(args)
        if rc:
            return rc
    if args.checkpoint is None:
        args.checkpoint = os.path.join(args.checkpoint_dir, "final_model.npz")
    return cmd_benchmark(args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nerf-tpu",
                                description="TPU-native NeRF framework")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--output_dir", default="outputs")
        sp.add_argument("--checkpoint_dir", default="checkpoints")

    def distributed(sp):
        """Multi-host bring-up flags (``jax.distributed.initialize``) — the
        pod-slice entry point docs/SCALING.md describes; single-process when
        omitted."""
        sp.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 (all hosts pass the "
                             "same value)")
        sp.add_argument("--num_processes", type=int, default=0,
                        help="total hosts in the pod slice (0 = "
                             "single-process)")
        sp.add_argument("--process_id", type=int, default=None,
                        help="this host's index in [0, num_processes)")

    t = sub.add_parser("train", help="train a NeRF")
    common(t)
    t.add_argument("--data_dir", default="data/nerf_synthetic/lego")
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--image_size", type=int, default=400)
    t.add_argument("--no_resume", action="store_true")
    t.add_argument("--streaming_steps", type=int, default=0,
                   help="train N steps from the native host ray producer "
                        "instead of the per-image epoch loop")
    t.add_argument("--n_rays", type=int, default=0,
                   help="rays per train step (0 = config default, 2048)")
    distributed(t)
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("benchmark", help="run the unified benchmark")
    common(b)
    b.add_argument("--checkpoint", default=None)
    b.add_argument("--resolutions", nargs="+",
                   default=["200x150", "400x300", "800x600"])
    b.add_argument("--samples", nargs="+", default=["32", "64", "128"])
    b.add_argument("--views", type=int, default=2)
    b.add_argument("--engines", nargs="+", default=None)
    b.add_argument("--gt_gate", action="store_true",
                   help="also run the ground-truth-anchored quality gate "
                        "(engines at several spp vs a high-spp truth)")
    b.add_argument("--gt_spp", type=int, default=256)
    b.set_defaults(fn=cmd_benchmark)

    r = sub.add_parser("render", help="render one view")
    r.add_argument("--weights", default="bmild",
                   help="'bmild', a .npy, or a .npz checkpoint")
    r.add_argument("--engine", default="pallas",
                   choices=["xla", "pallas", "compressed", "int8", "accel"])
    r.add_argument("--width", type=int, default=400)
    r.add_argument("--height", type=int, default=400)
    r.add_argument("--samples", type=int, default=64)
    r.add_argument("--mode", default="benchmark",
                   choices=["benchmark", "hierarchical"])
    r.add_argument("--theta", type=float, default=30.0)
    r.add_argument("--phi", type=float, default=-30.0)
    r.add_argument("--radius", type=float, default=4.0)
    r.add_argument("--focal", type=float, default=None)
    r.add_argument("--trace", default=None,
                   help="write a jax.profiler trace to this directory")
    r.add_argument("--out", default="outputs/render")
    r.set_defaults(fn=cmd_render)

    c = sub.add_parser("compare", help="side-by-side engine comparison")
    c.add_argument("--checkpoint", default="bmild")
    c.add_argument("--size", type=int, default=128)
    c.add_argument("--samples", type=int, default=32)
    c.add_argument("--output_dir", default="outputs")
    c.set_defaults(fn=cmd_compare)

    sm = sub.add_parser("smoke", help="fast end-to-end sanity check")
    sm.set_defaults(fn=cmd_smoke)

    ex = sub.add_parser("export", help="convert .npz checkpoint to torch .pth")
    ex.add_argument("--checkpoint", required=True)
    ex.add_argument("--out", required=True)
    ex.set_defaults(fn=cmd_export)

    s = sub.add_parser("scale", help="multi-device scaling report")
    s.add_argument("--checkpoint", default="bmild")
    s.add_argument("--resolution", default="400x300")
    s.add_argument("--samples", type=int, default=64)
    s.add_argument("--focal", type=float, default=800.0)
    s.add_argument("--devices", nargs="+", default=None)
    s.add_argument("--output_dir", default="outputs")
    distributed(s)
    s.set_defaults(fn=cmd_scale)

    pl = sub.add_parser("pipeline", help="train then benchmark (reference main.py)")
    common(pl)
    pl.add_argument("--data_dir", default="data/nerf_synthetic/lego")
    pl.add_argument("--epochs", type=int, default=100)
    pl.add_argument("--image_size", type=int, default=400)
    pl.add_argument("--streaming_steps", type=int, default=0,
                    help="train N steps from the native host ray producer "
                         "instead of the per-image epoch loop")
    pl.add_argument("--n_rays", type=int, default=0,
                    help="rays per train step (0 = config default, 2048)")
    pl.add_argument("--no_resume", action="store_true")
    pl.add_argument("--skip_training", action="store_true")
    pl.add_argument("--benchmark_only", action="store_true")
    pl.add_argument("--checkpoint", default=None)
    pl.add_argument("--resolutions", nargs="+",
                    default=["200x150", "400x300", "800x600"])
    pl.add_argument("--samples", nargs="+", default=["32", "64", "128"])
    pl.add_argument("--views", type=int, default=2)
    pl.add_argument("--engines", nargs="+", default=None,
                    help="restrict the benchmark stage (default: all)")
    pl.add_argument("--gt_gate", action="store_true")
    pl.add_argument("--gt_spp", type=int, default=256)
    pl.set_defaults(fn=cmd_pipeline)

    return p


def main(argv: Optional[List[str]] = None) -> int:
    platform = os.environ.get("NERF_TPU_PLATFORM")
    if platform:
        # Explicit platform override for subprocess drivers (the container's
        # sitecustomize force-registers the TPU backend and wins over the
        # JAX_PLATFORMS env var; a config update beats both). Used by the
        # 2-process CPU distributed rehearsal (docs/SCALING.md) and tests.
        import jax

        jax.config.update("jax_platforms", platform)
    args = build_parser().parse_args(argv)
    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
