"""Configuration system for nerf_tpu.

Two tiers, mirroring the reference's capability (reference ``main.py:25-62``
flat dict + argparse flags) but typed: frozen dataclasses with defaults that
reproduce the reference's default config, plus helpers to build them from CLI
args / plain dicts so checkpoints can round-trip configs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of one NeRF MLP (reference ``src/models/nerf.py:48-90``)."""

    # "reference": the reference repo's own architecture (density head +
    #   direct color branch, skip concat [h, posenc], in-model ReLU on density).
    # "bmild": the original-NeRF architecture the bundled lego example weights
    #   use (alpha + bottleneck heads, skip concat [posenc, h], raw density).
    variant: str = "reference"
    pos_freqs: int = 10          # L for position encoding -> 3 + 6L = 63 dims
    dir_freqs: int = 4           # L for direction encoding -> 27 dims
    hidden_dim: int = 256
    n_layers: int = 8            # trunk depth
    skip_layer: int = 4          # concat pos-encoding before this trunk layer
    color_hidden_dim: int = 128
    # Reference quirk (``nerf.py:42-43``): sin/cos of (2^i * pi * x). The
    # original NeRF (and the bundled bmild example weights) omit the pi.
    posenc_pi: bool = True
    # Reference passes raw (unnormalized) ray directions to the MLP
    # (``trainer.py:321``, ``pytorch_renderers.py:86``); bmild normalizes.
    normalize_dirs: bool = False

    @property
    def pos_dim(self) -> int:
        return 3 + 6 * self.pos_freqs

    @property
    def dir_dim(self) -> int:
        return 3 + 6 * self.dir_freqs


@dataclass(frozen=True)
class RenderConfig:
    """Sampling + compositing parameters (reference ``main.py:27-62``)."""

    near: float = 2.0
    far: float = 6.0
    n_coarse: int = 64
    n_fine: int = 128
    perturb: bool = True              # stratified jitter during training
    # True hierarchical importance sampling. The reference defines it but
    # never calls it (``rendering.py:54-100``; fine pass is uniform,
    # ``trainer.py:306-309``). We implement it for real, flag-gated so the
    # reference-compat parity path can disable it.
    use_importance: bool = True
    white_background: bool = False    # composite onto white (bmild lego flag)
    raw_noise_std: float = 0.0        # density noise during training
    # Reference numeric quirks, reproduced for parity:
    dist_sentinel: float = 1e10       # last-sample distance (``rendering.py:117``)
    transmittance_eps: float = 1e-10  # cumprod epsilon (``rendering.py:127``)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference ``main.py:27-62``, ``trainer.py:54-75``)."""

    learning_rate: float = 3e-4
    lr_decay: float = 0.1             # total decay factor ...
    lr_decay_steps: int = 250_000     # ... reached after this many steps
    weight_decay: float = 1e-6
    grad_clip_norm: float = 1.0
    n_rays: int = 2048                # rays per train step
    chunk_size: int = 8192            # samples per render chunk (TPU-sized)
    n_epochs: int = 100
    checkpoint_frequency: int = 25    # epochs between checkpoints
    val_frequency: int = 10           # epochs between validations
    max_val_images: int = 5
    seed: int = 0
    # Compute dtype for matmuls; params stay float32.
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class AccelConfig:
    """Occupancy-grid accelerated engine (``render/engines.py:AccelEngine``).

    The defaults are tuned for the Blender-synthetic lego scene (object
    inside a ~[-1.5, 1.5]^3 box); set per scene — they are quality-affecting
    scene constants, not magic numbers."""

    grid_resolution: int = 128
    density_threshold: float = 5.0    # sigma above which a cell is occupied
    aabb: Tuple[float, float] = (-1.5, 1.5)   # scene bounds (same per axis)
    n_probe: int = 96                 # coarse probes per ray when baking z's
    probe_resolution: int = 64        # probe a max-pooled (dilated) mip of
                                      # the grid at this resolution; 0 = use
                                      # the full grid. Coarser mip -> fewer
                                      # probes needed (see n_probe) at the
                                      # cost of looser sample placement.
                                      # Defaults from the committed sweep
                                      # (results/perf/accel_sweep.json):
                                      # 64/96 beats the full-grid/128 probe
                                      # baseline on BOTH quality and speed
    grid_store: str = "density"       # "binary" = thresholded {0,1} cells;
                                      # "density" = raw relu(sigma), enables
                                      # the alpha/transmittance weightings
    weight_mode: str = "alpha"        # probe-pdf weighting: "occupancy"
                                      # (flat over occupied cells, binary
                                      # grids), "alpha" (per-segment
                                      # opacity), or "transmittance" (the
                                      # full coarse-pass analog from the
                                      # baked grid). Round-5 sweep
                                      # (accel_sweep.json): density+alpha
                                      # dominates binary at identical cost
                                      # (+0.4-1.4 dB at every spp) -> the
                                      # default. Transmittance is the
                                      # quality champion (27.96 dB @64) but
                                      # ONLY with probe_resolution=0 — a
                                      # max-pooled mip inflates near-field
                                      # alpha and shadows the true surface
                                      # (16-24 dB, measured); quality mode:
                                      # grid 256, transmittance, mip 0,
                                      # n_probe 192.
    probe_ray_stride: int = 4         # probe every k-th ray and share the
                                      # occupancy profile with its scanline
                                      # neighbors; the XLA gather dominates
                                      # probe cost, so time drops ~k-fold
                                      # (scripts/probe_microbench.py); 1 =
                                      # probe every ray. At stride 4 the
                                      # quality cost is ~0.06 dB vs GT and
                                      # accel@16 beats uniform-64 on BOTH
                                      # axes: 23.2 dB @ 1.06M rays/s vs
                                      # 22.7 dB @ 0.90M (accel_sweep.json)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded training/rendering (``parallel/``)."""

    data_axis: int = -1               # -1: all devices on the data (ray) axis
    model_axis: int = 1               # tensor-parallel shard of hidden dim
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class Config:
    """Top-level config bundle."""

    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    accel: AccelConfig = field(default_factory=AccelConfig)
    data_dir: str = "data/nerf_synthetic/lego"
    checkpoint_dir: str = "checkpoints"
    output_dir: str = "outputs"
    img_wh: Tuple[int, int] = (800, 800)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "Config":
        def build(cls, sub):
            if sub is None:
                return cls()
            names = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in sub.items() if k in names})

        cfg = Config(
            model=build(ModelConfig, d.get("model")),
            render=build(RenderConfig, d.get("render")),
            train=build(TrainConfig, d.get("train")),
            mesh=build(MeshConfig, d.get("mesh")),
            accel=build(AccelConfig, d.get("accel")),
        )
        if "accel" in d and d["accel"] and "aabb" in d["accel"]:
            cfg = dataclasses.replace(
                cfg,
                accel=dataclasses.replace(
                    cfg.accel, aabb=tuple(d["accel"]["aabb"])
                ),
            )
        top = {
            k: d[k]
            for k in ("data_dir", "checkpoint_dir", "output_dir", "img_wh")
            if k in d
        }
        if "img_wh" in top:
            top["img_wh"] = tuple(top["img_wh"])
        if "mesh" in d and d["mesh"] and "axis_names" in d["mesh"]:
            cfg = dataclasses.replace(
                cfg,
                mesh=dataclasses.replace(
                    cfg.mesh, axis_names=tuple(d["mesh"]["axis_names"])
                ),
            )
        return dataclasses.replace(cfg, **top)


def default_config() -> Config:
    """The reference's default config (``main.py:25-62``), TPU-adjusted.

    Chunk sizes are TPU-sized (the reference tunes 256-4096 per backend;
    on TPU one large MXU-friendly chunk wins).
    """
    return Config()


def reference_compat_config() -> Config:
    """Config that reproduces the reference's numerics exactly.

    - fine pass uniform (no importance sampling), matching ``trainer.py:306-309``
    - perturb off for deterministic parity
    """
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        render=dataclasses.replace(cfg.render, use_importance=False, perturb=False),
        train=dataclasses.replace(cfg.train, compute_dtype="float32"),
    )


def bmild_config() -> Config:
    """Config matching the bundled original-NeRF lego example weights
    (``data/lego_example_weights/args.txt``: multires=10, multires_views=4,
    netdepth=8, netwidth=256, white_bkgd, no pi factor, normalized viewdirs).
    """
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, variant="bmild", posenc_pi=False, normalize_dirs=True
        ),
        render=dataclasses.replace(cfg.render, white_background=True),
    )
