"""Scaling report: rays/s vs device count on a mesh.

The reference benchmarks one device at a time (SURVEY.md §2.2: no
parallelism); the TPU-native framework's scaling axis is rays-across-chips.
This module renders frames with the ray axis sharded over the first N mesh
devices via ``shard_map`` (each chip runs the same single-chip code — XLA or
the fused Pallas kernel — on its ray shard; tiles are gathered for image
assembly) and reports throughput + parallel efficiency per device count.

On real hardware this measures ICI/DCN scaling (the >=85%-linear target);
under ``--xla_force_host_platform_device_count`` it validates the machinery.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nerf_tpu.config import Config
from nerf_tpu.models.nerf import apply_nerf
from nerf_tpu.parallel.mesh import make_mesh
from nerf_tpu.utils.cameras import generate_rays
from nerf_tpu.utils.monitor import sync
from nerf_tpu.utils.rendering import sample_points_on_rays, volume_render


@dataclass
class ScalingRow:
    n_devices: int
    render_time_s: float
    rays_per_second: float
    efficiency: float     # vs linear scaling from the 1-device row


def assemble_frame(
    rgb_global: jax.Array, depth_global: jax.Array, n_rays: int,
    resolution: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Stitch a ray-sharded render into host images via the native tile
    stitcher (``runtime.assemble_tiles``): each device's addressable shard is
    one row-contiguous tile; on a multi-host mesh each host stitches its
    local tiles and host 0 concatenates (SURVEY.md §5.8 — all_gather of
    rendered tiles for image assembly, done host-side and outside the timed
    region, mirroring the reference's monitor placement
    ``benchmark_suite.py:194-208``)."""
    from nerf_tpu.runtime import assemble_tiles

    w, h = resolution

    def stitch(global_arr, channels):
        tiles, offsets = [], []
        for shard in global_arr.addressable_shards:
            sl = shard.index[0]
            offsets.append(int(sl.start or 0))
            tiles.append(np.asarray(shard.data))
        frame = assemble_tiles(tiles, offsets, global_arr.shape[0], channels)
        return frame[:n_rays]

    rgb = stitch(rgb_global, 3).reshape(h, w, 3)
    depth = stitch(depth_global.reshape(-1, 1), 1).reshape(h, w)
    return rgb, depth


def _make_sharded_render(params, cfg: Config, mesh: Mesh, spp: int, apply_fn):
    dt = jnp.dtype(cfg.train.compute_dtype)
    rcfg = cfg.render

    def local_render(params, ro, rd):
        # per-shard single-device code: works for jnp and Pallas evaluators
        pts, z = sample_points_on_rays(ro, rd, rcfg.near, rcfg.far, spp)
        dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
        sigma, rgb = apply_fn(params, pts, dirs, cfg.model, compute_dtype=dt)
        out = volume_render(sigma, rgb, z, rd, rcfg)
        return out.rgb, out.depth

    sharded = shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
    )
    return jax.jit(sharded)


def scaling_report(
    params,
    cfg: Config,
    resolution: Tuple[int, int] = (800, 600),
    spp: int = 64,
    focal: float = 800.0,
    device_counts: Optional[Sequence[int]] = None,
    apply_fn=apply_nerf,
    n_frames: int = 2,
    log=print,
    devices: Optional[Sequence[jax.Device]] = None,
    frame_path: Optional[str] = None,
) -> List[ScalingRow]:
    devices = list(devices) if devices is not None else jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]

    w, h = resolution
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    rays_o, rays_d = generate_rays(pose, w, h, focal)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)

    rows: List[ScalingRow] = []
    frame: Optional[Tuple[np.ndarray, np.ndarray]] = None
    base = None
    for nd in device_counts:
        mesh = make_mesh(n_data=nd, n_model=1, devices=devices[:nd])
        n = rays_o.shape[0]
        pad = (-n) % nd
        ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad else rays_d
        render = _make_sharded_render(params, cfg, mesh, spp, apply_fn)

        out = render(params, ro, rd)   # compile + warm
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n_frames):
            out = render(params, ro, rd)
        sync(out)
        t = (time.perf_counter() - t0) / n_frames

        rays_s = w * h / t
        eff = 1.0 if base is None else rays_s / (base * nd)
        if base is None:
            base = rays_s
        rows.append(ScalingRow(nd, t, rays_s, eff))
        log(f"  {nd} device(s): {t:.3f}s/frame  {rays_s:,.0f} rays/s  "
            f"efficiency {eff:.0%}")
        # image assembly from the per-device tiles (outside the timed
        # region): the native stitcher is the production path for turning a
        # sharded render into a host frame
        frame = assemble_frame(out[0], out[1], w * h, resolution)
    if frame_path is not None and frame is not None:
        from PIL import Image

        rgb, _ = frame
        Image.fromarray(
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        ).save(frame_path)
        log(f"  assembled frame (native tile stitch) -> {frame_path}")
    return rows
