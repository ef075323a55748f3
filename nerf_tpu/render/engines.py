"""Execution engines: same trained weights, different execution methods.

Capability parity with the reference's renderer zoo (``pytorch_renderers.py``,
``numpy_renderer.py``, ``cpu_optimized_renderer.py``, ``compressed_renderer.py``
behind the ``BaseUnifiedRenderer`` ABC): the unified-benchmark invariant is
"identical weights through N execution methods" (``benchmark_suite.py:173-175``).
On TPU the *device* axis collapses, so engines differ in execution strategy:

- ``xla``      — the jnp model under jit; XLA fuses posenc+MLP+compositing.
- ``pallas``   — the hand-fused Pallas MLP kernel (``ops/mlp_kernel.py``).
- ``compressed`` — int8-quantized + pruned weights in a Pallas kernel
  (``ops/quant.py``), the reference's CompressedNeRF capability.

All engines share one ``SharedModel`` (the reference's ``SharedNeRFModel``
singleton, made explicit) and one chunked render loop: a per-chunk jitted
executable (keyed on samples/chunk/mode, NOT resolution — one expensive
compile serves every image size) dispatched asynchronously from the host, so
chunk executions pipeline back-to-back on-device.

Benchmark-parity semantics (``base_renderer.py:223-281``): fine network only,
uniform unperturbed sampling, hardcoded focal=800 by default. The
``hierarchical`` mode renders coarse+fine with true importance sampling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import Config, ModelConfig, RenderConfig
from nerf_tpu.models.nerf import (
    NeRFParams,
    apply_nerf,
    init_nerf_params,
    load_bmild_weights,
)
from nerf_tpu.render.pipeline import render_rays
from nerf_tpu.train.checkpoint import restore_checkpoint
from nerf_tpu.train.trainer import init_train_state
from nerf_tpu.utils.cameras import BENCHMARK_FOCAL, generate_rays
from nerf_tpu.utils.monitor import PerformanceMonitor, PerfStats, device_info_string


class SharedModel:
    """Holds the one set of trained weights every engine benchmarks —
    the reference's ``SharedNeRFModel`` (``base_renderer.py:16-87``) without
    process-global state.

    Loading order: our ``.npz`` checkpoint, a reference-format torch ``.pth``
    (so a reference-trained ``final_model.pth`` benchmarks here directly),
    the bundled bmild ``.npy``, or — matching the reference's fallback
    (``base_renderer.py:62-76``) — randomly initialized weights when the
    path is missing (prints a warning).
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.params: Optional[Dict[str, NeRFParams]] = None  # {'coarse','fine'}

    def load(self, checkpoint_path: Optional[str]) -> "SharedModel":
        cfg = self.cfg
        if checkpoint_path and checkpoint_path.endswith((".pth", ".pt")):
            # reference torch checkpoint: {'coarse_model': sd, 'fine_model':
            # sd, ...} (written by the reference trainer.save_checkpoint,
            # ``trainer.py:374-388``; consumed by its benchmark suite,
            # ``base_renderer.py:28-78``) and our own cmd_export output.
            # torch-optional: only imported when a .pth is actually given.
            import torch

            from nerf_tpu.models.nerf import params_from_torch_state_dict

            # weights_only=True: the reference format is tensors in plain
            # containers; full unpickling would execute code from an
            # untrusted checkpoint
            ckpt = torch.load(checkpoint_path, map_location="cpu",
                              weights_only=True)
            self.params = {
                "coarse": params_from_torch_state_dict(
                    ckpt["coarse_model"], cfg.model),
                "fine": params_from_torch_state_dict(
                    ckpt["fine_model"], cfg.model),
            }
        elif checkpoint_path and checkpoint_path.endswith(".npy"):
            fine = load_bmild_weights(checkpoint_path)
            coarse_path = checkpoint_path.replace("model_fine_", "model_")
            coarse = (
                load_bmild_weights(coarse_path)
                if coarse_path != checkpoint_path and os.path.exists(coarse_path)
                else fine
            )
            self.params = {"coarse": coarse, "fine": fine}
        elif checkpoint_path and os.path.exists(checkpoint_path):
            from nerf_tpu.train.checkpoint import (
                has_checkpoint_meta,
                restore_bare_params,
            )

            if has_checkpoint_meta(checkpoint_path):
                template = init_train_state(jax.random.PRNGKey(0), cfg)
                state, _ = restore_checkpoint(checkpoint_path, template)
                self.params = state.params
            else:
                # params-only archive (keystr-flattened), e.g. the committed
                # convergence checkpoint — benchmarkable without opt state
                kc, kf = jax.random.split(jax.random.PRNGKey(0))
                template = {
                    "coarse": init_nerf_params(kc, cfg.model),
                    "fine": init_nerf_params(kf, cfg.model),
                }
                self.params = restore_bare_params(checkpoint_path, template)
        else:
            if checkpoint_path:
                print(f"warning: checkpoint {checkpoint_path} not found; "
                      "using randomly initialized weights (reference-compat fallback)")
            kc, kf = jax.random.split(jax.random.PRNGKey(0))
            self.params = {
                "coarse": init_nerf_params(kc, cfg.model),
                "fine": init_nerf_params(kf, cfg.model),
            }
        return self


@dataclass
class RenderResult:
    rgb: np.ndarray      # [H, W, 3]
    depth: np.ndarray    # [H, W]
    stats: PerfStats


class Engine:
    """One execution method. Subclasses set ``apply_fn`` (the MLP evaluator
    fed to the shared pipeline) and may override availability checks."""

    name = "base"
    description = "abstract"

    def __init__(self, shared: SharedModel, chunk_rays: int = 16384):
        self.shared = shared
        self.cfg = shared.cfg
        self.chunk_rays = chunk_rays
        self._render_cache: Dict[Tuple, Callable] = {}
        self._warmed: set = set()

    # -- to override --------------------------------------------------------

    def apply_fn(self):
        raise NotImplementedError

    def composite_fn(self):
        """Optional compositor override (None -> jnp ``volume_render``)."""
        return None

    def z_sampler(self):
        """Optional depth-placement override for benchmark mode:
        ``fn(rays_o, rays_d, spp, rcfg) -> z_vals [N, spp]`` (None -> uniform
        stratified, the reference's scheme)."""
        return None

    def sample_eval_fn(self):
        """Optional fully-fused sample-generation + evaluation for the
        uniform benchmark path: ``fn(params, ro, rd, near, far, spp) ->
        (sigma [N,S], rgb, z [N,S])`` (None -> XLA sampling + the engine's
        apply_fn). ``rgb`` is ``[N,S,3]``, or — from a planar-output Pallas
        override — a 3-tuple of ``[N,S]`` channel planes; both forms are
        consumed by ``fused_volume_render``/``volume_render``. Only
        consulted when no z_sampler overrides the depth placement."""
        return None

    def zvals_eval_fn(self):
        """Optional fused evaluation at arbitrary per-ray depths:
        ``fn(params, ro, rd, z [N,S]) -> (sigma [N,S], rgb)`` with ``rgb``
        either ``[N,S,3]`` or a 3-tuple of ``[N,S]`` planes (see
        ``sample_eval_fn``); None -> XLA point materialization + the
        engine's apply_fn. Used by the hierarchical fine pass and
        grid-guided (accel) sampling."""
        return None

    def raw_sample_eval_fn(self):
        """Optional raw-interleaved variant of ``sample_eval_fn``:
        ``fn(params, ro, rd, near, far, spp) -> (raw [N, 4S], z [N, S])``
        where ``raw`` is the ray-blocked kernel's interleaved output viewed
        row-major. Paired with ``raw_composite_fn``; preferred over the
        sliced forms when both are provided (the channel de-interleave then
        happens inside the compositor's VMEM — no strided HBM copy)."""
        return None

    def raw_zvals_eval_fn(self):
        """Optional raw-interleaved variant of ``zvals_eval_fn``:
        ``fn(params, ro, rd, z [N,S]) -> raw [N, 4S]``."""
        return None

    def raw_composite_fn(self):
        """Optional compositor consuming the raw interleaved layout:
        ``fn(raw [N, 4S], z [N,S], rd, rcfg) -> RenderOutputs``."""
        return None

    def composited_sample_eval_fn(self):
        """Optional fully-fused uniform render WITH in-kernel volume
        rendering: ``fn(params, ro, rd, rcfg, spp, with_weights) ->
        (RenderOutputs, z [N, S])`` — one kernel for the whole benchmark
        path (per-sample fields never reach HBM). Preferred over the raw
        pipeline when provided."""
        return None

    def composited_zvals_eval_fn(self):
        """Optional fused render + in-kernel volume rendering at arbitrary
        per-ray depths: ``fn(params, ro, rd, z, rcfg, with_weights) ->
        RenderOutputs`` (hierarchical fine pass, grid-guided sampling)."""
        return None

    @classmethod
    def is_available(cls) -> bool:
        return True

    def engine_params(self) -> Dict[str, NeRFParams]:
        """Engine-specific view of the shared weights (compressed engines
        transform them here)."""
        assert self.shared.params is not None, "call SharedModel.load first"
        return self.shared.params

    # -- shared machinery ---------------------------------------------------

    def _build_raygen(self, width: int, height: int, chunk: int):
        """Jitted camera model per resolution: pose -> padded [n_chunks,
        chunk, 3] ray origin/direction stacks. A trivial compile (meshgrid +
        one 3x3 rotate) — the expensive MLP/composite executable lives in
        ``_build_chunk_render`` and is shared across resolutions."""
        n = width * height
        n_pad = ((n + chunk - 1) // chunk) * chunk

        @jax.jit
        def raygen(pose, focal):
            rays_o, rays_d = generate_rays(pose, width, height, focal)
            rays_o = rays_o.reshape(-1, 3)
            rays_d = rays_d.reshape(-1, 3)
            if n_pad != n:
                rays_o = jnp.concatenate(
                    [rays_o, jnp.zeros((n_pad - n, 3), rays_o.dtype)], 0
                )
                rays_d = jnp.concatenate(
                    [rays_d, jnp.ones((n_pad - n, 3), rays_d.dtype)], 0
                )
            return (rays_o.reshape(-1, chunk, 3),
                    rays_d.reshape(-1, chunk, 3))

        return raygen

    def _build_chunk_render(self, spp: int, chunk: int, mode: str):
        """One jitted function per (spp, chunk, mode): MLP + compositing for
        a fixed-size ray chunk. Resolution-independent, so a 36-cell sweep
        compiles one of these per (engine, spp) instead of one per cell —
        through a tunneled TPU backend where a full-frame compile runs
        minutes, that is the difference between a feasible and an infeasible
        benchmark grid. Per-frame chunks dispatch asynchronously from a host
        loop and pipeline on-device (the executions queue back-to-back; the
        measured cost vs the old whole-frame ``lax.map`` jit is <1%)."""
        cfg = self.cfg
        apply_fn = self.apply_fn()
        composite_fn = self.composite_fn()
        z_sampler = self.z_sampler()
        sample_eval_fn = self.sample_eval_fn()
        zvals_eval_fn = self.zvals_eval_fn()
        raw_sample_eval_fn = self.raw_sample_eval_fn()
        raw_zvals_eval_fn = self.raw_zvals_eval_fn()
        raw_composite_fn = self.raw_composite_fn()
        use_raw = raw_composite_fn is not None and raw_zvals_eval_fn is not None
        comp_sample_fn = self.composited_sample_eval_fn()
        comp_zvals_fn = self.composited_zvals_eval_fn()
        dt = jnp.dtype(cfg.train.compute_dtype)

        if mode == "benchmark":
            rcfg = RenderConfig(
                near=cfg.render.near, far=cfg.render.far,
                n_coarse=spp, n_fine=spp, use_importance=False,
                white_background=cfg.render.white_background,
                dist_sentinel=cfg.render.dist_sentinel,
                transmittance_eps=cfg.render.transmittance_eps,
            )
        elif mode == "hierarchical":
            rcfg = cfg.render
        else:
            raise ValueError(f"unknown render mode {mode}")

        from nerf_tpu.utils.rendering import (
            sample_pdf,
            sample_points_on_rays,
            volume_render,
        )

        @jax.jit
        def render_chunk(params, ro, rd):

            def eval_at_z(net, ro, rd, z):
                """Evaluate one network at per-ray depths, fused if the
                engine provides it."""
                if zvals_eval_fn is not None:
                    return zvals_eval_fn(params[net], ro, rd, z)
                pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
                dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
                return apply_fn(params[net], pts, dirs, cfg.model,
                                compute_dtype=dt)

            def composite(sigma, rgb, z, rd):
                if composite_fn is not None:
                    return composite_fn(sigma, rgb, z, rd, rcfg)
                return volume_render(sigma, rgb, z, rd, rcfg)

            if mode == "benchmark":
                # fine-only uniform sampling (reference benchmark path)
                if z_sampler is not None:
                    z = z_sampler(ro, rd, spp, rcfg)
                    if comp_zvals_fn is not None:
                        # single kernel: sampling + MLP + volume rendering
                        out = comp_zvals_fn(params["fine"], ro, rd, z, rcfg,
                                            False)
                        return out.rgb, out.depth
                    if use_raw:
                        raw = raw_zvals_eval_fn(params["fine"], ro, rd, z)
                        out = raw_composite_fn(raw, z, rd, rcfg)
                        return out.rgb, out.depth
                    sigma, rgb = eval_at_z("fine", ro, rd, z)
                elif comp_sample_fn is not None:
                    # the fully-fused benchmark path: one pallas_call per
                    # chunk, [N, 8] out — nothing per-sample reaches HBM
                    out, _ = comp_sample_fn(
                        params["fine"], ro, rd, rcfg, spp, False
                    )
                    return out.rgb, out.depth
                elif use_raw and raw_sample_eval_fn is not None:
                    raw, z = raw_sample_eval_fn(
                        params["fine"], ro, rd, rcfg.near, rcfg.far, spp
                    )
                    out = raw_composite_fn(raw, z, rd, rcfg)
                    return out.rgb, out.depth
                elif sample_eval_fn is not None:
                    sigma, rgb, z = sample_eval_fn(
                        params["fine"], ro, rd, rcfg.near, rcfg.far, spp
                    )
                else:
                    pts, z = sample_points_on_rays(
                        ro, rd, rcfg.near, rcfg.far, spp
                    )
                    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
                    sigma, rgb = apply_fn(params["fine"], pts, dirs,
                                          cfg.model, compute_dtype=dt)
                out = composite(sigma, rgb, z, rd)
                return out.rgb, out.depth
            if (rcfg.use_importance and comp_sample_fn is not None
                    and comp_zvals_fn is not None):
                # hierarchical with in-kernel compositing on BOTH passes:
                # three dispatches total (coarse kernel -> pdf/sort glue ->
                # fine kernel) instead of the raw pipeline's five
                # (reference coarse+fine flow, ``trainer.py:294-316``)
                out_c, z_c = comp_sample_fn(
                    params["coarse"], ro, rd, rcfg, rcfg.n_coarse, True
                )
                z_new = sample_pdf(
                    z_c, jax.lax.stop_gradient(out_c.weights),
                    rcfg.n_fine, deterministic=True,
                )
                z_f = jnp.sort(
                    jnp.concatenate([z_c, z_new], axis=-1), axis=-1
                )
                out_f = comp_zvals_fn(params["fine"], ro, rd, z_f, rcfg,
                                      False)
                return out_f.rgb, out_f.depth
            if (rcfg.use_importance and use_raw
                    and raw_sample_eval_fn is not None):
                # fully fused hierarchical path, raw interleaved layout end
                # to end: positions AND per-channel planes never exist in
                # HBM; the compositor de-interleaves in VMEM
                raw_c, z_c = raw_sample_eval_fn(
                    params["coarse"], ro, rd, rcfg.near, rcfg.far,
                    rcfg.n_coarse,
                )
                out_c = raw_composite_fn(raw_c, z_c, rd, rcfg)
                z_new = sample_pdf(
                    z_c, jax.lax.stop_gradient(out_c.weights),
                    rcfg.n_fine, deterministic=True,
                )
                z_f = jnp.sort(
                    jnp.concatenate([z_c, z_new], axis=-1), axis=-1
                )
                raw_f = raw_zvals_eval_fn(params["fine"], ro, rd, z_f)
                out_f = raw_composite_fn(raw_f, z_f, rd, rcfg)
                return out_f.rgb, out_f.depth
            if (rcfg.use_importance and sample_eval_fn is not None
                    and zvals_eval_fn is not None):
                # fully fused hierarchical path: ray-blocked coarse pass,
                # inverse-CDF depths, ray-blocked fine pass at those
                # depths — positions never materialize in HBM
                sigma_c, rgb_c, z_c = sample_eval_fn(
                    params["coarse"], ro, rd, rcfg.near, rcfg.far,
                    rcfg.n_coarse,
                )
                out_c = composite(sigma_c, rgb_c, z_c, rd)
                z_new = sample_pdf(
                    z_c, jax.lax.stop_gradient(out_c.weights),
                    rcfg.n_fine, deterministic=True,
                )
                z_f = jnp.sort(
                    jnp.concatenate([z_c, z_new], axis=-1), axis=-1
                )
                sigma_f, rgb_f = eval_at_z("fine", ro, rd, z_f)
                out_f = composite(sigma_f, rgb_f, z_f, rd)
                return out_f.rgb, out_f.depth
            result = render_rays(
                params["coarse"], params["fine"], ro, rd,
                cfg.model, rcfg, key=None, perturb=False,
                compute_dtype=dt, apply_fn=apply_fn,
                composite_fn=composite_fn,
            )
            return result.fine.rgb, result.fine.depth

        return render_chunk

    def render_image(
        self,
        pose,
        resolution: Tuple[int, int],
        samples_per_ray: int = 64,
        focal: float = BENCHMARK_FOCAL,
        mode: str = "benchmark",
        monitor: bool = True,
    ) -> RenderResult:
        width, height = resolution
        n = width * height
        chunk = min(self.chunk_rays, n)
        ckey = (samples_per_ray, chunk, mode)
        if ckey not in self._render_cache:
            self._render_cache[ckey] = self._build_chunk_render(
                samples_per_ray, chunk, mode
            )
        rkey = ("raygen", width, height, chunk)
        if rkey not in self._render_cache:
            self._render_cache[rkey] = self._build_raygen(width, height, chunk)
        render_chunk = self._render_cache[ckey]
        raygen = self._render_cache[rkey]
        params = self.engine_params()
        pose = jnp.asarray(pose, jnp.float32)

        def render(params, pose, focal):
            ros, rds = raygen(pose, focal)
            outs = [render_chunk(params, ros[i], rds[i])
                    for i in range(ros.shape[0])]
            # chunks dispatch asynchronously and pipeline on-device; the
            # concatenate below queues behind them
            rgb = jnp.concatenate([o[0] for o in outs], axis=0)
            depth = jnp.concatenate([o[1] for o in outs], axis=0)
            rgb = rgb[:n].reshape(height, width, 3)
            depth = depth[:n].reshape(height, width)
            return rgb, depth

        # Warm the jit cache outside the timed region, ONCE per executable
        # (the reference times steady-state renders too; compile is once per
        # config). Subsequent frames at the same (spp, chunk, mode) skip the
        # warm render — at 800x600@128 a redundant warm-up doubles the cost
        # of every sweep cell. Honest timing of the measured call comes from
        # monitor.sync()'s host fetch (plain block_until_ready is unreliable
        # on remote-TPU backends).
        mon = PerformanceMonitor() if monitor else None
        if mon:
            from nerf_tpu.utils.monitor import sync

            if ckey not in self._warmed or rkey not in self._warmed:
                out = render(params, pose, jnp.float32(focal))
                sync(out)
                self._warmed.add(ckey)
                self._warmed.add(rkey)
            mon.start()
        rgb, depth = render(params, pose, jnp.float32(focal))
        stats = mon.stop((rgb, depth)) if mon else PerfStats()
        if mon and stats.peak_device_mb is None:
            # runtime memory_stats() is empty through tunneled TPU backends;
            # fall back to XLA's static memory analysis of the chunk
            # executable (arguments + outputs + temps = the HBM the render
            # actually reserves: weights, chunk ray/sample buffers, scratch)
            stats.peak_device_mb = self._executable_hbm_mb(
                ckey, render_chunk, raygen, params, pose, focal
            )
        return RenderResult(
            rgb=np.asarray(rgb), depth=np.asarray(depth), stats=stats
        )

    def _executable_hbm_mb(self, ckey, render_chunk, raygen, params, pose,
                           focal) -> Optional[float]:
        """Device-memory footprint of one chunk-render dispatch from
        ``compiled.memory_analysis()`` — the reference reports a per-backend
        memory axis (psutil RSS, ``base_renderer.py:118-154``); the TPU
        analog is per-executable HBM. Cached per (spp, chunk, mode); the
        lowering compile hits the persistent/jit cache, so this costs one
        host round-trip, not a recompile."""
        mkey = ("hbm_mb", ckey)
        if mkey in self._render_cache:
            return self._render_cache[mkey]
        mb: Optional[float] = None
        try:
            ros, rds = raygen(pose, jnp.float32(focal))
            compiled = render_chunk.lower(params, ros[0], rds[0]).compile()
            ma = compiled.memory_analysis()
            if ma is not None:
                total = (
                    getattr(ma, "argument_size_in_bytes", 0)
                    + getattr(ma, "output_size_in_bytes", 0)
                    + getattr(ma, "temp_size_in_bytes", 0)
                )
                if total:
                    mb = total / 1e6
        except Exception:
            mb = None
        self._render_cache[mkey] = mb
        return mb

    def device_info(self) -> str:
        return device_info_string()


class XLAEngine(Engine):
    name = "xla"
    description = "jnp model under jit (XLA-fused)"

    def apply_fn(self):
        return apply_nerf


class PallasEngine(Engine):
    name = "pallas"
    description = "fused Pallas MLP kernel (VMEM-resident weights)"

    def __init__(self, shared: SharedModel, chunk_rays: int = 16384,
                 block: int = 2048, block_samples: int = 2048,
                 interpret: Optional[bool] = None, planar: bool = False,
                 fuse_composite: bool = False,
                 raw_dtype: str = "float32"):
        super().__init__(shared, chunk_rays)
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        from nerf_tpu.ops.mlp_kernel import make_pallas_apply_fn

        self._apply = make_pallas_apply_fn(block=block, interpret=interpret)
        self._interpret = interpret
        # Opt-in planar output layout; see sample_eval_fn for why it is off.
        self._planar = planar
        # Raw interleaved pipeline (render kernel [N,4S] view -> compositor
        # de-interleaves in VMEM): the TPU-compiling replacement for planar.
        # scripts/tpu_smoke.py gates it on real hardware.
        self._raw_pipeline = not planar
        # Opt-in (round 5): volume rendering fused INTO the render kernel
        # (flat segmented roll-scan transmittance, [N, 8] out) — one
        # pallas_call per chunk, no inter-kernel HBM round trip. Exact on
        # TPU but measured 12% slower than the raw pipeline at 800x600@64
        # (the flat [B,1] layout uses 1/128 VPU lanes per compositing op;
        # results/perf/fuse_probe.json), so the raw interleaved pipeline
        # stays the default.
        self._fuse_composite = fuse_composite and not planar
        # MXU-schedule knob: rows per ray-blocked kernel grid step. Wider
        # blocks trade VMEM for matmul shape/pipeline depth (docs/PERF.md).
        self._block_samples = block_samples
        # Inter-kernel intermediate dtype for the raw pipeline: bfloat16
        # halves the [N, 4S] relayout + compositor-read HBM traffic.
        self._raw_dtype = jnp.dtype(raw_dtype)

    @classmethod
    def is_available(cls) -> bool:
        # interpret-mode fallback keeps it available off-TPU (slow but exact),
        # mirroring the reference's availability-probing registry
        return True

    def apply_fn(self):
        return self._apply

    def composite_fn(self):
        from nerf_tpu.ops.composite_kernel import fused_volume_render

        interpret = self._interpret

        def fn(sigma, rgb, z, rd, rcfg):
            return fused_volume_render(sigma, rgb, z, rd, rcfg,
                                       interpret=interpret)

        return fn

    def sample_eval_fn(self):
        from nerf_tpu.ops.render_kernel import fused_render_samples

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        planar = self._planar

        def fn(params, ro, rd, near, far, spp):
            # planar (opt-in, off by default): rgb as three [R, S] planes —
            # the fused compositor's native input, skipping the channel
            # de-interleave copy (docs/PERF.md, copy.20). Round 3 shipped
            # planar=True validated only in interpret mode; on real TPU the
            # plane-writer's one-hot matmul scatter hangs Mosaic lowering
            # (BENCH_r03 rc=124), so the interleaved [B,4] layout is the
            # default until a TPU-compiling plane writer lands.
            return fused_render_samples(
                params, ro, rd, near, far, spp, mcfg,
                block_samples=block_samples, interpret=interpret,
                planar=planar,
            )

        return fn

    def zvals_eval_fn(self):
        from nerf_tpu.ops.render_kernel import (
            fused_render_zvals,
            fused_render_zvals_planar,
        )

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        if self._planar:
            def fn(params, ro, rd, z):
                return fused_render_zvals_planar(params, ro, rd, z, mcfg,
                                                 block_samples,
                                                 interpret=interpret)
        else:
            def fn(params, ro, rd, z):
                return fused_render_zvals(params, ro, rd, z, mcfg,
                                          block_samples,
                                          interpret=interpret)

        return fn

    def raw_sample_eval_fn(self):
        if not self._raw_pipeline:
            return None
        from nerf_tpu.ops.render_kernel import fused_render_samples

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        raw_dtype = self._raw_dtype

        def fn(params, ro, rd, near, far, spp):
            return fused_render_samples(
                params, ro, rd, near, far, spp, mcfg,
                block_samples=block_samples, interpret=interpret, raw=True,
                raw_dtype=raw_dtype,
            )

        return fn

    def raw_zvals_eval_fn(self):
        if not self._raw_pipeline:
            return None
        from nerf_tpu.ops.render_kernel import fused_render_zvals_raw

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        raw_dtype = self._raw_dtype

        def fn(params, ro, rd, z):
            return fused_render_zvals_raw(params, ro, rd, z, mcfg,
                                          block_samples, interpret=interpret,
                                          raw_dtype=raw_dtype)

        return fn

    def raw_composite_fn(self):
        if not self._raw_pipeline:
            return None
        from nerf_tpu.ops.composite_kernel import (
            fused_volume_render_interleaved,
        )

        interpret = self._interpret

        def fn(raw, z, rd, rcfg):
            return fused_volume_render_interleaved(raw, z, rd, rcfg,
                                                   interpret=interpret)

        return fn

    def composited_sample_eval_fn(self):
        if not self._fuse_composite:
            return None
        from nerf_tpu.ops.render_kernel import (
            composited_to_outputs,
            fused_render_samples_composited,
        )

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        def fn(params, ro, rd, rcfg, spp, with_weights):
            res = fused_render_samples_composited(
                params, ro, rd, rcfg.near, rcfg.far, spp, mcfg,
                block_samples=block_samples, interpret=interpret,
                with_weights=with_weights,
                sentinel=rcfg.dist_sentinel, eps=rcfg.transmittance_eps,
            )
            if with_weights:
                out8, wts, z = res
            else:
                (out8, z), wts = res, None
            return composited_to_outputs(out8, wts, rcfg), z

        return fn

    def composited_zvals_eval_fn(self):
        if not self._fuse_composite:
            return None
        from nerf_tpu.ops.render_kernel import (
            composited_to_outputs,
            fused_render_zvals_composited,
        )

        interpret = self._interpret
        mcfg = self.cfg.model
        block_samples = self._block_samples

        def fn(params, ro, rd, z, rcfg, with_weights):
            res = fused_render_zvals_composited(
                params, ro, rd, z, mcfg, block_samples, interpret=interpret,
                with_weights=with_weights,
                sentinel=rcfg.dist_sentinel, eps=rcfg.transmittance_eps,
            )
            if with_weights:
                out8, wts = res
            else:
                out8, wts = res, None
            return composited_to_outputs(out8, wts, rcfg)

        return fn


class CompressedEngine(PallasEngine):
    name = "compressed"
    description = ("int8-quantized + pruned weights, fused ray-blocked "
                   "Pallas kernels (dequant in VMEM)")

    def __init__(self, shared: SharedModel, chunk_rays: int = 16384,
                 bits: int = 8, prune_fraction: float = 0.1,
                 act_bits: Optional[int] = None, pos_bound: float = 12.0,
                 **kw):
        super().__init__(shared, chunk_rays, **kw)
        self.bits = bits
        self.prune_fraction = prune_fraction
        self.act_bits = act_bits
        self.pos_bound = pos_bound
        self._qparams = None
        self._stats = None

    def engine_params(self):
        """Quantize once, lazily. The ray-blocked kernels inherited from
        ``PallasEngine`` accept ``QuantizedPackedWeights`` directly
        (``render_kernel._weights_for``) and dequantize inside VMEM — the
        compressed engine gets the same on-chip sample generation as pallas,
        with 4x (int8) / 2x (int16) less HBM weight traffic per grid step.
        Reference capability: ``compressed_renderer.py:181-187``."""
        if self._qparams is None:
            from nerf_tpu.ops.quant import quantize_model

            self._qparams, self._stats = quantize_model(
                Engine.engine_params(self), self.cfg.model,
                bits=self.bits, prune_fraction=self.prune_fraction,
                act_bits=self.act_bits, pos_bound=self.pos_bound,
            )
        return self._qparams

    def compression_stats(self):
        self.engine_params()
        return self._stats

    def apply_fn(self):
        # fallback for paths the fused kernels don't cover (materialized
        # positions); the benchmark + hierarchical paths use the inherited
        # sample_eval_fn/zvals_eval_fn with in-VMEM dequant
        from nerf_tpu.ops.quant import make_quantized_apply_fn

        return make_quantized_apply_fn(interpret=self._interpret)


class Int8ComputeEngine(CompressedEngine):
    name = "int8"
    description = ("int8 COMPUTE: s8 x s8 -> s32 MXU matmuls (2x bf16 peak "
                   "on v5e) with quantized activations; heads stay bf16")

    def __init__(self, shared: SharedModel, chunk_rays: int = 16384, **kw):
        kw.setdefault("act_bits", 8)
        super().__init__(shared, chunk_rays, **kw)


class AccelEngine(PallasEngine):
    name = "accel"
    description = ("occupancy-grid accelerated: fused Pallas MLP + grid-guided "
                   "sample placement (empty-space skipping)")

    def __init__(self, shared: SharedModel, chunk_rays: int = 16384,
                 grid_resolution: Optional[int] = None,
                 density_threshold: Optional[float] = None,
                 aabb: Optional[Tuple[float, float]] = None,
                 n_probe: Optional[int] = None,
                 probe_resolution: Optional[int] = None,
                 probe_ray_stride: Optional[int] = None,
                 grid_store: Optional[str] = None,
                 weight_mode: Optional[str] = None, **kw):
        super().__init__(shared, chunk_rays, **kw)
        # scene constants come from Config.accel (per-scene, checkpointable);
        # constructor args are overrides for experimentation
        acfg = shared.cfg.accel
        self.grid_resolution = grid_resolution or acfg.grid_resolution
        self.density_threshold = (
            acfg.density_threshold if density_threshold is None
            else density_threshold
        )
        self.aabb = tuple(aabb if aabb is not None else acfg.aabb)
        self.n_probe = n_probe or acfg.n_probe
        self.probe_resolution = (
            probe_resolution if probe_resolution is not None
            else getattr(acfg, "probe_resolution", 0)
        )
        self.probe_ray_stride = (
            probe_ray_stride if probe_ray_stride is not None
            else getattr(acfg, "probe_ray_stride", 1)
        )
        self.grid_store = grid_store or getattr(acfg, "grid_store", "binary")
        self.weight_mode = (
            weight_mode or getattr(acfg, "weight_mode", "occupancy")
        )
        self._grid = None

    def occupancy_grid(self):
        if self._grid is None:
            from nerf_tpu.ops.occupancy import (
                build_occupancy_grid,
                downsample_grid,
            )

            # grid baking uses the XLA evaluator: one-time cost, runs
            # identically on every backend (incl. CPU tests)
            grid = build_occupancy_grid(
                self.engine_params()["fine"], self.cfg.model,
                resolution=self.grid_resolution,
                aabb=self.aabb,
                density_threshold=self.density_threshold,
                store=self.grid_store,
            )
            if self.probe_resolution and self.probe_resolution < grid.resolution:
                # probe a dilated mip: fewer probes per ray can't miss
                # matter the full-resolution bake found
                grid = downsample_grid(
                    grid, grid.resolution // self.probe_resolution
                )
            self._grid = grid
        return self._grid

    def z_sampler(self):
        from nerf_tpu.ops.occupancy import grid_guided_z_vals

        grid = self.occupancy_grid()
        n_probe = self.n_probe
        stride = self.probe_ray_stride
        weight_mode = self.weight_mode

        def fn(ro, rd, spp, rcfg):
            return grid_guided_z_vals(
                grid, ro, rd, rcfg.near, rcfg.far, spp, n_probe=n_probe,
                ray_stride=stride, weight_mode=weight_mode,
            )

        return fn


ENGINE_CLASSES = {
    "xla": XLAEngine,
    "pallas": PallasEngine,
    "compressed": CompressedEngine,
    "int8": Int8ComputeEngine,
    "accel": AccelEngine,
}


def available_engines(shared: SharedModel, names=None) -> Dict[str, Engine]:
    """Probed engine registry (reference ``add_available_renderers``,
    ``benchmark_suite.py:45-94``): constructor failures skip the engine
    rather than aborting the run."""
    engines = {}
    for name, cls in ENGINE_CLASSES.items():
        if names is not None and name not in names:
            continue
        try:
            if cls.is_available():
                engines[name] = cls(shared)
        except Exception as e:  # pragma: no cover
            print(f"engine {name} unavailable: {e}")
    return engines
