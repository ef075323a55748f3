"""Fused alpha-compositing (volume rendering) as a Pallas TPU kernel.

The native-kernel counterpart of the reference's per-backend compositors
(PyTorch tensor ops ``pytorch_renderers.py:22-42``, the Numba scalar-loop
kernel ``numpy_renderer.py:39-79``, fp16 ``compressed_renderer.py:233-269``),
with reference-exact numerics (``rendering.py:116-143``): 1e10 sentinel last
distance scaled by ||d||, alpha = 1 - exp(-relu(sigma) * dist), exclusive
cumulative transmittance with +1e-10, weights -> rgb/depth/acc maps.

TPU-native formulation of the sequential part: the exclusive prefix-product
along the sample axis is computed in log space as a matmul with a constant
strictly-lower-triangular ones matrix —

    T_excl[r, s] = exp( sum_{t<s} log(1 - alpha[r, t] + eps) )
                 = exp( (log(1 - alpha + eps) @ U)[r, s] ),  U[t, s] = [t < s]

which runs on the MXU in one pass instead of a serial scan (the Numba
backend's early-ray-termination break, ``numpy_renderer.py:76-77``, is a
scalar-loop concept that does not map to SIMD hardware and was already a
behavioral divergence inside the reference — dropped here, SURVEY.md §7.4).

Differentiable via custom VJP: backward recomputes with the jnp path
(``utils.rendering.volume_render``) — exact XLA gradients, nothing stashed.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.config import RenderConfig
from nerf_tpu.utils.rendering import RenderOutputs, volume_render


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _composite_kernel(
    sigma_ref, r_ref, g_ref, b_ref, z_ref, dnorm_ref, tri_ref,
    out_ref, w_ref, *, sentinel: float, eps: float, n_samples: int,
):
    z = z_ref[:]                                        # [R, S]
    sigma = sigma_ref[:]
    dnorm = dnorm_ref[:]                                # [R, 1]

    # dists: adjacent diffs, sentinel last, scaled by ||d||. The shifted
    # z is built with pltpu.roll (lane rotate) + a mask for the last column.
    # left-rotate by one lane (roll only accepts non-negative shifts)
    z_next = pltpu.roll(z, shift=n_samples - 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    is_last = col == (n_samples - 1)
    dists = jnp.where(is_last, jnp.float32(sentinel), z_next - z)
    dists = dists * dnorm

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # NOT `1 - alpha + eps`: the compiler reassociates that to
    # `(1 + eps) - alpha`, which folds to `1 - alpha` in f32 and sends
    # log() to -inf at alpha == 1 (the sentinel sample). max() is
    # reassociation-proof and differs from the reference's `+eps` by at
    # most eps itself.
    log_t = jnp.log(jnp.maximum(1.0 - alpha, jnp.float32(eps)))
    # exclusive prefix product via triangular matmul (see module docstring);
    # HIGHEST keeps the partial sums at true f32 (TPU default f32 matmul is
    # a single bf16 pass — ~1e-3 abs error on rgb, measured)
    t_excl = jnp.exp(
        jnp.dot(log_t, tri_ref[:], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    )
    w = alpha * t_excl                                  # [R, S]
    w_ref[:] = w

    rgb_r = jnp.sum(w * r_ref[:], axis=1, keepdims=True)
    rgb_g = jnp.sum(w * g_ref[:], axis=1, keepdims=True)
    rgb_b = jnp.sum(w * b_ref[:], axis=1, keepdims=True)
    depth = jnp.sum(w * z, axis=1, keepdims=True)
    acc = jnp.sum(w, axis=1, keepdims=True)
    pad = jnp.zeros_like(acc)
    out_ref[:] = jnp.concatenate(
        [rgb_r, rgb_g, rgb_b, depth, acc, pad, pad, pad], axis=1
    )


def _composite_kernel_interleaved(
    raw_ref, p_sig_ref, p_r_ref, p_g_ref, p_b_ref, z_ref, dnorm_ref, tri_ref,
    out_ref, w_ref, *, sentinel: float, eps: float, n_samples: int,
):
    """Composite straight from the render kernel's interleaved output.

    ``raw_ref`` holds [block, 4S] rows — the ray-blocked kernel's r-major
    [B, 4] output viewed as [R, 4S] (row r = (sigma, r, g, b) per sample,
    s-major; the view is a FREE reshape, row-major contiguous both ways).
    The per-channel [R, S] planes are built here, in VMEM, by four
    [block, 4S] x [4S, S] matmuls against constant one-hot selectors passed
    as kernel *inputs* (P_c[4s + c, s] = 1) — each output element is one
    exact 1.0 * x product (bit-identical to a gather), ~0.4% of frame FLOPs
    on the MXU. This kills the channel de-interleave that ran as a strided
    HBM copy between the kernels (``copy.20``, 21 ms = 6% of the 800x600@64
    headline), replacing the round-3 planar-output attempt whose in-kernel
    iota scatter hung Mosaic lowering (BENCH_r03; scripts/planar_probe.py
    documents the probes)."""
    raw = raw_ref[:].astype(jnp.float32)                # [R, 4S]
    # HIGHEST precision is required for exactness: TPU DEFAULT f32 matmul is
    # a single bf16 pass, which would round every sigma/rgb value to bf16 on
    # the way through the selector (caught by the TPU allclose probe; the
    # multi-pass f32 algorithm is exact for a one-hot operand). A bf16 raw
    # input (the halved-intermediate mode) is cast up first; its values are
    # bf16-exact so the selectors stay exact gathers either way.
    hi = jax.lax.Precision.HIGHEST
    sigma = jnp.dot(raw, p_sig_ref[:], precision=hi,
                    preferred_element_type=jnp.float32)
    r = jnp.dot(raw, p_r_ref[:], precision=hi,
                preferred_element_type=jnp.float32)
    g = jnp.dot(raw, p_g_ref[:], precision=hi,
                preferred_element_type=jnp.float32)
    b = jnp.dot(raw, p_b_ref[:], precision=hi,
                preferred_element_type=jnp.float32)

    z = z_ref[:]                                        # [R, S]
    dnorm = dnorm_ref[:]                                # [R, 1]
    z_next = pltpu.roll(z, shift=n_samples - 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    is_last = col == (n_samples - 1)
    dists = jnp.where(is_last, jnp.float32(sentinel), z_next - z)
    dists = dists * dnorm

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    log_t = jnp.log(jnp.maximum(1.0 - alpha, jnp.float32(eps)))
    # HIGHEST: default bf16 one-pass rounds the log-transmittance partial
    # sums (~1e-3 abs on rgb); the [R,S]x[S,S] dot is <1% of frame FLOPs
    t_excl = jnp.exp(
        jnp.dot(log_t, tri_ref[:], precision=hi,
                preferred_element_type=jnp.float32)
    )
    w = alpha * t_excl                                  # [R, S]
    w_ref[:] = w

    rgb_r = jnp.sum(w * r, axis=1, keepdims=True)
    rgb_g = jnp.sum(w * g, axis=1, keepdims=True)
    rgb_b = jnp.sum(w * b, axis=1, keepdims=True)
    depth = jnp.sum(w * z, axis=1, keepdims=True)
    acc = jnp.sum(w, axis=1, keepdims=True)
    pad = jnp.zeros_like(acc)
    out_ref[:] = jnp.concatenate(
        [rgb_r, rgb_g, rgb_b, depth, acc, pad, pad, pad], axis=1
    )


@functools.lru_cache(maxsize=8)
def _channel_selectors(s: int):
    """Constant one-hot de-interleave selectors: P_c [4S, S] with
    P_c[4*smp + c, smp] = 1 for channel c in (sigma, r, g, b)."""
    sels = []
    for c in range(4):
        p = np.zeros((4 * s, s), np.float32)
        p[4 * np.arange(s) + c, np.arange(s)] = 1.0
        sels.append(p)
    return sels


def fused_volume_render_interleaved(
    raw: jnp.ndarray,        # [N, 4*S]: r-major interleaved (sigma,r,g,b)
    z_vals: jnp.ndarray,     # [N, S]
    rays_d: jnp.ndarray,     # [N, 3]
    cfg: RenderConfig = RenderConfig(),
    block: int = 1024,
    interpret: bool = False,
) -> RenderOutputs:
    """``fused_volume_render`` consuming the ray-blocked render kernels'
    raw interleaved output directly (see ``_composite_kernel_interleaved``).
    Inference-only (the render paths); training keeps the [N, S, 3]
    contract through ``fused_volume_render``'s VJP."""
    n, s4 = raw.shape
    s = s4 // 4
    n_pad = _round_up(max(n, block), block)

    def padr(x, fill=0.0):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n, *x.shape[1:]), fill, x.dtype)], axis=0
        )

    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    tri = jnp.asarray(np.triu(np.ones((s, s), np.float32), 1))
    p_sig, p_r, p_g, p_b = (jnp.asarray(p) for p in _channel_selectors(s))

    stream = lambda i: (i, 0)
    resident = lambda i: (0, 0)
    sel_spec = pl.BlockSpec((4 * s, s), resident, memory_space=pltpu.VMEM)
    out, w = pl.pallas_call(
        functools.partial(
            _composite_kernel_interleaved,
            sentinel=cfg.dist_sentinel,
            eps=cfg.transmittance_eps,
            n_samples=s,
        ),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, 4 * s), stream, memory_space=pltpu.VMEM),
            sel_spec, sel_spec, sel_spec, sel_spec,
            pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), resident, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, 8), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the hierarchical fine pass runs S = n_coarse + n_fine = 192:
            # the [block, 4S] input + selector layouts then need ~21 MB of
            # scoped VMEM, over the 16 MB default (caught by the round-4
            # tpu_smoke run — fast AOT error, not a hang); v5e has 128 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padr(raw), p_sig, p_r, p_g, p_b, padr(z_vals, 1.0), padr(dnorm, 1.0),
      tri)
    out, w = out[:n], w[:n]
    rgb_map = out[:, 0:3]
    depth = out[:, 3]
    acc = out[:, 4]
    if cfg.white_background:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    return RenderOutputs(rgb_map, depth, acc, w)


def _pallas_composite(
    sigma, rgb, z_vals, rays_d, cfg: RenderConfig, block: int, interpret: bool
):
    n, s = sigma.shape
    n_pad = _round_up(max(n, block), block)

    def padr(x, fill=0.0):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n, *x.shape[1:]), fill, x.dtype)], axis=0
        )

    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # U[t, s] = 1 iff t < s, so (L @ U)[r, s] = sum_{t<s} L[r, t]
    tri = jnp.asarray(np.triu(np.ones((s, s), np.float32), 1))

    # rgb arrives either as [N, S, 3] (XLA-materialized) or as a tuple of
    # three [N, S] planes straight from the planar render kernels — the
    # kernel consumes planes either way, so the tuple form skips the
    # channel-slice relayout entirely
    if isinstance(rgb, tuple):
        rgb_r, rgb_g, rgb_b = rgb
    else:
        rgb_r, rgb_g, rgb_b = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    stream = lambda i: (i, 0)
    resident = lambda i: (0, 0)
    args = [
        padr(sigma), padr(rgb_r), padr(rgb_g), padr(rgb_b),
        padr(z_vals, 1.0), padr(dnorm, 1.0), tri,
    ]
    in_specs = [
        pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((s, s), resident, memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _composite_kernel,
        sentinel=cfg.dist_sentinel,
        eps=cfg.transmittance_eps,
        n_samples=s,
    )
    out, w = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block, 8), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, s), stream, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(*args)
    return out[:n], w[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_volume_render(
    sigma: jnp.ndarray,      # [N, S]
    rgb: jnp.ndarray,        # [N, S, 3]
    z_vals: jnp.ndarray,     # [N, S]
    rays_d: jnp.ndarray,     # [N, 3]
    cfg: RenderConfig = RenderConfig(),
    block: int = 1024,
    interpret: bool = False,
) -> RenderOutputs:
    """Drop-in fused replacement for ``utils.rendering.volume_render``
    (deterministic path; density noise is a training-only feature of the jnp
    path)."""
    out, w = _pallas_composite(sigma, rgb, z_vals, rays_d, cfg, block, interpret)
    rgb_map = out[:, 0:3]
    depth = out[:, 3]
    acc = out[:, 4]
    if cfg.white_background:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    return RenderOutputs(rgb_map, depth, acc, w)


def _fvr_fwd(sigma, rgb, z_vals, rays_d, cfg, block, interpret):
    out = fused_volume_render(sigma, rgb, z_vals, rays_d, cfg, block, interpret)
    return out, (sigma, rgb, z_vals, rays_d)


def _fvr_bwd(cfg, block, interpret, residuals, ct):
    sigma, rgb, z_vals, rays_d = residuals

    def f(sigma, rgb, z_vals, rays_d):
        # the planar form (tuple of [N, S] planes) stacks to [N, S, 3] for
        # the jnp recompute; jax.vjp mirrors the pytree back as tuple
        # cotangents automatically
        rgb_arr = jnp.stack(rgb, axis=-1) if isinstance(rgb, tuple) else rgb
        return tuple(volume_render(sigma, rgb_arr, z_vals, rays_d, cfg))

    _, vjp = jax.vjp(f, sigma, rgb, z_vals, rays_d)
    return vjp(tuple(ct))


fused_volume_render.defvjp(_fvr_fwd, _fvr_bwd)
