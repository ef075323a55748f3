"""Ray-blocked fused render kernels: sample generation + MLP in one pass.

The general MLP kernel (``mlp_kernel.py``) streams per-*sample* inputs
(24 B/sample of positions+directions that XLA must first materialize in HBM
— measured at ~20% of frame time). These kernels block the grid over *rays*
and generate sample positions on-chip, so the positions/directions tensors
never exist in HBM:

- ``fused_render_samples`` — uniform depths (the benchmark render path,
  reference ``base_renderer.py:260-281`` semantics): reads 24 B/ray, z is an
  on-chip iota. Input bandwidth drops S-fold.
- ``fused_render_zvals`` — arbitrary per-ray depths ``z_vals [R, S]`` as a
  kernel input (4 B/sample instead of the unfused path's 24 B/sample): the
  hierarchical fine pass, grid-guided (accel) sampling, and perturbed
  training samples all get the fused treatment (reference semantics
  ``trainer.py:294-316``). Carries a custom VJP (backward recomputes via the
  XLA path, like ``fused_nerf_apply``) so the train step can call it.

Both generate positions as ``pos[n] = o[r] + d[r] * z[n]`` with the block in
r-major layout (row ``n = r * S + s``, per-ray values expanded through a
one-hot selector matmul), so the caller reshapes the output straight to
``[R, S, 4]`` with no de-interleave copy. Raw per-sample (sigma, rgb) feed
the fused compositor.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.nerf import NeRFParams, apply_nerf
from nerf_tpu.ops.mlp_kernel import (
    PackedWeights,
    _dir_branch,
    _nerf_math,
    _round_up,
    pack_params,
    packed_w_dict,
    packed_weight_arrays,
)


def _weights_for(params, cfg: ModelConfig, dtype):
    """Kernel weight arrays + in-kernel dict builder for any weight
    representation: a raw params pytree (packed here), pre-packed
    ``PackedWeights``, or int8/int16 ``QuantizedPackedWeights`` (dequantized
    inside VMEM per grid step) — the hook that gives the compressed engine
    the same ray-blocked fused treatment as the pallas engine."""
    from nerf_tpu.ops.quant import (
        Int8PackedWeights,
        QuantizedPackedWeights,
        quant_reprs,
    )

    if isinstance(params, (QuantizedPackedWeights, Int8PackedWeights)):
        return quant_reprs(params, cfg.variant, dtype)
    packed = (
        params if isinstance(params, PackedWeights)
        else pack_params(params, cfg, dtype=dtype)
    )
    return (
        packed_weight_arrays(packed, cfg.variant),
        functools.partial(packed_w_dict, variant=cfg.variant),
    )


def _plane_writer(n_rays: int, n_samples: int):
    """Build a writer that scatters per-sample [B, 1] channel columns into
    per-ray [R_b, S] planes entirely on the MXU — the planar layout the
    fused compositor consumes (four separate [R, S] inputs), so the
    interleaved [B, 4] output's channel de-interleave never happens as a
    strided HBM copy outside the kernel (it was ``copy.20``, 21 ms/frame =
    6% of the 800x600@64 headline in the round-3 trace). Mechanics:
    ``plane = selT @ (c * onehot_s)`` where ``selT [R_b, B]`` is the
    transposed one-hot ray selector and ``onehot_s [B, S]`` places row
    ``n = r*S + s`` in column ``s`` — every output element is one exact
    ``1.0 * c[n]`` product, so the result is bit-identical to a gather.
    CAUTION: this path hangs Mosaic lowering on real TPU (round-3 regression,
    BENCH_r03 rc=124) — it is opt-in until that is fixed; scripts/tpu_smoke.py
    is the gate that catches it."""
    R_b, S = n_rays, n_samples
    B = R_b * S
    rowT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 0)
    colT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 1)
    selT = (colT // S == rowT).astype(jnp.float32)
    zrow = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    zcol = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    onehot_s = (zrow % S == zcol).astype(jnp.float32)

    def to_plane(c):                                   # [B, 1] -> [R_b, S]
        return jnp.dot(selT, c * onehot_s,
                       preferred_element_type=jnp.float32)

    return to_plane


def _write_planar(out_refs, sigma, rgb, n_rays: int, n_samples: int):
    to_plane = _plane_writer(n_rays, n_samples)
    sig_ref, r_ref, g_ref, b_ref = out_refs
    sig_ref[:] = to_plane(sigma)
    r_ref[:] = to_plane(rgb[:, 0:1])
    g_ref[:] = to_plane(rgb[:, 1:2])
    b_ref[:] = to_plane(rgb[:, 2:3])


def _hilo_expand(sel: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact-to-~2^-16 one-hot expansion ``sel [B, R] @ x [R, C]`` in two
    default-precision passes. TPU's default f32 matmul is a single bf16
    pass, so a one-hot expansion silently rounds its payload to bf16; both
    split operands here are bf16-exact (``bf16(x)`` and the bf16 rounding
    of the residual), so the sum reconstructs x to ~2^-16 relative — at a
    third of HIGHEST's 6-pass cost, which is what matters on these tiny
    latency-bound matmuls (HIGHEST on the o/d expansion measured 7% of the
    800x600@64 frame)."""
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    # one stacked matmul (K doubled) instead of two: each product is still
    # an exact 1.0 * bf16-payload term and the f32 accumulation now simply
    # meets both halves in the same pass — measurably cheaper than two
    # launches of a skinny latency-bound matmul (same trick as _encode)
    sel2 = jnp.concatenate([sel, sel], axis=1)           # [B, 2R]
    x2 = jnp.concatenate([x_hi, x - x_hi], axis=0)       # [2R, C]
    return jnp.dot(sel2, x2, preferred_element_type=jnp.float32)


def _segmented_cumsum_excl(x: jnp.ndarray, seg: int) -> jnp.ndarray:
    """Exclusive prefix sum of ``x [B, C]`` within contiguous length-``seg``
    segments along axis 0 (``B % seg == 0``), as a Hillis-Steele doubling
    scan of sublane rolls — ceil(log2(seg)) exact f32 VPU adds, no matmuls,
    no reshapes (the two in-kernel relayout families Mosaic rejects or
    compiles pathologically: ``results/perf/planar_probe.json`` ``fold`` /
    ``matmul`` variants). ``pltpu.roll(x, k, axis=0)[n] = x[n - k]``; rows
    with ``n % seg < k`` would read across a segment (or wrap) and are
    masked off, which is exactly the segmented-scan boundary condition."""
    B = x.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % seg
    acc = x
    k = 1
    while k < seg:
        acc = acc + jnp.where(sub >= k, pltpu.roll(acc, shift=k, axis=0),
                              jnp.float32(0.0))
        k *= 2
    return acc - x


def _composite_flat(
    sigma: jnp.ndarray,       # [B, 1]
    rgb: jnp.ndarray,         # [B, 3]
    z: jnp.ndarray,           # [B, 1] per-sample depth (for the depth map)
    dists: jnp.ndarray,       # [B, 1] adjacent-diff distances * ||d||
    n_rays: int,
    n_samples: int,
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Volume rendering entirely in the render kernel's flat r-major layout
    (row ``n = r * S + s``): the TPU-native in-kernel form of
    ``composite_kernel._composite_kernel`` (same math, reference
    ``rendering.py:116-143``). The per-ray sequential dependence — the
    exclusive transmittance prefix — runs as a segmented roll scan in exact
    f32, and the per-ray reductions collapse through one one-hot
    ``selT [R_b, B] @ fields [B, 8]`` HIGHEST matmul. Returns
    ``(out [R_b, 8] = (r, g, b, depth, acc, 0, 0, 0), weights [B, 1])``.

    MEASURED NEGATIVE RESULT for the benchmark path (round 5,
    ``results/perf/fuse_probe.json``): this whole-pipeline fusion is exact
    (5.5e-6 vs the two-kernel pipeline on TPU) but 12% slower — every op
    here runs on ``[B, 1]``-shaped values, using 1 of 128 VPU lanes, so the
    ~30 narrow ops cost ~77 ms/frame at 800x600@64 where the two-kernel
    boundary (21 ms relayout + planar compositor working lane-dense
    ``[block, S]`` tiles) costs ~33 ms. Mosaic rejects every in-kernel path
    to a lane-dense layout (reshape: internal error; strided slice:
    vector_extract_strided_slice crash; selector-matmul scatter: measured
    slower still). Kept as the opt-in ``fuse_composite`` engine mode — it
    wins on executable count (one pallas_call, no inter-kernel HBM traffic),
    which matters under memory pressure, just not on this frame time."""
    R_b, S = n_rays, n_samples
    B = R_b * S
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # max(), not `1 - alpha + eps`: reassociation-proof (see composite_kernel)
    log_t = jnp.log(jnp.maximum(1.0 - alpha, jnp.float32(eps)))
    t_excl = jnp.exp(_segmented_cumsum_excl(log_t, S))
    w = alpha * t_excl                                  # [B, 1]

    rowT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 0)
    colT = jax.lax.broadcasted_iota(jnp.int32, (R_b, B), 1)
    selT = (colT // S == rowT).astype(jnp.float32)      # [R_b, B] ray gather
    pad = jnp.zeros_like(w)
    fields = jnp.concatenate([w * rgb, w * z, w, pad, pad, pad], axis=1)
    # HIGHEST: default f32 dot is one bf16 pass which would round every
    # weighted sample on the way into the per-ray sum; [R_b, B] x [B, 8] is
    # ~0.1%% of the block's MXU work
    out = jnp.dot(selT, fields, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)   # [R_b, 8]
    return out, w


def _ray_kernel(
    o_ref, d_ref, *rest,
    w_dict_fn, variant: str, skip_pos: int, Lp: int, Ld: int,
    relu_sigma: bool, dtype,
    normalize_dirs: bool, n_samples: int, near: float, far: float,
    planar: bool = False,
    composited: bool = False, with_weights: bool = False,
    sentinel: float = 1e10, eps: float = 1e-10,
):
    n_out = 4 if planar else (2 if (composited and with_weights) else 1)
    w = w_dict_fn(rest[:-n_out])
    out_ref = rest[-n_out]

    o = o_ref[:]                                   # [R_b, 3]
    d = d_ref[:]
    S = n_samples
    R_b = o.shape[0]

    B = R_b * S

    # r-major layout (row n = r * S + s) so the caller can reshape the output
    # straight to [R, S, 4] — the earlier s-major pltpu.repeat layout needed
    # a de-interleave transpose outside the kernel that cost 26 ms/frame
    # (7% of the 800x600@64 headline) as a strided HBM copy. Per-ray values
    # expand through a one-hot selector matmul (exact in f32, <1% of the
    # block's MXU work); z comes straight off the sample iota.
    row = jax.lax.broadcasted_iota(jnp.int32, (B, R_b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, R_b), 1)
    sel = (row // S == col).astype(jnp.float32)    # [B, R_b] one-hot ray id

    od = jnp.concatenate([o, d], axis=1)           # [R_b, 6]
    # Hi/lo-split expansion: the default one-hot expansion is a single bf16
    # pass that rounds ray origins/directions to bf16 BEFORE the positional
    # encoding — at the top band (2^9) that is ~2 rad of phase error,
    # measured as the entire 25 dB pallas-vs-xla quality gap on
    # object-dense views (round-5 fastmath probe, fuse_probe.json). Both
    # split matmuls move bf16-exact payloads, reconstructing o/d to ~2^-16
    # relative (0.02 rad at the top band) in 2 passes — HIGHEST's 6 passes
    # on this tiny latency-bound matmul cost 7% of the frame, measured.
    od_rep = _hilo_expand(sel, od)
    o_rep, d_rep = od_rep[:, :3], od_rep[:, 3:]

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) % S
    t = s_idx.astype(jnp.float32) / jnp.float32(S - 1)
    z = near + (far - near) * t                    # [B, 1]
    pos = o_rep + d_rep * z

    # direction branch once per RAY (directions are constant along a ray),
    # expanded r-major by the same selector — the per-sample normalization,
    # 27-wide encoding transcendentals, and wdir matmul were ~19% of frame
    # time when done per sample.
    cdir_ray = _dir_branch(d, w, Ld=Ld, dtype=dtype,
                           normalize_dirs=normalize_dirs)   # [R_b, 128]
    cdir = jnp.dot(sel, cdir_ray, preferred_element_type=jnp.float32)

    if planar:
        sigma, rgb = _nerf_math(
            pos, None, w, variant=variant, skip_pos=skip_pos,
            Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
            normalize_dirs=normalize_dirs, cdir=cdir, split_out=True,
        )
        _write_planar(rest[-4:], sigma, rgb, R_b, S)
        return

    if composited:
        sigma, rgb = _nerf_math(
            pos, None, w, variant=variant, skip_pos=skip_pos,
            Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
            normalize_dirs=normalize_dirs, cdir=cdir, split_out=True,
        )
        # uniform depths: every adjacent diff is the same constant, so dists
        # never touches the (bf16-rounded) expanded z — exact f32 throughout
        dz = (far - near) / (S - 1)
        dnorm_ray = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))  # [R_b,1]
        # expand per-ray ||d|| flat at HIGHEST so dists stay exact
        # ([B, R_b] x [R_b, 1]: negligible)
        dnorm = jnp.dot(sel, dnorm_ray, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)          # [B, 1]
        is_last = (s_idx == S - 1)
        dists = jnp.where(is_last, jnp.float32(sentinel), dz) * dnorm
        out, wts = _composite_flat(sigma, rgb, z, dists, R_b, S, eps)
        out_ref[:] = out
        if with_weights:
            rest[-1][:] = wts
        return

    res = _nerf_math(
        pos, None, w, variant=variant, skip_pos=skip_pos,
        Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
        normalize_dirs=normalize_dirs, cdir=cdir,
    )
    out_ref[:] = res.astype(out_ref.dtype)


def fused_render_samples(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    near: float,
    far: float,
    n_samples: int,
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    planar: bool = False,
    raw: bool = False,
    composited: bool = False,
    with_weights: bool = False,
    sentinel: float = 1e10,
    eps: float = 1e-10,
    raw_dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, Any, jnp.ndarray]:
    """Evaluate the network at uniform depths along every ray, generating the
    samples inside the kernel. Returns ``(sigma [R, S], rgb [R, S, 3],
    z_vals [R, S])``. Inference path (no VJP); requires S <= block_samples.

    ``raw=True`` returns ``(raw [R, 4S], z_vals)`` — the kernel's interleaved
    output as a free row-major view, for ``fused_volume_render_interleaved``
    (de-interleave happens in the compositor's VMEM; no strided HBM copy).
    ``planar=True`` returns rgb as a tuple of three ``[R, S]`` planes written
    directly by the kernel; its plane writer hangs Mosaic lowering on real
    TPU (round-3 regression) — kept opt-in for investigation only.
    ``composited=True`` runs volume rendering inside the kernel too
    (``_composite_flat``; reference ``base_renderer.py:190-221`` fuses
    compositing into each backend's render the same way) and returns
    ``(out [R, 8] = (r, g, b, depth, acc, 0, 0, 0), z_vals)`` — the whole
    per-sample field (4S floats/ray) never reaches HBM; with
    ``with_weights=True`` returns ``(out, weights [R, S], z_vals)`` (the
    hierarchical coarse pass's pdf input). White background is the caller's
    (needs only ``out[:, 4]``)."""
    S = n_samples
    assert S >= 2, "need at least 2 samples for the linspace"
    block_rays = max(1, block_samples // S)
    r = rays_o.shape[0]
    r_pad = _round_up(max(r, block_rays), block_rays)
    if r_pad != r:
        padding = jnp.zeros((r_pad - r, 3), jnp.float32)
        rays_o = jnp.concatenate([rays_o.astype(jnp.float32), padding], axis=0)
        rays_d = jnp.concatenate(
            [rays_d.astype(jnp.float32), jnp.ones((r_pad - r, 3), jnp.float32)],
            axis=0,
        )
    else:
        rays_o = rays_o.astype(jnp.float32)
        rays_d = rays_d.astype(jnp.float32)

    skip_pos = cfg.skip_layer if cfg.variant == "reference" else cfg.skip_layer + 1

    weight_arrays, w_dict_fn = _weights_for(params, cfg, dtype)
    weight_specs = [
        pl.BlockSpec(
            w.shape,
            (lambda i: (0, 0, 0)) if w.ndim == 3 else (lambda i: (0, 0)),
            memory_space=pltpu.VMEM,
        )
        for w in weight_arrays
    ]

    kernel = functools.partial(
        _ray_kernel,
        w_dict_fn=w_dict_fn,
        variant=cfg.variant,
        skip_pos=skip_pos,
        Lp=cfg.pos_freqs,
        Ld=cfg.dir_freqs,
        relu_sigma=(cfg.variant == "reference"),
        dtype=dtype,
        normalize_dirs=cfg.normalize_dirs,
        n_samples=S,
        near=float(near),
        far=float(far),
        planar=planar,
        composited=composited,
        with_weights=with_weights,
        sentinel=float(sentinel),
        eps=float(eps),
    )

    if planar:
        plane_spec = pl.BlockSpec((block_rays, S), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        plane_shape = jax.ShapeDtypeStruct((r_pad, S), jnp.float32)
        out_specs = (plane_spec,) * 4
        out_shape = (plane_shape,) * 4
    elif composited:
        out_specs = pl.BlockSpec((block_rays, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((r_pad, 8), jnp.float32)
        if with_weights:
            out_specs = (out_specs,
                         pl.BlockSpec((block_rays * S, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((r_pad * S, 1), jnp.float32))
    else:
        out_specs = pl.BlockSpec((block_rays * S, 4), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((r_pad * S, 4),
                                         raw_dtype if raw else jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(r_pad // block_rays,),
        in_specs=[
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # wide blocks (the MXU-schedule lever, docs/PERF.md) exceed the
            # default 16 MiB scoped-VMEM cap; v5e has 128 MiB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rays_o, rays_d, *weight_arrays)

    t = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
    z_vals = jnp.broadcast_to(near + (far - near) * t, (r, S))
    if planar:
        sig, rr, gg, bb = out
        return sig[:r], (rr[:r], gg[:r], bb[:r]), z_vals
    if composited:
        if with_weights:
            o8, wts = out
            # [r_pad*S, 1] -> [r_pad, S]: row-major contiguous, free view
            return o8[:r], wts.reshape(r_pad, S)[:r], z_vals
        return out[:r], z_vals
    if raw:
        # [r_pad*S, 4] -> [r, 4S]: row-major contiguous both ways (r-major
        # layout: element (r*S+s, c) lands at row r, col 4s+c), so this view
        # costs nothing. The interleaved compositor de-interleaves in VMEM
        # (composite_kernel._composite_kernel_interleaved) — the strided
        # channel-slice HBM copy below (copy.20, 21 ms = 6% of the headline
        # frame) never runs on this path.
        return out.reshape(r_pad, S * 4)[:r], z_vals
    out = out.reshape(r_pad, S, 4)[:r]             # r-major: direct reshape
    sigma = out[..., 0]
    rgb = out[..., 1:4]
    return sigma, rgb, z_vals


# ---------------------------------------------------------------------------
# Arbitrary per-ray depths (hierarchical / guided / perturbed sampling)
# ---------------------------------------------------------------------------


def _ray_z_kernel(
    o_ref, d_ref, z_ref, *rest,
    w_dict_fn, variant: str, skip_pos: int, Lp: int, Ld: int,
    relu_sigma: bool, dtype,
    normalize_dirs: bool, n_samples: int,
    planar: bool = False,
    composited: bool = False, with_weights: bool = False,
    sentinel: float = 1e10, eps: float = 1e-10,
):
    n_out = 4 if planar else (2 if (composited and with_weights) else 1)
    w = w_dict_fn(rest[:-n_out])
    out_ref = rest[-n_out]

    o = o_ref[:]                                   # [R_b, 3]
    d = d_ref[:]
    z = z_ref[:]                                   # [R_b, S]
    S = n_samples
    R_b = o.shape[0]
    B = R_b * S

    # r-major layout (row n = r * S + s), built with MXU/VPU-native ops only
    # — no reshapes or transposes that would force a VMEM relayout:
    #   sel[n, r'] = (n // S == r')        one-hot ray selector [B, R_b]
    #   o_rep/d_rep = sel @ [o | d]        (f32 matmul of a one-hot: exact)
    #   z_col[n] = rowsum((sel @ z) * onehot_s), onehot_s[n, s'] = (n % S == s')
    row = jax.lax.broadcasted_iota(jnp.int32, (B, R_b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, R_b), 1)
    sel = (row // S == col).astype(jnp.float32)

    od = jnp.concatenate([o, d], axis=1)           # [R_b, 6]
    # hi/lo-split expansion — see _ray_kernel (default's single bf16 pass
    # rounds positions before the encoding; measured 25 dB gate cost)
    od_rep = _hilo_expand(sel, od)
    o_rep, d_rep = od_rep[:, :3], od_rep[:, 3:]

    zrow = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    zcol = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    onehot_s = (zrow % S == zcol).astype(jnp.float32)
    # Hi/lo-split gather (ALL paths, round 5): the default one-hot gather
    # rounds z to bf16 (abs ~2^-9 * z) — sample positions then carry the
    # same top-band posenc phase error as the o/d expansion above, and the
    # composited path's adjacent-z diffs are comparable to the error
    # itself.
    z_rep = _hilo_expand(sel, z)                                  # [B, S]
    z_col = jnp.sum(z_rep * onehot_s, axis=1, keepdims=True)      # [B, 1]

    pos = o_rep + d_rep * z_col

    # direction branch once per ray, expanded r-major by the same selector
    cdir_ray = _dir_branch(d, w, Ld=Ld, dtype=dtype,
                           normalize_dirs=normalize_dirs)         # [R_b, 128]
    cdir = jnp.dot(sel, cdir_ray, preferred_element_type=jnp.float32)

    if planar:
        sigma, rgb = _nerf_math(
            pos, None, w, variant=variant, skip_pos=skip_pos,
            Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
            normalize_dirs=normalize_dirs, cdir=cdir, split_out=True,
        )
        _write_planar(rest[-4:], sigma, rgb, R_b, S)
        return

    if composited:
        sigma, rgb = _nerf_math(
            pos, None, w, variant=variant, skip_pos=skip_pos,
            Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
            normalize_dirs=normalize_dirs, cdir=cdir, split_out=True,
        )
        dnorm_ray = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))  # [R_b,1]
        dnorm = jnp.dot(sel, dnorm_ray, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)          # [B, 1]
        # adjacent diff along the flat layout: roll(x, B-1)[n] = x[n+1];
        # the cross-ray row (s == S-1) is masked to the sentinel
        z_next = pltpu.roll(z_col, shift=B - 1, axis=0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) % S
        is_last = (sub == S - 1)
        dists = jnp.where(is_last, jnp.float32(sentinel),
                          z_next - z_col) * dnorm
        out, wts = _composite_flat(sigma, rgb, z_col, dists, R_b, S, eps)
        out_ref[:] = out
        if with_weights:
            rest[-1][:] = wts
        return

    res = _nerf_math(
        pos, None, w, variant=variant, skip_pos=skip_pos,
        Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
        normalize_dirs=normalize_dirs, cdir=cdir,
    )
    out_ref[:] = res.astype(out_ref.dtype)


def _zvals_forward(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    cfg: ModelConfig,
    block_samples: int,
    dtype: Any,
    interpret: bool,
    planar: bool = False,
    raw: bool = False,
    composited: bool = False,
    with_weights: bool = False,
    sentinel: float = 1e10,
    eps: float = 1e-10,
    raw_dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, Any]:
    r, S = z_vals.shape
    block_rays = max(8, (block_samples // S) // 8 * 8)
    r_pad = _round_up(max(r, block_rays), block_rays)
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    z_vals = z_vals.astype(jnp.float32)
    if r_pad != r:
        pad = r_pad - r
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), jnp.float32)], 0)
        rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3), jnp.float32)], 0)
        z_vals = jnp.concatenate(
            [z_vals, jnp.ones((pad, S), jnp.float32)], 0
        )

    skip_pos = cfg.skip_layer if cfg.variant == "reference" else cfg.skip_layer + 1

    weight_arrays, w_dict_fn = _weights_for(params, cfg, dtype)
    weight_specs = [
        pl.BlockSpec(
            w.shape,
            (lambda i: (0, 0, 0)) if w.ndim == 3 else (lambda i: (0, 0)),
            memory_space=pltpu.VMEM,
        )
        for w in weight_arrays
    ]

    kernel = functools.partial(
        _ray_z_kernel,
        w_dict_fn=w_dict_fn,
        variant=cfg.variant,
        skip_pos=skip_pos,
        Lp=cfg.pos_freqs,
        Ld=cfg.dir_freqs,
        relu_sigma=(cfg.variant == "reference"),
        dtype=dtype,
        normalize_dirs=cfg.normalize_dirs,
        n_samples=S,
        planar=planar,
        composited=composited,
        with_weights=with_weights,
        sentinel=float(sentinel),
        eps=float(eps),
    )

    if planar:
        plane_spec = pl.BlockSpec((block_rays, S), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        plane_shape = jax.ShapeDtypeStruct((r_pad, S), jnp.float32)
        out_specs = (plane_spec,) * 4
        out_shape = (plane_shape,) * 4
    elif composited:
        out_specs = pl.BlockSpec((block_rays, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((r_pad, 8), jnp.float32)
        if with_weights:
            out_specs = (out_specs,
                         pl.BlockSpec((block_rays * S, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((r_pad * S, 1), jnp.float32))
    else:
        out_specs = pl.BlockSpec((block_rays * S, 4), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((r_pad * S, 4),
                                         raw_dtype if raw else jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(r_pad // block_rays,),
        in_specs=[
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # wide blocks (the MXU-schedule lever, docs/PERF.md) exceed the
            # default 16 MiB scoped-VMEM cap; v5e has 128 MiB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rays_o, rays_d, z_vals, *weight_arrays)

    if planar:
        sig, rr, gg, bb = out
        return sig[:r], (rr[:r], gg[:r], bb[:r])
    if composited:
        if with_weights:
            o8, wts = out
            return o8[:r], wts.reshape(r_pad, S)[:r]
        return out[:r]
    if raw:
        return out.reshape(r_pad, S * 4)[:r]       # free view; see samples
    out = out.reshape(r_pad, S, 4)[:r]             # r-major: direct reshape
    return out[..., 0], out[..., 1:4]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_render_zvals(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the network at arbitrary per-ray depths, generating the
    sample positions inside the kernel. Returns ``(sigma [R, S],
    rgb [R, S, 3])``. Differentiable w.r.t. params (backward recomputes via
    the XLA path, as ``fused_nerf_apply`` does); z_vals/rays are data —
    their cotangents are structurally zero in the training graph (importance
    depths are stop-gradient'd, reference ``rendering.py:54-100`` semantics).
    """
    return _zvals_forward(
        params, rays_o, rays_d, z_vals, cfg, block_samples, dtype, interpret
    )


def _zvals_fwd(params, rays_o, rays_d, z_vals, cfg, block_samples, dtype,
               interpret):
    out = fused_render_zvals(
        params, rays_o, rays_d, z_vals, cfg, block_samples, dtype, interpret
    )
    return out, (params, rays_o, rays_d, z_vals)


def _zvals_bwd(cfg, block_samples, dtype, interpret, residuals, cotangents):
    params, rays_o, rays_d, z_vals = residuals

    def f(p):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        return apply_nerf(p, pts, dirs, cfg, compute_dtype=dtype)

    _, vjp = jax.vjp(f, params)
    (dparams,) = vjp(cotangents)
    return (dparams, jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
            jnp.zeros_like(z_vals))


fused_render_zvals.defvjp(_zvals_fwd, _zvals_bwd)


def fused_render_zvals_planar(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Inference-only variant of ``fused_render_zvals`` whose rgb comes back
    as three ``[R, S]`` planes written by the kernel (see ``_plane_writer``)
    — the fused compositor's native input layout, skipping the interleaved
    output's channel de-interleave copy. The VJP-carrying
    ``fused_render_zvals`` keeps the ``[R, S, 3]`` contract for training.
    CAUTION: hangs Mosaic lowering on real TPU (see ``_plane_writer``);
    use ``fused_render_zvals_raw`` + the interleaved compositor instead."""
    return _zvals_forward(
        params, rays_o, rays_d, z_vals, cfg, block_samples, dtype, interpret,
        planar=True,
    )


def composited_to_outputs(out8: jnp.ndarray, weights, rcfg):
    """``[R, 8]`` composited-kernel output -> ``RenderOutputs``, applying the
    white-background blend (reference ``rendering.py:140-142``) on the tiny
    per-ray maps. ``weights`` may be None (benchmark path: nothing downstream
    reads them; a zero-column placeholder keeps the pytree shape)."""
    from nerf_tpu.utils.rendering import RenderOutputs

    rgb = out8[:, 0:3]
    depth = out8[:, 3]
    acc = out8[:, 4]
    if rcfg.white_background:
        rgb = rgb + (1.0 - acc[:, None])
    if weights is None:
        weights = jnp.zeros((out8.shape[0], 1), jnp.float32)
    return RenderOutputs(rgb, depth, acc, weights)


def fused_render_samples_composited(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    near: float,
    far: float,
    n_samples: int,
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    with_weights: bool = False,
    sentinel: float = 1e10,
    eps: float = 1e-10,
):
    """Uniform-depth render with volume rendering fused into the same kernel
    (see ``fused_render_samples`` ``composited=True``): one pallas_call per
    chunk, ``[R, 8]`` out — the per-sample field stays in VMEM. Returns
    ``(out [R, 8], z_vals)`` or ``(out, weights [R, S], z_vals)``."""
    return fused_render_samples(
        params, rays_o, rays_d, near, far, n_samples, cfg,
        block_samples=block_samples, dtype=dtype, interpret=interpret,
        composited=True, with_weights=with_weights,
        sentinel=sentinel, eps=eps,
    )


def fused_render_zvals_composited(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    with_weights: bool = False,
    sentinel: float = 1e10,
    eps: float = 1e-10,
):
    """Arbitrary-depth render with in-kernel volume rendering (inference;
    the hierarchical fine pass and grid-guided sampling). Returns
    ``out [R, 8]`` or ``(out, weights [R, S])``."""
    return _zvals_forward(
        params, rays_o, rays_d, z_vals, cfg, block_samples, dtype, interpret,
        composited=True, with_weights=with_weights,
        sentinel=sentinel, eps=eps,
    )


def fused_render_zvals_raw(
    params: NeRFParams,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    cfg: ModelConfig,
    block_samples: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    raw_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Inference-only variant of ``fused_render_zvals`` returning the
    kernel's interleaved output as a free ``[R, 4S]`` view, for
    ``fused_volume_render_interleaved`` (channel de-interleave happens in
    the compositor's VMEM instead of as a strided HBM copy). ``raw_dtype=
    bfloat16`` halves the intermediate's HBM footprint (see
    ``fused_render_samples``)."""
    return _zvals_forward(
        params, rays_o, rays_d, z_vals, cfg, block_samples, dtype, interpret,
        raw=True, raw_dtype=raw_dtype,
    )
