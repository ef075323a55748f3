"""Compressed NeRF: magnitude pruning + intN weight quantization with a
Pallas dequantize-on-chip kernel.

Capability parity with reference ``src/benchmark/compressed_renderer.py``:
per-tensor magnitude pruning at a quantile threshold
(``compressed_renderer.py:89-104``), affine int8/int16 quantization
(``:106-145``), reduced-precision compute (``:181-187`` fp16), and a
compression-stats report (``:271-309``). Defaults match the reference: 8-bit,
10% prune (``:28-33``).

TPU-native differences:
- symmetric per-output-channel scales (better than the reference's per-tensor
  affine for MLPs, and zero-point-free so dequant is one multiply);
- weights ship to the kernel as int8/int16 and are dequantized *inside VMEM*
  per grid step — HBM weight traffic drops 4x/2x vs f32. Dequant cost is
  O(weights) per block vs O(block x weights) matmul FLOPs: noise.
- compute stays bf16 on the MXU (the reference dequantizes to fp32/fp16 on
  the host side, ``:147-159``).

Inference-only by design, like the reference's compressed renderer.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.nerf import NeRFParams
from nerf_tpu.ops.mlp_kernel import PackedWeights, _nerf_math, _round_up, pack_params


class QuantizedPackedWeights(NamedTuple):
    """PackedWeights with the large matrices as (int values, per-out-channel
    scale) pairs. Phase matrices and biases stay in float."""

    f_pos: jnp.ndarray
    f_dir: jnp.ndarray
    w0_q: jnp.ndarray      # intN [enc_pad, 256]
    w0_s: jnp.ndarray      # f32 [1, 256]
    b0: jnp.ndarray
    wt_q: jnp.ndarray      # intN [7, 256, 256]
    wt_s: jnp.ndarray      # f32 [7, 1, 256]
    bt: jnp.ndarray
    wskip_q: jnp.ndarray
    wskip_s: jnp.ndarray
    whead_q: jnp.ndarray
    whead_s: jnp.ndarray
    bhead: jnp.ndarray
    wdir_q: jnp.ndarray
    wdir_s: jnp.ndarray
    wc0_q: Optional[jnp.ndarray]
    wc0_s: Optional[jnp.ndarray]
    bc0: Optional[jnp.ndarray]
    wc1_q: jnp.ndarray
    wc1_s: jnp.ndarray
    bc1: jnp.ndarray


class Int8PackedWeights(NamedTuple):
    """``QuantizedPackedWeights`` plus the activation-side contract for
    *int8 compute*: the trunk matmuls run as s8 x s8 -> s32 on the MXU
    (2x the bf16 peak on v5e: 394 TOPS vs 197 TFLOP/s) instead of
    dequantizing to bf16.

    Activation quantization scheme (the part that makes this exact enough):

    - The positional encoding is almost entirely sin/cos values in [-1, 1];
      only its first 3 columns are raw xyz. ``enc_scale`` ([1, enc_pad],
      1/pos_bound on the xyz columns, 1.0 elsewhere) maps the whole encoding
      into [-1, 1], and the matching xyz *rows* of ``w0_q``/``wskip_q`` are
      pre-multiplied by pos_bound before weight quantization, so the product
      is unchanged. The encoding then quantizes at a FIXED scale of 127 —
      8-bit resolution 1/127 ~ bf16's own rounding step (1/256), no row-max
      reduction needed.
    - Trunk activations (post-ReLU) quantize per-row (per-sample) against
      their dynamic absmax inside the kernel.
    - Heads (sigma/color/direction branch) stay on the bf16 dequant path —
      they are <10% of the FLOPs and the most precision-sensitive outputs.

    The reference's compressed renderer runs fp16 *compute*
    (``compressed_renderer.py:181-187``); this is the TPU-native extreme of
    the same memory/precision/speed trade, with the quality delta quantified
    by the benchmark quality gates rather than asserted.
    """

    f_pos: jnp.ndarray
    f_dir: jnp.ndarray
    w0_q: jnp.ndarray
    w0_s: jnp.ndarray
    b0: jnp.ndarray
    wt_q: jnp.ndarray
    wt_s: jnp.ndarray
    bt: jnp.ndarray
    wskip_q: jnp.ndarray
    wskip_s: jnp.ndarray
    whead_q: jnp.ndarray
    whead_s: jnp.ndarray
    bhead: jnp.ndarray
    wdir_q: jnp.ndarray
    wdir_s: jnp.ndarray
    wc0_q: Optional[jnp.ndarray]
    wc0_s: Optional[jnp.ndarray]
    bc0: Optional[jnp.ndarray]
    wc1_q: jnp.ndarray
    wc1_s: jnp.ndarray
    bc1: jnp.ndarray
    enc_scale: jnp.ndarray   # [1, enc_pad] f32: xyz cols 1/pos_bound, else 1


def prune_params(params: NeRFParams, prune_fraction: float) -> NeRFParams:
    """Zero the smallest-|w| fraction of every weight matrix (per-tensor
    quantile threshold, reference ``compressed_renderer.py:89-104``). Biases
    untouched."""
    if prune_fraction <= 0.0:
        return params

    def prune_leaf(path, leaf):
        is_weight = any(
            isinstance(p, jax.tree_util.DictKey) and p.key == "w" for p in path
        )
        if not is_weight:
            return leaf
        thresh = jnp.quantile(jnp.abs(leaf), prune_fraction)
        return jnp.where(jnp.abs(leaf) <= thresh, 0.0, leaf)

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def _quantize(w: jnp.ndarray, bits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel quantization of [in, out] (or [k, in,
    out]) weights. Returns (q intN, scale f32 broadcastable over rows)."""
    qmax = float(2 ** (bits - 1) - 1)
    dtype = jnp.int8 if bits <= 8 else jnp.int16
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(dtype)
    return q, scale.astype(jnp.float32)


def quantize_packed(
    packed: PackedWeights, bits: int = 8
) -> QuantizedPackedWeights:
    f = lambda w: _quantize(jnp.asarray(w, jnp.float32), bits)
    w0_q, w0_s = f(packed.w0)
    wt_q, wt_s = f(packed.wt)
    wskip_q, wskip_s = f(packed.wskip)
    whead_q, whead_s = f(packed.whead)
    wdir_q, wdir_s = f(packed.wdir)
    wc1_q, wc1_s = f(packed.wc1)
    if packed.wc0 is not None:
        wc0_q, wc0_s = f(packed.wc0)
        bc0 = packed.bc0
    else:
        wc0_q = wc0_s = bc0 = None
    return QuantizedPackedWeights(
        f_pos=packed.f_pos, f_dir=packed.f_dir,
        w0_q=w0_q, w0_s=w0_s, b0=packed.b0,
        wt_q=wt_q, wt_s=wt_s, bt=packed.bt,
        wskip_q=wskip_q, wskip_s=wskip_s,
        whead_q=whead_q, whead_s=whead_s, bhead=packed.bhead,
        wdir_q=wdir_q, wdir_s=wdir_s,
        wc0_q=wc0_q, wc0_s=wc0_s, bc0=bc0,
        wc1_q=wc1_q, wc1_s=wc1_s, bc1=packed.bc1,
    )


def quantize_packed_int8(
    packed: PackedWeights, pos_bound: float = 12.0
) -> Int8PackedWeights:
    """Pack for int8 *compute*: like ``quantize_packed(bits=8)`` but the xyz
    rows of w0/wskip absorb ``pos_bound`` so the encoding activations can use
    a fixed [-1, 1] -> 127 quantization (see ``Int8PackedWeights``).
    ``pos_bound`` must bound |sample position| along any rendered ray
    (|origin| + far * |direction|); out-of-bound coordinates saturate
    gracefully at the int8 clip."""
    q = quantize_packed(packed, bits=8)
    enc_pad = packed.w0.shape[0]
    scale_rows = jnp.concatenate(
        [jnp.full((3, 1), pos_bound, jnp.float32),
         jnp.ones((enc_pad - 3, 1), jnp.float32)], axis=0
    )
    w0_q, w0_s = _quantize(
        jnp.asarray(packed.w0, jnp.float32) * scale_rows, 8)
    wskip_q, wskip_s = _quantize(
        jnp.asarray(packed.wskip, jnp.float32) * scale_rows, 8)
    enc_scale = jnp.concatenate(
        [jnp.full((1, 3), 1.0 / pos_bound, jnp.float32),
         jnp.ones((1, enc_pad - 3), jnp.float32)], axis=1
    )
    return Int8PackedWeights(
        *q._replace(w0_q=w0_q, w0_s=w0_s, wskip_q=wskip_q, wskip_s=wskip_s),
        enc_scale=enc_scale,
    )


def quantize_model(
    params: Dict[str, NeRFParams],
    cfg: ModelConfig,
    bits: int = 8,
    prune_fraction: float = 0.1,
    act_bits: Optional[int] = None,
    pos_bound: float = 12.0,
) -> Tuple[Dict[str, QuantizedPackedWeights], Dict[str, Any]]:
    """Quantize {'coarse','fine'} params. Returns (quantized, stats report).

    ``act_bits=8`` switches to the int8-*compute* representation
    (``Int8PackedWeights``: s8 x s8 MXU matmuls, quantized activations);
    requires ``bits=8``. Default (None) keeps bf16 compute with intN weights
    dequantized in VMEM.

    The stats dict is the reference's compression report capability
    (``compressed_renderer.py:271-309``): original/compressed bytes, ratio,
    sparsity.
    """
    if act_bits is not None and (act_bits != 8 or bits != 8):
        raise ValueError("int8 compute requires bits=8, act_bits=8")
    out: Dict[str, QuantizedPackedWeights] = {}
    stats: Dict[str, Any] = {"bits": bits, "prune_fraction": prune_fraction,
                             "act_bits": act_bits, "networks": {}}
    for name, p in params.items():
        pruned = prune_params(p, prune_fraction)
        packed = pack_params(pruned, cfg, dtype=jnp.float32)
        q = (quantize_packed_int8(packed, pos_bound) if act_bits == 8
             else quantize_packed(packed, bits))
        out[name] = q

        orig_bytes = sum(
            int(np.prod(l.shape)) * 4 for l in jax.tree.leaves(p)
        )
        comp_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves(q)
            if l is not None
        )
        nz = sum(int(jnp.sum(l != 0)) for l in jax.tree.leaves(pruned))
        total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(pruned))
        stats["networks"][name] = {
            "original_mb": orig_bytes / 1e6,
            "compressed_mb": comp_bytes / 1e6,
            "compression_ratio": orig_bytes / comp_bytes,
            "sparsity": 1.0 - nz / total,
        }
    return out, stats


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def quant_weight_arrays(q: QuantizedPackedWeights, variant: str) -> list:
    """The kernel-argument order for quantized weights; paired with
    ``quant_w_dict`` (the same contract ``mlp_kernel.packed_weight_arrays`` /
    ``packed_w_dict`` provide for plain weights, so the ray-blocked render
    kernels accept either)."""
    arrays = [
        q.f_pos, q.f_dir, q.w0_q, q.w0_s, q.b0, q.wt_q, q.wt_s, q.bt,
        q.wskip_q, q.wskip_s, q.whead_q, q.whead_s, q.bhead, q.wdir_q, q.wdir_s,
    ]
    if variant == "bmild":
        arrays += [q.wc0_q, q.wc0_s, q.bc0]
    arrays += [q.wc1_q, q.wc1_s, q.bc1]
    return arrays


def quant_w_dict(refs, variant: str, dtype):
    """Build the in-kernel weight dict from refs ordered as
    ``quant_weight_arrays``, dequantizing inside VMEM: intN -> f32 ->
    * per-channel scale -> bf16. O(weights) per grid step vs O(block*weights)
    matmul work: negligible at render block sizes."""
    (f_pos_ref, f_dir_ref, w0q_ref, w0s_ref, b0_ref, wtq_ref, wts_ref, bt_ref,
     wskq_ref, wsks_ref, whq_ref, whs_ref, bhead_ref, wdq_ref, wds_ref,
     *rest) = refs
    if variant == "bmild":
        wc0q_ref, wc0s_ref, bc0_ref, wc1q_ref, wc1s_ref, bc1_ref = rest
    else:
        wc1q_ref, wc1s_ref, bc1_ref = rest

    def dq(q_ref, s_ref):
        return (q_ref[:].astype(jnp.float32) * s_ref[:]).astype(dtype)

    class _TrunkView:
        """Lazy per-layer dequant so only one [256,256] f32 temp lives at a
        time (matches _nerf_math's wt[i] indexing)."""

        def __getitem__(self, i):
            return (wtq_ref[i].astype(jnp.float32) * wts_ref[i]).astype(dtype)

    w = {
        "f_pos": f_pos_ref[:], "f_dir": f_dir_ref[:],
        "w0": dq(w0q_ref, w0s_ref), "b0": b0_ref[:],
        "wt": _TrunkView(), "bt": bt_ref,
        "wskip": dq(wskq_ref, wsks_ref),
        "whead": dq(whq_ref, whs_ref), "bhead": bhead_ref[:],
        "wdir": dq(wdq_ref, wds_ref),
        "wc1": dq(wc1q_ref, wc1s_ref), "bc1": bc1_ref[:],
    }
    if variant == "bmild":
        w["wc0"] = dq(wc0q_ref, wc0s_ref)
        w["bc0"] = bc0_ref[:]
    return w


class _Int8Mat:
    """An int8 weight matrix + per-output-channel scale, as seen inside the
    kernel. ``pre`` (optional [1, K] f32) is a static activation pre-scale:
    when set, activations are assumed bounded to [-1, 1] after multiplying
    by it (the encoding path) and quantize at a fixed scale of 127; when
    None, activations quantize per-row against their dynamic absmax."""

    def __init__(self, q, s, pre=None):
        self.q = q
        self.s = s
        self.pre = pre

    @property
    def shape(self):
        return self.q.shape


class _Int8TrunkView:
    """Lazy per-layer view over the stacked trunk (mirrors ``_TrunkView``)."""

    def __init__(self, q_ref, s_ref):
        self.q_ref = q_ref
        self.s_ref = s_ref

    def __getitem__(self, i):
        return _Int8Mat(self.q_ref[i], self.s_ref[i])


def _int8_mm(a, m):
    """Trunk-matmul hook (see ``mlp_kernel._nerf_math``): quantize the
    activations to int8 and contract on the MXU at the s8 x s8 -> s32 rate.
    Falls through to the float path for plain arrays."""
    if not isinstance(m, _Int8Mat):
        return jnp.dot(a, m, preferred_element_type=jnp.float32)
    a = a.astype(jnp.float32)
    if m.pre is not None:
        # encoding path: fixed scale (values in [-1, 1] after pre-scale);
        # out-of-bound xyz saturates at the clip instead of wrapping
        aq = jnp.clip(jnp.round(a * (m.pre * 127.0)), -127.0, 127.0)
        acc = jax.lax.dot_general(
            aq.astype(jnp.int8), m.q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (m.s * (1.0 / 127.0))
    # dynamic per-row scale: ax == 0 rows produce aq == 0 -> y == 0
    ax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    aq = jnp.round(a * (127.0 / jnp.maximum(ax, 1e-20))).astype(jnp.int8)
    acc = jax.lax.dot_general(
        aq, m.q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * ax) * (m.s * (1.0 / 127.0))


def int8_weight_arrays(q: Int8PackedWeights, variant: str) -> list:
    """Kernel-argument order for int8-compute weights: the shared quantized
    order plus ``enc_scale`` appended (paired with ``int8_w_dict``)."""
    return quant_weight_arrays(q, variant) + [q.enc_scale]


def int8_w_dict(refs, variant: str, dtype):
    """In-kernel weight dict for int8 compute: trunk matrices stay int8
    (wrapped in ``_Int8Mat`` for the ``mm`` hook), heads dequantize to bf16
    exactly as ``quant_w_dict`` does."""
    enc_scale_ref = refs[-1]
    (f_pos_ref, f_dir_ref, w0q_ref, w0s_ref, b0_ref, wtq_ref, wts_ref, bt_ref,
     wskq_ref, wsks_ref, whq_ref, whs_ref, bhead_ref, wdq_ref, wds_ref,
     *rest) = refs[:-1]
    if variant == "bmild":
        wc0q_ref, wc0s_ref, bc0_ref, wc1q_ref, wc1s_ref, bc1_ref = rest
    else:
        wc1q_ref, wc1s_ref, bc1_ref = rest

    def dq(q_ref, s_ref):
        return (q_ref[:].astype(jnp.float32) * s_ref[:]).astype(dtype)

    enc_scale = enc_scale_ref[:]
    w = {
        "f_pos": f_pos_ref[:], "f_dir": f_dir_ref[:],
        "w0": _Int8Mat(w0q_ref[:], w0s_ref[:], pre=enc_scale),
        "b0": b0_ref[:],
        "wt": _Int8TrunkView(wtq_ref, wts_ref), "bt": bt_ref,
        "wskip": _Int8Mat(wskq_ref[:], wsks_ref[:], pre=enc_scale),
        "whead": dq(whq_ref, whs_ref), "bhead": bhead_ref[:],
        "wdir": dq(wdq_ref, wds_ref),
        "wc1": dq(wc1q_ref, wc1s_ref), "bc1": bc1_ref[:],
        "mm": _int8_mm,
    }
    if variant == "bmild":
        w["wc0"] = dq(wc0q_ref, wc0s_ref)
        w["bc0"] = bc0_ref[:]
    return w


def quant_reprs(q, variant: str, dtype):
    """(kernel weight arrays, in-kernel dict builder) for either quantized
    representation — the dispatch shared by ``quantized_nerf_apply`` and the
    ray-blocked render kernels (``render_kernel._weights_for``)."""
    if isinstance(q, Int8PackedWeights):
        return (
            int8_weight_arrays(q, variant),
            functools.partial(int8_w_dict, variant=variant, dtype=dtype),
        )
    return (
        quant_weight_arrays(q, variant),
        functools.partial(quant_w_dict, variant=variant, dtype=dtype),
    )


def _quant_kernel(
    pos_ref, dir_ref, *rest,
    w_dict_fn, variant: str, skip_pos: int, Lp: int, Ld: int,
    relu_sigma: bool, dtype, normalize_dirs: bool,
):
    w = w_dict_fn(rest[:-1])
    out_ref = rest[-1]
    out_ref[:] = _nerf_math(
        pos_ref[:], dir_ref[:], w, variant=variant, skip_pos=skip_pos,
        Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
        normalize_dirs=normalize_dirs,
    )


def quantized_nerf_apply(
    q: QuantizedPackedWeights,
    positions: jnp.ndarray,
    directions: Optional[jnp.ndarray],
    cfg: ModelConfig,
    block: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, rgb) from intN-quantized weights; same contract as
    ``fused_nerf_apply``."""
    lead = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    if directions is None:
        dirs = jnp.zeros_like(pos)
    else:
        # normalization (when cfg.normalize_dirs) happens inside the kernel
        dirs = jnp.broadcast_to(directions, positions.shape).reshape(-1, 3)
        dirs = dirs.astype(jnp.float32)

    n = pos.shape[0]
    n_pad = _round_up(max(n, block), block)

    def pad_rows(x):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((n_pad - n, 3), jnp.float32)], axis=0
        )

    pos3, dir3 = pad_rows(pos), pad_rows(dirs)
    skip_pos = cfg.skip_layer if cfg.variant == "reference" else cfg.skip_layer + 1

    weight_arrays, w_dict_fn = quant_reprs(q, cfg.variant, dtype)

    weight_specs = [
        pl.BlockSpec(
            w.shape, (lambda i: (0, 0, 0)) if w.ndim == 3 else (lambda i: (0, 0)),
            memory_space=pltpu.VMEM,
        )
        for w in weight_arrays
    ]

    kernel = functools.partial(
        _quant_kernel,
        w_dict_fn=w_dict_fn,
        variant=cfg.variant,
        skip_pos=skip_pos,
        Lp=cfg.pos_freqs,
        Ld=cfg.dir_freqs,
        relu_sigma=(cfg.variant == "reference"),
        dtype=dtype,
        normalize_dirs=cfg.normalize_dirs,
    )
    stream = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, 3), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), stream, memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((block, 4), stream, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(pos3, dir3, *weight_arrays)

    sigma = out[:n, 0].reshape(lead)
    rgb = out[:n, 1:4].reshape(*lead, 3)
    return sigma, rgb


def make_quantized_apply_fn(block: int = 2048, dtype=jnp.bfloat16,
                            interpret: bool = False):
    """Adapter matching the ``render.pipeline`` ``apply_fn`` signature; the
    'params' it receives are QuantizedPackedWeights instances."""

    def apply_fn(q, positions, directions, cfg, compute_dtype=None):
        return quantized_nerf_apply(
            q, positions, directions, cfg, block, dtype, interpret
        )

    return apply_fn
