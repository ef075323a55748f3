"""Fused positional-encoding + NeRF-MLP evaluation as a Pallas TPU kernel.

This is the TPU-native replacement for the reference's per-backend execution
engines (PyTorch MPS/CUDA ops, the Numba JIT kernel ``numpy_renderer.py:39-79``,
the abandoned GLSL shaders): one kernel evaluates the *entire* network —
positional encoding, 8-layer trunk with skip connection, density head, and
view-conditioned color branch — per block of samples, with every weight
resident in VMEM.

Why this is speed-of-light-shaped:

- **Input bandwidth**: the kernel reads 8 floats/sample (xyz + dir, padded)
  and writes 4 (sigma + rgb). The 63-wide position encoding and the 27-wide
  direction encoding are (re)computed on the VPU inside VMEM instead of being
  materialized in HBM — a ~21x reduction in input traffic vs an unfused
  pipeline. At ~1.05 MFLOP/sample the kernel is massively compute-bound, so
  the MXU stays busy.
- **Weights stay on-chip**: all matrices (~1.2 MB bf16) fit VMEM; the grid
  revisits the same weight blocks so they are fetched once, not per block.
- **MXU-aligned skip connection**: the 319-wide skip concat is decomposed
  into two matmuls (``h @ W_h + enc @ W_e``) — no lane-dim concatenation of
  activations with weights, both contractions MXU-tiled.
- **Encoding layout is kernel-chosen**: ``enc @ W0`` is invariant under a
  simultaneous permutation of encoding columns and W0 rows, so the kernel
  computes phases as one tiny matmul ``x @ F`` (j-major layout) and the
  *pre-permuted* first-layer weights are produced by ``pack_params``. The
  reference's interleaved sin/cos order never needs to exist on chip.
- bf16 matmuls with float32 accumulation (``preferred_element_type``); phases
  and transcendentals in float32 (bf16 phases would destroy high-frequency
  bands).

Differentiability: ``fused_nerf_apply`` carries a custom VJP whose backward
recomputes activations with the XLA path (``models.nerf.apply_nerf``) — the
Pallas kernel accelerates every forward/inference call while training
gradients remain exactly the XLA ones (rematerialization, nothing stashed).

Capability citation: replaces reference ``base_renderer.py:165-188``
(query_nerf_networks) + ``nerf.py:92-131`` (forward) as a single fused op.
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
from nerf_tpu.models.nerf import NeRFParams, apply_nerf

HID = 256  # kernel specializes the reference width; asserted in pack_params

# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------


class PackedWeights(NamedTuple):
    """Kernel-layout weights. All [in, out]; lane dims padded as noted."""

    f_pos: jnp.ndarray    # [3, 3*Lp]   phase matrix for positions
    f_dir: jnp.ndarray    # [3, 3*Ld]   phase matrix for directions
    w0: jnp.ndarray       # [enc_pad, 256]  first trunk layer, rows permuted to kernel enc layout
    b0: jnp.ndarray       # [1, 256]
    wt: jnp.ndarray       # [7, 256, 256]   trunk layers 1..7 (h-part at the skip)
    bt: jnp.ndarray       # [7, 1, 256]
    wskip: jnp.ndarray    # [enc_pad, 256]  enc-part of the skip layer (permuted)
    whead: jnp.ndarray    # [256, 1 + head_out]  col 0 sigma; reference: cols 1:129
                          #   = color0 h-part; bmild: cols 1:257 = bottleneck
    bhead: jnp.ndarray    # [1, 1 + head_out]
    wdir: jnp.ndarray     # [denc_pad, 128] direction-encoding part of color0 (permuted)
    wc0: Optional[jnp.ndarray]  # bmild only: [256, 128] bottleneck->color0
    bc0: Optional[jnp.ndarray]  # bmild only: [1, 128]
    wc1: jnp.ndarray      # [128, 3]
    bc1: jnp.ndarray      # [1, 3]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _enc_perm(L: int) -> np.ndarray:
    """Map kernel-layout encoding column -> reference-layout column
    (-1 = structurally-zero weight row; see ``_encode``).

    Reference layout (``nerf.py:40-45``): [x(3), sin(f0 x)(3), cos(f0 x)(3),
    sin(f1 x)(3), ...] (frequency-major). Kernel layout: [x(3),
    sin'(3(L+1), coordinate-major: col 3 + j*(L+1) + k = sin(2^(k-1) x_j)),
    cos'(3(L+1): col = 1 - 2 sin'^2 = cos(2^k x_j))]. The k=0 sin' (the
    half-frequency helper that exists only to generate cos(f0 x)) and the
    k=L cos' (one octave past the top band) have no reference column.
    """
    idx = list(range(3))
    for j in range(3):           # sin' block, j-major, freqs 2^(k-1)
        idx.append(-1)           # k=0: sin(x/2), helper only
        for i in range(L):       # k=i+1 -> sin(2^i x_j)
            idx.append(3 + 6 * i + j)
    for j in range(3):           # cos' block: col k -> cos(2^k x_j)
        for i in range(L):
            idx.append(6 + 6 * i + j)
        idx.append(-1)           # k=L: cos(2^L x), unused octave
    return np.asarray(idx)


def _phase_matrix(L: int, include_pi: bool) -> np.ndarray:
    """F [3, 3(L+1)] with F[j, j*(L+1) + k] = 2^(k-1) (*pi): one tiny matmul
    turns raw xyz into the half-shifted phase ladder; the kernel computes
    ONLY sin of it — every cosine follows from the exact identity
    cos(2p) = 1 - 2 sin(p)^2. Transcendental count drops from 6L to
    3(L+1) per point (sin+cos of L bands -> sin of L+1 half-shifted bands),
    measured at ~25% of fused-kernel time before this."""
    freqs = (2.0 ** (np.arange(L + 1) - 1)) * (np.pi if include_pi else 1.0)
    F = np.zeros((3, 3 * (L + 1)), np.float32)
    for j in range(3):
        F[j, j * (L + 1) : (j + 1) * (L + 1)] = freqs
    return F


def _permuted_rows(w: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Rows of ``w`` in kernel order; -1 entries become zero rows."""
    w_ext = jnp.concatenate([w, jnp.zeros((1, w.shape[1]), w.dtype)], axis=0)
    idx = np.where(perm < 0, w.shape[0], perm)
    return w_ext[jnp.asarray(idx)]


def pack_params(
    params: NeRFParams, cfg: ModelConfig, dtype=jnp.bfloat16
) -> PackedWeights:
    """Re-layout a params pytree into the kernel's MXU-friendly format.

    Pure jnp (traceable/jittable); weight-sized, so negligible even when run
    per train step.
    """
    assert cfg.hidden_dim == HID and cfg.n_layers == 8 and cfg.color_hidden_dim == 128, (
        "the fused kernel specializes the reference architecture "
        "(256x8 trunk, 128 color); use the XLA path for other sizes"
    )
    Lp, Ld = cfg.pos_freqs, cfg.dir_freqs
    enc_dim = 3 + 6 * Lp                     # reference encoding width
    kenc_dim = 3 + 6 * (Lp + 1)              # kernel layout width (see _enc_perm)
    kdenc_dim = 3 + 6 * (Ld + 1)
    enc_pad = _round_up(kenc_dim, 8)         # sublane-align rows
    denc_pad = _round_up(kdenc_dim, 8)

    perm_p = _enc_perm(Lp)
    perm_d = _enc_perm(Ld)

    def cast(x):
        return jnp.asarray(x, dtype)

    def pad_rows(w, rows):
        return jnp.concatenate(
            [w, jnp.zeros((rows - w.shape[0], w.shape[1]), w.dtype)], axis=0
        )

    trunk = params["trunk"]
    if cfg.variant == "reference":
        skip_pos = cfg.skip_layer                      # layer 4 sees [h, enc]
        wsk = trunk[skip_pos]["w"]                     # [256+63, 256]
        wsk_h, wsk_e = wsk[:HID], wsk[HID:]            # h rows first
    elif cfg.variant == "bmild":
        skip_pos = cfg.skip_layer + 1                  # layer 5 sees [enc, h]
        wsk = trunk[skip_pos]["w"]                     # [63+256, 256]
        wsk_e, wsk_h = wsk[: enc_dim], wsk[enc_dim:]
    else:
        raise ValueError(f"unknown variant {cfg.variant}")

    wt_list, bt_list = [], []
    for i in range(1, 8):
        w = wsk_h if i == skip_pos else trunk[i]["w"]
        b = trunk[i]["b"]
        wt_list.append(cast(w))
        bt_list.append(cast(b)[None, :])

    w0 = pad_rows(cast(_permuted_rows(trunk[0]["w"], perm_p)), enc_pad)
    wskip = pad_rows(cast(_permuted_rows(wsk_e, perm_p)), enc_pad)

    if cfg.variant == "reference":
        # heads: col 0 = density, cols 1:129 = color0's h-part
        wc0 = params["color0"]["w"]                    # [256+27, 128]
        whead = jnp.concatenate([cast(params["density"]["w"]), cast(wc0[:HID])], axis=1)
        bhead = jnp.concatenate(
            [cast(params["density"]["b"]), cast(params["color0"]["b"])]
        )[None, :]
        wdir = pad_rows(cast(_permuted_rows(wc0[HID:], perm_d)), denc_pad)
        wc0_k, bc0_k = None, None
    else:
        # heads: col 0 = alpha, cols 1:257 = bottleneck (no activation)
        wc0 = params["color0"]["w"]                    # [256+27, 128]
        whead = jnp.concatenate(
            [cast(params["density"]["w"]), cast(params["bottleneck"]["w"])], axis=1
        )
        bhead = jnp.concatenate(
            [cast(params["density"]["b"]), cast(params["bottleneck"]["b"])]
        )[None, :]
        wdir = pad_rows(cast(_permuted_rows(wc0[HID:], perm_d)), denc_pad)
        wc0_k = cast(wc0[:HID])
        bc0_k = cast(params["color0"]["b"])[None, :]

    return PackedWeights(
        f_pos=jnp.asarray(_phase_matrix(Lp, cfg.posenc_pi)),
        f_dir=jnp.asarray(_phase_matrix(Ld, cfg.posenc_pi)),
        w0=w0,
        b0=cast(trunk[0]["b"])[None, :],
        wt=jnp.stack(wt_list),
        bt=jnp.stack(bt_list),
        wskip=wskip,
        whead=whead,
        bhead=bhead,
        wdir=wdir,
        wc0=wc0_k,
        bc0=bc0_k,
        wc1=cast(params["color1"]["w"]),
        bc1=cast(params["color1"]["b"])[None, :],
    )


def packed_weight_arrays(packed: PackedWeights, variant: str) -> list:
    """The kernel-argument order for plain packed weights; paired with
    ``packed_w_dict`` (mirrored by ``quant.quant_weight_arrays`` /
    ``quant_w_dict`` for int8/int16 weights, so downstream kernels accept
    either representation)."""
    arrays = [
        packed.f_pos, packed.f_dir, packed.w0, packed.b0, packed.wt,
        packed.bt, packed.wskip, packed.whead, packed.bhead, packed.wdir,
    ]
    if variant == "bmild":
        arrays += [packed.wc0, packed.bc0]
    arrays += [packed.wc1, packed.bc1]
    return arrays


def packed_w_dict(refs, variant: str):
    """In-kernel weight dict from refs ordered as ``packed_weight_arrays``.
    ``wt``/``bt`` stay refs (indexed per layer inside ``_nerf_math``)."""
    (f_pos_ref, f_dir_ref, w0_ref, b0_ref, wt_ref, bt_ref, wskip_ref,
     whead_ref, bhead_ref, wdir_ref, *rest) = refs
    if variant == "bmild":
        wc0_ref, bc0_ref, wc1_ref, bc1_ref = rest
        extra = {"wc0": wc0_ref[:], "bc0": bc0_ref[:]}
    else:
        wc1_ref, bc1_ref = rest
        extra = {}
    return {
        "f_pos": f_pos_ref[:], "f_dir": f_dir_ref[:], "w0": w0_ref[:],
        "b0": b0_ref[:], "wt": wt_ref, "bt": bt_ref, "wskip": wskip_ref[:],
        "whead": whead_ref[:], "bhead": bhead_ref[:], "wdir": wdir_ref[:],
        "wc1": wc1_ref[:], "bc1": bc1_ref[:], **extra,
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


_INV_PI = 0.3183098861837907
# Cody-Waite split of pi: hi is exactly representable in f32, lo carries the
# residual so r = p - n*hi - n*lo keeps the true remainder to ~1e-7*n even
# when |p| is in the thousands (top positional-encoding octave).
_PI_HI = 3.140625
_PI_LO = 9.676535897932795e-4


def _fast_sin(p):
    """Polynomial sine matched to bf16 output precision (~13 VPU ops).

    Native vector sine profiled at 24% of fused-kernel time (92 ms of a
    380 ms 800x600@64 frame on v5e). Reduction: r = p - n*pi with
    n = round(p/pi) puts r in [-pi/2, pi/2]; sin(p) = (-1)^n sin(r); the
    7th-order odd minimax (Hastings) holds |err| < 7e-7 there — far below
    both the bf16 quantization (eps ~4e-3) the encodings are consumed at
    and the ~1e-3 f32 phase noise the top octave already carries out of
    the phase matmul."""
    n = jnp.round(p * _INV_PI)
    r = p - n * _PI_HI - n * _PI_LO                  # r in [-pi/2, pi/2]
    r2 = r * r
    s = r * (0.9999966 + r2 * (-0.16664828 + r2 * (8.306324e-3
             + r2 * -1.8363603e-4)))
    half = n * 0.5                                   # (-1)^n without int ops:
    sign = 1.0 - 4.0 * jnp.abs(half - jnp.round(half))
    return s * sign


def _encode(x3_f32, f, L, pad_to, fast_sin=False):
    """[B, 3] coords -> [B, pad_to] kernel-layout encoding.

    Only sin is evaluated (of the half-shifted phase ladder, see
    ``_phase_matrix``); every cosine comes from the exact double-angle
    identity cos(2p) = 1 - 2 sin(p)^2 — an elementwise fma instead of a
    second transcendental sweep. ``fast_sin`` swaps the native sine for the
    bf16-grade polynomial (enabled when the compute dtype is bf16)."""
    # Hi/lo-split phase matmul: the default f32 dot is a single bf16 pass,
    # i.e. it rounds the coordinates to bf16 before scaling by the
    # frequencies — at the top octave (2^9) that is ~1.5 rad of phase
    # error, measured as a 36.8 dB ceiling against a true-f32 render while
    # the XLA engine (elementwise phase scaling) sits at 62 dB
    # (fuse_probe.json fastmath_probe). The frequency matrix is exactly
    # bf16-representable and both split payloads are bf16-exact, so two
    # passes of this tiny K=3 matmul reconstruct the phases to ~2^-16.
    x_hi = x3_f32.astype(jnp.bfloat16).astype(jnp.float32)
    x_split = jnp.concatenate([x_hi, x3_f32 - x_hi], axis=1)   # [B, 6]
    f2 = jnp.concatenate([f, f], axis=0)                       # [6, F]
    p = jnp.dot(x_split, f2, preferred_element_type=jnp.float32)
    s = _fast_sin(p) if fast_sin else jnp.sin(p)
    c = 1.0 - 2.0 * s * s
    zeros = jnp.zeros((x3_f32.shape[0], pad_to - (3 + 6 * (L + 1))), jnp.float32)
    return jnp.concatenate([x3_f32, s, c, zeros], axis=-1)


def _dir_branch(dir3, w: Dict[str, Any], *, Ld: int, dtype,
                normalize_dirs: bool) -> jnp.ndarray:
    """Direction branch up to the color-layer contribution:
    normalize -> encode -> ``denc @ wdir``. Returns cdir [B, 128] f32.

    Split out so callers whose directions are constant per *ray* (the
    ray-blocked render kernel) can run it once per ray and repeat the 128-wide
    result S-fold — the per-sample normalization + 27-wide encoding
    transcendentals were ~19% of frame time."""
    dirv = dir3.astype(jnp.float32)
    if normalize_dirs:
        inv = jax.lax.rsqrt(
            jnp.sum(dirv * dirv, axis=-1, keepdims=True) + 1e-12
        )
        dirv = dirv * inv
    denc = _encode(dirv, w["f_dir"], Ld, w["wdir"].shape[0],
                   fast_sin=(jnp.dtype(dtype) == jnp.bfloat16)).astype(dtype)
    return jnp.dot(denc, w["wdir"], preferred_element_type=jnp.float32)


def _nerf_math(
    pos3, dir3, w: Dict[str, Any], *,
    variant: str, skip_pos: int, Lp: int, Ld: int, relu_sigma: bool, dtype,
    normalize_dirs: bool = False, cdir: Optional[jnp.ndarray] = None,
    split_out: bool = False,
):
    """The full network on loaded arrays (shared by the plain kernel and the
    int8-dequant kernel in ``ops/quant.py``). ``w`` maps PackedWeights field
    names to in-VMEM arrays. Inputs are raw [B, 3] coords; direction
    normalization (when the variant wants it) happens here, on-chip — doing
    it in XLA on the broadcast per-sample array costs a full extra HBM pass
    over 12 bytes/sample (it showed up as ~13% of frame time in profiles).
    ``cdir`` (the precomputed direction-branch output, [B, 128] f32)
    short-circuits the per-sample direction work; pass ``dir3=None`` then.
    Returns [B, 4] = (sigma, rgb)."""

    # trunk-matmul hook: the int8-compute path (``ops/quant.py``) swaps in a
    # quantize-activations + s8xs8->s32 MXU matmul here; the w dict may carry
    # it under "mm". Heads/direction branch always stay at the float path.
    mm = w.get("mm") or (
        lambda a, m: jnp.dot(a, m, preferred_element_type=jnp.float32)
    )

    pos = pos3.astype(jnp.float32)                     # [B, 3]
    enc = _encode(pos, w["f_pos"], Lp, w["w0"].shape[0],
                  fast_sin=(jnp.dtype(dtype) == jnp.bfloat16)).astype(dtype)

    # MXU matmuls accumulate in f32 (a Mosaic requirement: bf16 accumulators
    # are rejected at verification). The trunk epilogue converts the f32
    # accumulator to the compute dtype FIRST and runs bias+relu at bf16
    # width — the activations were already rounded to bf16 at the next
    # matmul's input, so this loses no end-to-end precision, but it turns
    # the per-layer [B, 256] f32 add/relu/cast chain (3 f32-width VPU
    # passes, profiled at ~½ of kernel time) into one convert plus two
    # half-width passes. The sigma/color heads keep f32 epilogues.
    x = jax.nn.relu(mm(enc, w["w0"]).astype(dtype) + w["b0"])
    for i in range(1, 8):
        y = mm(x, w["wt"][i - 1])
        if i == skip_pos:
            y = y + mm(enc, w["wskip"])
        x = jax.nn.relu(y.astype(dtype) + w["bt"][i - 1])

    hv = (
        jnp.dot(x, w["whead"], preferred_element_type=jnp.float32)
        + w["bhead"].astype(jnp.float32)
    )
    sigma = hv[:, :1]
    if relu_sigma:
        sigma = jax.nn.relu(sigma)

    if cdir is None:
        cdir = _dir_branch(dir3, w, Ld=Ld, dtype=dtype,
                           normalize_dirs=normalize_dirs)

    if variant == "bmild":
        feat = hv[:, 1:]                               # bottleneck, no relu
        c = jax.nn.relu(
            jnp.dot(feat.astype(dtype), w["wc0"], preferred_element_type=jnp.float32)
            + cdir
            + w["bc0"].astype(jnp.float32)
        )
    else:
        c = jax.nn.relu(hv[:, 1:] + cdir)              # color0 bias is in bhead

    rgb = jax.nn.sigmoid(
        jnp.dot(c.astype(dtype), w["wc1"], preferred_element_type=jnp.float32)
        + w["bc1"].astype(jnp.float32)
    )
    if split_out:
        # planar consumers (the ray-blocked kernels' per-channel [R, S]
        # outputs) take sigma/rgb unconcatenated
        return sigma, rgb
    return jnp.concatenate([sigma, rgb], axis=-1)


def _nerf_kernel(
    # inputs (order must match the pallas_call arg assembly below)
    pos_ref, dir_ref, f_pos_ref, f_dir_ref, w0_ref, b0_ref, wt_ref, bt_ref,
    wskip_ref, whead_ref, bhead_ref, wdir_ref, *rest,
    variant: str, skip_pos: int, Lp: int, Ld: int, relu_sigma: bool, dtype,
    normalize_dirs: bool,
):
    if variant == "bmild":
        wc0_ref, bc0_ref, wc1_ref, bc1_ref, out_ref = rest
        extra = {"wc0": wc0_ref[:], "bc0": bc0_ref[:]}
    else:
        wc1_ref, bc1_ref, out_ref = rest
        extra = {}

    w = {
        "f_pos": f_pos_ref[:], "f_dir": f_dir_ref[:], "w0": w0_ref[:],
        "b0": b0_ref[:], "wt": wt_ref, "bt": bt_ref, "wskip": wskip_ref[:],
        "whead": whead_ref[:], "bhead": bhead_ref[:], "wdir": wdir_ref[:],
        "wc1": wc1_ref[:], "bc1": bc1_ref[:], **extra,
    }
    out_ref[:] = _nerf_math(
        pos_ref[:], dir_ref[:], w, variant=variant, skip_pos=skip_pos,
        Lp=Lp, Ld=Ld, relu_sigma=relu_sigma, dtype=dtype,
        normalize_dirs=normalize_dirs,
    )


def _pallas_forward(
    packed: PackedWeights,
    positions: jnp.ndarray,     # [N, 3] f32
    directions: jnp.ndarray,    # [N, 3] f32
    cfg: ModelConfig,
    block: int,
    dtype,
    interpret: bool,
) -> jnp.ndarray:               # [N, 4] f32 (sigma, rgb)
    n = positions.shape[0]
    n_pad = _round_up(max(n, block), block)

    def pad_rows(x):
        # single pad op (a zeros+scatter formulation lowers to pad/slice
        # chains costing a full extra HBM pass — seen in profiles)
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((n_pad - n, 3), jnp.float32)], axis=0
        )

    pos3, dir3 = pad_rows(positions), pad_rows(directions)
    skip_pos = cfg.skip_layer if cfg.variant == "reference" else cfg.skip_layer + 1

    # block-resident inputs: samples stream [block, 4]; weights whole-array
    def stream(i):
        return (i, 0)

    def resident(i):
        return tuple([0] * 2)

    def resident3(i):
        return tuple([0] * 3)

    weight_arrays = [
        packed.f_pos, packed.f_dir, packed.w0, packed.b0, packed.wt,
        packed.bt, packed.wskip, packed.whead, packed.bhead, packed.wdir,
    ]
    if cfg.variant == "bmild":
        weight_arrays += [packed.wc0, packed.bc0]
    weight_arrays += [packed.wc1, packed.bc1]

    weight_specs = [
        pl.BlockSpec(
            w.shape, resident3 if w.ndim == 3 else resident,
            memory_space=pltpu.VMEM,
        )
        for w in weight_arrays
    ]

    kernel = functools.partial(
        _nerf_kernel,
        variant=cfg.variant,
        skip_pos=skip_pos,
        Lp=cfg.pos_freqs,
        Ld=cfg.dir_freqs,
        relu_sigma=(cfg.variant == "reference"),
        dtype=dtype,
        normalize_dirs=cfg.normalize_dirs,
    )

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
        # sample blocks are independent -> split the grid across both TPU
        # megacores (unmarked dims run sequentially on one core)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(pos3, dir3, *weight_arrays)
    return out[:n]


# ---------------------------------------------------------------------------
# Public API (with training-grade VJP)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_nerf_apply(
    params: NeRFParams,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: ModelConfig,
    block: int = 2048,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``apply_nerf``: ``(sigma [...], rgb
    [..., 3])`` from ``positions/directions [..., 3]``."""
    lead = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    if directions is None:
        dirs = jnp.zeros_like(pos)
    else:
        # normalization (when cfg.normalize_dirs) happens inside the kernel
        dirs = jnp.broadcast_to(directions, positions.shape).reshape(-1, 3)
        dirs = dirs.astype(jnp.float32)
    packed = pack_params(params, cfg, dtype=dtype)
    out = _pallas_forward(packed, pos, dirs, cfg, block, dtype, interpret)
    sigma = out[:, 0].reshape(lead)
    rgb = out[:, 1:4].reshape(*lead, 3)
    return sigma, rgb


def _fused_fwd(params, positions, directions, cfg, block, dtype, interpret):
    out = fused_nerf_apply(params, positions, directions, cfg, block, dtype, interpret)
    return out, (params, positions, directions)


def _fused_bwd(cfg, block, dtype, interpret, residuals, cotangents):
    """Backward = recompute with the XLA path. Gradients flow to params only
    (positions/directions are data in NeRF training; their cotangents are
    structurally zero in the training graph)."""
    params, positions, directions = residuals

    def f(p):
        return apply_nerf(p, positions, directions, cfg, compute_dtype=dtype)

    _, vjp = jax.vjp(f, params)
    (dparams,) = vjp(cotangents)
    dpos = jnp.zeros_like(positions)
    ddirs = None if directions is None else jnp.zeros_like(directions)
    return dparams, dpos, ddirs


fused_nerf_apply.defvjp(_fused_fwd, _fused_bwd)


def make_pallas_apply_fn(block: int = 2048, dtype=jnp.bfloat16, interpret: bool = False):
    """Adapter matching the ``render.pipeline`` ``apply_fn`` signature."""

    def apply_fn(params, positions, directions, cfg, compute_dtype=None):
        return fused_nerf_apply(
            params, positions, directions, cfg, block, dtype, interpret
        )

    return apply_fn
