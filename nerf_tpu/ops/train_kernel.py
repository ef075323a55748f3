"""Fused NeRF-MLP backward as a Pallas TPU kernel (training-grade VJP).

Why this exists: at the training batch (2048 rays x 256 samples = 524k MLP
evaluations per step) the XLA backward is *bandwidth*-bound, not MXU-bound —
every layer's [524k, 256] activation round-trips HBM three times (forward
stash, relu-mask read, dgrad intermediate), measured at ~23 TFLOP/s
fwd-equivalent vs ~100 TFLOP/s for the fused forward kernel. Remat does not
help (the recomputed activations are materialized in HBM all the same). The
fix is the same one the forward got (``ops/mlp_kernel.py``): one kernel per
sample block that keeps *all* activations in VMEM through the entire
forward-recompute + backward sweep and accumulates weight gradients in VMEM
across grid steps.

HBM traffic per sample block: positions+directions (24 B/sample) +
cotangents (16 B/sample) in; weight gradients (~2 MB total) out, once.
No per-layer activation traffic at all. Megacore: the grid is split
(2, n_blocks/2) with ``("parallel", "arbitrary")`` semantics — each core
accumulates into its own gradient copy; the two copies are summed by XLA.

Supports the "reference" architecture variant (the one training uses,
reference ``src/models/nerf.py:48-131`` + ``trainer.py:120-133``); the bmild
variant is inference-only (bundled example weights).

``fused_train_apply`` is the public drop-in for ``apply_nerf`` in the train
step: Pallas forward (``_pallas_forward``) + this Pallas backward, gradients
matching the XLA path to bf16 tolerance (gated by ``tests/test_train_kernel``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.nerf import NeRFParams
from nerf_tpu.ops.mlp_kernel import (
    HID,
    PackedWeights,
    _encode,
    _enc_perm,
    _pallas_forward,
    _round_up,
    pack_params,
)


def _bwd_kernel(
    # streamed per block
    pos_ref, dir_ref, ds_ref, dc_ref,
    # resident weights (+ pre-transposed copies for dgrad)
    f_pos_ref, f_dir_ref, w0_ref, b0_ref, wt_ref, bt_ref, wskip_ref,
    whead_ref, bhead_ref, wdir_ref, wc1_ref, bc1_ref,
    wt_t_ref, whead_t_ref, wc1_t_ref,
    # gradient accumulators (revisited across the sequential grid dim)
    d_w0_ref, d_b0_ref, d_wt_ref, d_bt_ref, d_wskip_ref,
    d_whead_ref, d_bhead_ref, d_wdir_ref, d_wc1_ref, d_bc1_ref,
    *, skip_pos: int, Lp: int, Ld: int, dtype, normalize_dirs: bool,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (d_w0_ref, d_b0_ref, d_wt_ref, d_bt_ref, d_wskip_ref,
                    d_whead_ref, d_bhead_ref, d_wdir_ref, d_wc1_ref,
                    d_bc1_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    f32 = jnp.float32

    def wgrad(x, dy):
        # x [B, in], dy [B, out] -> [in, out], contracting the sample axis
        # directly (no materialized transpose in VMEM)
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    # ---- forward recompute, activations held in VMEM -----------------------
    pos = pos_ref[:].astype(f32)
    enc = _encode(pos, f_pos_ref[:], Lp, w0_ref.shape[0]).astype(dtype)

    dirv = dir_ref[:].astype(f32)
    if normalize_dirs:
        inv = jax.lax.rsqrt(jnp.sum(dirv * dirv, axis=-1, keepdims=True) + 1e-12)
        dirv = dirv * inv
    denc = _encode(dirv, f_dir_ref[:], Ld, wdir_ref.shape[0]).astype(dtype)
    cdir = jnp.dot(denc, wdir_ref[:], preferred_element_type=f32)

    hs = []  # post-relu activations h0..h7, bf16
    x = jax.nn.relu(
        jnp.dot(enc, w0_ref[:], preferred_element_type=f32)
        + b0_ref[:].astype(f32)
    ).astype(dtype)
    hs.append(x)
    for i in range(1, 8):
        y = jnp.dot(x, wt_ref[i - 1], preferred_element_type=f32)
        if i == skip_pos:
            y = y + jnp.dot(enc, wskip_ref[:], preferred_element_type=f32)
        x = jax.nn.relu(y + bt_ref[i - 1].astype(f32)).astype(dtype)
        hs.append(x)

    hv = (
        jnp.dot(hs[7], whead_ref[:], preferred_element_type=f32)
        + bhead_ref[:].astype(f32)
    )
    sigma_raw = hv[:, :1]
    c_pre = hv[:, 1:] + cdir                  # color0 bias lives in bhead
    c = jax.nn.relu(c_pre).astype(dtype)
    rgb = jax.nn.sigmoid(
        jnp.dot(c, wc1_ref[:], preferred_element_type=f32)
        + bc1_ref[:].astype(f32)
    )

    # ---- backward ----------------------------------------------------------
    dsig = ds_ref[:].astype(f32)              # [B, 1]
    drgb = dc_ref[:].astype(f32)              # [B, 3]

    dz1 = (drgb * rgb * (1.0 - rgb)).astype(dtype)               # sigmoid'
    d_wc1_ref[0] += wgrad(c, dz1)
    d_bc1_ref[0] += jnp.sum(dz1.astype(f32), axis=0, keepdims=True)
    dc = jnp.dot(dz1, wc1_t_ref[:], preferred_element_type=f32)  # [B, 128]
    dc_pre = jnp.where(c_pre > 0, dc, 0.0).astype(dtype)

    d_wdir_ref[0] += wgrad(denc, dc_pre)

    dsig_pre = jnp.where(sigma_raw > 0, dsig, 0.0)               # relu'd head
    dhv = jnp.concatenate([dsig_pre.astype(dtype), dc_pre], axis=1)
    d_whead_ref[0] += wgrad(hs[7], dhv)
    d_bhead_ref[0] += jnp.sum(dhv.astype(f32), axis=0, keepdims=True)
    dh = jnp.dot(dhv, whead_t_ref[:], preferred_element_type=f32)

    for i in range(7, 0, -1):
        dpre = jnp.where(hs[i].astype(f32) > 0, dh, 0.0).astype(dtype)       # [B, 256]
        d_wt_ref[0, i - 1] += wgrad(hs[i - 1], dpre)
        d_bt_ref[0, i - 1] += jnp.sum(dpre.astype(f32), axis=0, keepdims=True)
        if i == skip_pos:
            d_wskip_ref[0] += wgrad(enc, dpre)
        dh = jnp.dot(dpre, wt_t_ref[i - 1], preferred_element_type=f32)

    dpre0 = jnp.where(hs[0].astype(f32) > 0, dh, 0.0).astype(dtype)
    d_w0_ref[0] += wgrad(enc, dpre0)
    d_b0_ref[0] += jnp.sum(dpre0.astype(f32), axis=0, keepdims=True)


def _packed_grads(
    packed: PackedWeights,
    positions: jnp.ndarray,    # [N, 3] f32
    directions: jnp.ndarray,   # [N, 3] f32
    dsigma: jnp.ndarray,       # [N] f32 cotangent
    drgb: jnp.ndarray,         # [N, 3] f32 cotangent
    cfg: ModelConfig,
    block: int,
    dtype,
    interpret: bool,
) -> Dict[str, jnp.ndarray]:
    """Run the backward kernel; returns packed-layout gradient arrays."""
    assert cfg.variant == "reference", "training kernel is reference-variant"
    n = positions.shape[0]
    n_cores = 1 if interpret else 2
    n_pad = _round_up(max(n, block * n_cores), block * n_cores)

    def pad_to(x, cols, value=0.0):
        x = x.reshape(n, -1).astype(jnp.float32)
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n, cols), value, jnp.float32)], axis=0
        )

    pos3 = pad_to(positions, 3)
    dir3 = pad_to(directions, 3, value=1.0)
    ds = pad_to(dsigma, 1)        # zero cotangents: pad rows contribute 0
    dc = pad_to(drgb, 3)

    nb = n_pad // (block * n_cores)
    skip_pos = cfg.skip_layer

    wt_t = jnp.swapaxes(packed.wt, 1, 2)
    whead_t = jnp.swapaxes(packed.whead, 0, 1)
    wc1_t = jnp.swapaxes(packed.wc1, 0, 1)

    weight_arrays = [
        packed.f_pos, packed.f_dir, packed.w0, packed.b0, packed.wt,
        packed.bt, packed.wskip, packed.whead, packed.bhead, packed.wdir,
        packed.wc1, packed.bc1, wt_t, whead_t, wc1_t,
    ]
    weight_specs = [
        pl.BlockSpec(
            w.shape,
            (lambda c, i: (0, 0, 0)) if w.ndim == 3 else (lambda c, i: (0, 0)),
            memory_space=pltpu.VMEM,
        )
        for w in weight_arrays
    ]

    def stream(c, i):
        return (c * nb + i, 0)

    enc_pad = packed.w0.shape[0]
    denc_pad = packed.wdir.shape[0]
    head_out = packed.whead.shape[1]

    # accumulator outputs: one copy per core, summed afterwards
    out_shapes = dict(
        d_w0=(enc_pad, HID), d_b0=(1, HID), d_wt=(7, HID, HID),
        d_bt=(7, 1, HID), d_wskip=(enc_pad, HID), d_whead=(HID, head_out),
        d_bhead=(1, head_out), d_wdir=(denc_pad, 128), d_wc1=(128, 3),
        d_bc1=(1, 3),
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_cores,) + s, jnp.float32)
        for s in out_shapes.values()
    ]
    out_specs = [
        pl.BlockSpec(
            (1,) + s,
            functools.partial(lambda n, c, i: (c,) + (0,) * n, len(s)),
            memory_space=pltpu.VMEM,
        )
        for s in out_shapes.values()
    ]

    kernel = functools.partial(
        _bwd_kernel,
        skip_pos=skip_pos,
        Lp=cfg.pos_freqs,
        Ld=cfg.dir_freqs,
        dtype=dtype,
        normalize_dirs=cfg.normalize_dirs,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_cores, nb),
        in_specs=[
            pl.BlockSpec((block, 3), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), stream, memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the activation set for a 1k-2k sample block exceeds the 16 MB
            # default scoped-vmem budget; v5e has 128 MiB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pos3, dir3, ds, dc, *weight_arrays)

    return {
        name: jnp.sum(o, axis=0) for name, o in zip(out_shapes, outs)
    }


def _unpack_grads(g: Dict[str, jnp.ndarray], params: NeRFParams,
                  cfg: ModelConfig) -> NeRFParams:
    """Packed-layout gradients -> params-pytree gradients (reference variant).

    Inverts the layout work of ``pack_params``: row permutations of the
    encoding-consuming matrices, the [h | enc] split of the skip layer, and
    the [density | color0] head concat.
    """
    skip_pos = cfg.skip_layer

    def inv(L):
        # kernel row r holds reference row perm[r] (-1 = structurally-zero
        # helper row, no reference gradient)
        perm = _enc_perm(L)
        out = np.zeros(3 + 6 * L, np.int64)
        for r, j in enumerate(perm):
            if j >= 0:
                out[j] = r
        return out

    d_w0 = g["d_w0"][inv(cfg.pos_freqs)]
    d_wskip = g["d_wskip"][inv(cfg.pos_freqs)]
    d_wdir = g["d_wdir"][inv(cfg.dir_freqs)]

    trunk = []
    for i in range(8):
        if i == 0:
            trunk.append({"w": d_w0, "b": g["d_b0"][0]})
        elif i == skip_pos:
            trunk.append({
                "w": jnp.concatenate([g["d_wt"][i - 1], d_wskip], axis=0),
                "b": g["d_bt"][i - 1, 0],
            })
        else:
            trunk.append({"w": g["d_wt"][i - 1], "b": g["d_bt"][i - 1, 0]})

    return {
        "trunk": trunk,
        "density": {"w": g["d_whead"][:, :1], "b": g["d_bhead"][0, :1]},
        "color0": {
            "w": jnp.concatenate([g["d_whead"][:, 1:], d_wdir], axis=0),
            "b": g["d_bhead"][0, 1:],
        },
        "color1": {"w": g["d_wc1"], "b": g["d_bc1"][0]},
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_train_apply(
    params: NeRFParams,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: ModelConfig,
    block: int = 1024,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``apply_nerf`` drop-in whose forward AND backward are Pallas kernels.

    Both passes keep all activations in VMEM (zero per-layer HBM traffic);
    weight gradients accumulate on-chip across sample blocks. Positions,
    directions (and anything upstream of them) receive zero cotangents —
    they are data in NeRF training (reference ``trainer.py:117-133``; the
    importance depths are sampled under stop-gradient).
    """
    lead = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    dirs = jnp.broadcast_to(directions, positions.shape).reshape(-1, 3)
    packed = pack_params(params, cfg, dtype=dtype)
    out = _pallas_forward(packed, pos, dirs.astype(jnp.float32), cfg,
                          max(block, 2048), dtype, interpret)
    return out[:, 0].reshape(lead), out[:, 1:4].reshape(*lead, 3)


def _train_fwd(params, positions, directions, cfg, block, dtype, interpret):
    out = fused_train_apply(params, positions, directions, cfg, block, dtype,
                            interpret)
    return out, (params, positions, directions)


def _train_bwd(cfg, block, dtype, interpret, residuals, cotangents):
    params, positions, directions = residuals
    dsigma, drgb = cotangents
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    dirs = jnp.broadcast_to(directions, positions.shape).reshape(-1, 3)
    packed = pack_params(params, cfg, dtype=dtype)
    g = _packed_grads(
        packed, pos, dirs.astype(jnp.float32),
        dsigma.reshape(-1), drgb.reshape(-1, 3), cfg, block, dtype, interpret,
    )
    dparams = _unpack_grads(g, params, cfg)
    return (dparams, jnp.zeros_like(positions), jnp.zeros_like(directions))


fused_train_apply.defvjp(_train_fwd, _train_bwd)


def make_train_apply_fn(block: int = 1024, dtype=jnp.bfloat16,
                        interpret: bool = False):
    """Adapter matching the ``render.pipeline`` ``apply_fn`` signature."""

    def apply_fn(params, positions, directions, cfg, compute_dtype=None):
        return fused_train_apply(
            params, positions, directions, cfg, block, dtype, interpret
        )

    return apply_fn
