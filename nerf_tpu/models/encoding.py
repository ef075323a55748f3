"""Sinusoidal positional encoding.

Capability parity with reference ``src/models/nerf.py:13-45`` (PositionalEncoding):
output layout is ``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]`` with
frequency bands ``f_i = 2^i`` (times pi when ``include_pi``, the reference's
quirk at ``nerf.py:42-43``; the original NeRF / bundled bmild example weights
omit the pi).

TPU notes: this is pure VPU work and XLA fuses it into the first MLP matmul's
producer; the Pallas fused-eval kernel (``ops/mlp_kernel.py``) recomputes it
in VMEM from the raw 3-vector instead of reading the 63-wide encoding from
HBM — a 21x input-bandwidth saving.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_pi: bool = True) -> jnp.ndarray:
    """Encode ``x [..., D] -> [..., D * (1 + 2 * num_freqs)]``.

    Ordering matches the reference exactly: the raw input first, then for each
    frequency band its sin block followed by its cos block (each D wide).
    """
    if num_freqs == 0:
        return x
    scale = np.pi if include_pi else 1.0
    freqs = (2.0 ** np.arange(num_freqs)) * scale          # [L], static
    freqs = jnp.asarray(freqs, dtype=x.dtype)
    # [..., 1, D] * [L, 1] -> [..., L, D]
    xf = x[..., None, :] * freqs[:, None]
    # interleave sin/cos per frequency: [..., L, 2, D] -> [..., 2*L*D]
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)


def encoded_dim(in_dim: int, num_freqs: int) -> int:
    return in_dim * (1 + 2 * num_freqs)
