"""NeRF MLP as a pure-functional JAX model over a params pytree.

Capability parity with reference ``src/models/nerf.py:48-131`` (NeRFModel):
8x256 trunk with a skip concat of the position encoding, a density head, and a
view-direction-conditioned color branch. Two architecture variants are
supported (selected by ``ModelConfig.variant``):

- ``"reference"``: the reference repo's own layout — skip input is
  ``[h, posenc]`` (``nerf.py:109-110``), density head 256->1 with in-model
  ReLU (``nerf.py:114``), color branch ``[h, dir_enc] -> 128 -> 3`` with
  sigmoid (``nerf.py:87-90,123-129``).
- ``"bmild"``: the original-NeRF layout used by the bundled lego example
  weights (``data/lego_example_weights/model_fine_200000.npy``, 24 arrays) —
  skip input is ``[posenc, h]``, raw (no-activation) alpha head, a 256->256
  bottleneck feeding ``[bottleneck, dir_enc] -> 128 -> 3``.

TPU-first design notes:

- Params are plain nested-dict pytrees of ``[in, out]``-layout float32
  matrices, so every layer is ``x @ W + b`` — directly MXU-shaped and
  trivially consumed by the Pallas fused kernel (``ops/mlp_kernel.py``).
- Compute dtype is configurable (bf16 matmuls with f32 accumulation via
  ``preferred_element_type``); parameters stay float32.
- ``apply_nerf`` is shape-polymorphic over leading batch dims and contains no
  Python control flow on traced values — it traces to a single fused XLA
  computation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.encoding import positional_encoding

# Params are nested dicts: {'trunk': [{'w','b'}...], 'density': {'w','b'},
# 'color0': {'w','b'}, 'color1': {'w','b'}, optional 'bottleneck': {'w','b'}}
NeRFParams = Dict[str, Any]


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias) so training dynamics match the reference."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(key: jax.Array, cfg: ModelConfig) -> NeRFParams:
    """Initialize a params pytree for the given architecture variant."""
    pos_dim, dir_dim, h = cfg.pos_dim, cfg.dir_dim, cfg.hidden_dim
    n_keys = cfg.n_layers + 4
    keys = list(jax.random.split(key, n_keys))

    trunk = []
    for i in range(cfg.n_layers):
        fan_in = pos_dim if i == 0 else h
        if i == cfg.skip_layer + (0 if cfg.variant == "reference" else 1):
            # reference: skip concat happens *before* layer `skip_layer`
            # (trunk layer 4 sees 256+63); bmild: concat happens *after*
            # layer `skip_layer`'s activation (trunk layer 5 sees 63+256).
            fan_in = h + pos_dim
        trunk.append(_linear_init(keys[i], fan_in, h))

    params: NeRFParams = {
        "trunk": trunk,
        "density": _linear_init(keys[cfg.n_layers], h, 1),
        "color0": _linear_init(keys[cfg.n_layers + 1], h + dir_dim, cfg.color_hidden_dim),
        "color1": _linear_init(keys[cfg.n_layers + 2], cfg.color_hidden_dim, 3),
    }
    if cfg.variant == "bmild":
        params["bottleneck"] = _linear_init(keys[cfg.n_layers + 3], h, h)
    return params


def _dense(x: jnp.ndarray, layer: Dict[str, jnp.ndarray], dtype) -> jnp.ndarray:
    w = layer["w"].astype(dtype)
    y = jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32)
    return y + layer["b"]


def apply_nerf(
    params: NeRFParams,
    positions: jnp.ndarray,
    directions: Optional[jnp.ndarray],
    cfg: ModelConfig,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLP at ``positions [..., 3]`` viewed from ``directions``.

    Returns ``(sigma [...], rgb [..., 3])`` in float32. For the "reference"
    variant sigma is already ReLU'd (matching ``nerf.py:114``; the compositor
    ReLUs again, which is idempotent); for "bmild" sigma is the raw alpha-head
    output, activated only by the compositor.
    """
    dt = jnp.dtype(compute_dtype)
    pos_enc = positional_encoding(positions, cfg.pos_freqs, cfg.posenc_pi)

    x = pos_enc
    for i, layer in enumerate(params["trunk"]):
        if cfg.variant == "reference" and i == cfg.skip_layer:
            x = jnp.concatenate([x, pos_enc], axis=-1)
        x = jax.nn.relu(_dense(x, layer, dt))
        if cfg.variant == "bmild" and i == cfg.skip_layer:
            x = jnp.concatenate([pos_enc, x], axis=-1)

    sigma = _dense(x, params["density"], dt)[..., 0]
    if cfg.variant == "reference":
        sigma = jax.nn.relu(sigma)

    if directions is None:
        # The reference's directions=None path is dimensionally broken
        # (``nerf.py:117-121``) and never exercised; here we evaluate the
        # color branch with a zero direction encoding instead.
        directions = jnp.zeros(positions.shape[:-1] + (3,), positions.dtype)
    if cfg.normalize_dirs:
        directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    dir_enc = positional_encoding(directions, cfg.dir_freqs, cfg.posenc_pi)

    feat = x
    if cfg.variant == "bmild":
        feat = _dense(x, params["bottleneck"], dt)  # no activation
    c = jnp.concatenate([feat, dir_enc.astype(feat.dtype)], axis=-1)
    c = jax.nn.relu(_dense(c, params["color0"], dt))
    rgb = jax.nn.sigmoid(_dense(c, params["color1"], dt))
    return sigma.astype(jnp.float32), rgb.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weight importers
# ---------------------------------------------------------------------------

def params_from_torch_state_dict(state_dict: Dict[str, Any], cfg: ModelConfig) -> NeRFParams:
    """Import a reference-format torch ``state_dict`` (``NeRFModel``) into a
    params pytree. torch Linear weights are [out, in]; ours are [in, out].

    Accepts tensors or numpy arrays (call ``.numpy()`` upstream for tensors).
    """

    def cvt(v):
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        return jnp.asarray(a, jnp.float32)

    def lin(prefix):
        return {"w": cvt(state_dict[f"{prefix}.weight"]).T, "b": cvt(state_dict[f"{prefix}.bias"])}

    return {
        "trunk": [lin(f"layers.{i}") for i in range(cfg.n_layers)],
        "density": lin("density_head"),
        "color0": lin("color_layers.0"),
        "color1": lin("color_layers.1"),
    }


def params_to_torch_state_dict(params: NeRFParams) -> Dict[str, np.ndarray]:
    """Export a "reference"-variant params pytree as a reference-format
    state_dict (numpy arrays, torch [out, in] weight layout)."""
    out: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["trunk"]):
        out[f"layers.{i}.weight"] = np.asarray(layer["w"]).T
        out[f"layers.{i}.bias"] = np.asarray(layer["b"])
    for name, key in (("density_head", "density"), ("color_layers.0", "color0"),
                      ("color_layers.1", "color1")):
        out[f"{name}.weight"] = np.asarray(params[key]["w"]).T
        out[f"{name}.bias"] = np.asarray(params[key]["b"])
    return out


def load_bmild_weights(path: str) -> NeRFParams:
    """Load original-NeRF Keras weights (the bundled lego example format:
    an object array of 24 [in, out] weight / bias arrays — 8 trunk pairs,
    bottleneck pair, viewdir pair, rgb pair, alpha pair)."""
    arrs = np.load(path, allow_pickle=True)
    if len(arrs) != 24:
        raise ValueError(f"expected 24 arrays in bmild weight file, got {len(arrs)}")

    def pair(i):
        return {"w": jnp.asarray(arrs[2 * i], jnp.float32),
                "b": jnp.asarray(arrs[2 * i + 1], jnp.float32)}

    return {
        "trunk": [pair(i) for i in range(8)],
        "bottleneck": pair(8),
        "color0": pair(9),   # [bottleneck(256), dir_enc(27)] -> 128
        "color1": pair(10),  # 128 -> 3
        "density": pair(11), # 256 -> 1 (raw alpha)
    }


def count_params(params: NeRFParams) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
