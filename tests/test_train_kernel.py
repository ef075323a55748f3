"""Gradient parity of the fused Pallas training backward vs the XLA path.

The fused backward (``ops/train_kernel.py``) recomputes the forward in VMEM
and accumulates weight grads on-chip; numerically it must sit in the same
noise class as XLA's own bf16 backward (both are ~7% worst-leaf
norm-relative from the f32 truth on random nets — the acceptance bar here).
"""

import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import ModelConfig
from nerf_tpu.models.nerf import apply_nerf, init_nerf_params
from nerf_tpu.ops.train_kernel import fused_train_apply, make_train_apply_fn

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig()  # reference variant
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    n = 1500  # not a block multiple: exercises the padding path
    pos = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(k2, (n, 3))
    tgt = jax.random.uniform(k3, (n,))
    return cfg, params, pos, dirs, tgt


def _losses(cfg, pos, dirs, tgt):
    def loss_fused(p):
        s, c = fused_train_apply(p, pos, dirs, cfg, 512, jnp.bfloat16,
                                 INTERPRET)
        return jnp.mean((c - 0.3) ** 2) + 0.1 * jnp.mean((s - tgt) ** 2)

    def loss_ref(p, dtype):
        s, c = apply_nerf(p, pos, dirs, cfg, compute_dtype=dtype)
        return jnp.mean((c - 0.3) ** 2) + 0.1 * jnp.mean((s - tgt) ** 2)

    return loss_fused, loss_ref


def test_forward_matches_xla(setup):
    cfg, params, pos, dirs, tgt = setup
    s1, c1 = fused_train_apply(params, pos, dirs, cfg, 512, jnp.bfloat16,
                               INTERPRET)
    s2, c2 = apply_nerf(params, pos, dirs, cfg, compute_dtype=jnp.bfloat16)
    assert jnp.max(jnp.abs(s1 - s2)) < 0.05
    assert jnp.max(jnp.abs(c1 - c2)) < 0.02


def test_grads_in_bf16_noise_class(setup):
    cfg, params, pos, dirs, tgt = setup
    loss_fused, loss_ref = _losses(cfg, pos, dirs, tgt)
    g_fused = jax.grad(loss_fused)(params)
    g_bf16 = jax.grad(lambda p: loss_ref(p, jnp.bfloat16))(params)
    g_f32 = jax.grad(lambda p: loss_ref(p, jnp.float32))(params)

    def worst_rel(a, b):
        rels = jax.tree_util.tree_map(
            lambda x, y: float(
                jnp.linalg.norm(x - y) / (jnp.linalg.norm(y) + 1e-20)
            ),
            a, b,
        )
        return max(jax.tree_util.tree_leaves(rels))

    xla_noise = worst_rel(g_bf16, g_f32)       # XLA's own bf16 noise
    kernel_noise = worst_rel(g_fused, g_f32)
    # the kernel may not be meaningfully noisier than XLA bf16 itself
    assert kernel_noise < max(2.0 * xla_noise, 0.02), (
        f"kernel {kernel_noise:.4f} vs xla-bf16 {xla_noise:.4f}"
    )


def test_zero_cotangents_for_inputs(setup):
    cfg, params, pos, dirs, tgt = setup

    def loss(po):
        s, c = fused_train_apply(params, po, dirs, cfg, 512, jnp.bfloat16,
                                 INTERPRET)
        return jnp.mean(c)

    g = jax.grad(loss)(pos)
    assert jnp.all(g == 0.0)


def test_train_step_converges_with_fused_kernels(setup):
    """A few optimization steps on a toy target must reduce the loss using
    the fused fwd+bwd (the end-to-end check that the unpacked grads point
    the right way)."""
    cfg, params, pos, dirs, tgt = setup
    apply_fn = make_train_apply_fn(block=512, interpret=INTERPRET)
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        s, c = apply_fn(p, pos, dirs, cfg)
        return jnp.mean((c - 0.3) ** 2) + 0.1 * jnp.mean((s - tgt) ** 2)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, st = opt.update(g, st)
        return optax.apply_updates(p, updates), st, l

    losses = []
    for _ in range(8):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses
