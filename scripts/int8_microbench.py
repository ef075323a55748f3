"""Root-cause microbench for the int8-compute negative result.

The int8 engine (s8 x s8 -> s32 MXU matmuls, nominally 2x bf16 peak on v5e:
394 TOPS vs 197 TFLOP/s) measured SLOWER than the bf16 engine
(results/perf/int8_matmul.json, round 3). This script splits where the loss
lives, at the engine's exact layer shape ([M,256] x [256,256], 8 layers):

1. ``bf16_chain``        — relu(x @ w) chained 8x: the production baseline.
2. ``bf16_parallel``     — 8 *independent* dots, summed: pure-matmul bound,
                           no inter-layer dependency or epilogue.
3. ``s8_parallel``       — the same 8 independent dots in s8xs8->s32 with NO
                           requant epilogue: the pure int8 matmul bound.
                           If this does not approach 2x (2), Mosaic is not
                           emitting the int8 MXU mode and NO engine-level
                           change can win.
4. ``s8_chain_shift``    — chained s8 dots with the cheapest possible
                           requantize between layers (arithmetic shift +
                           clip): adds the dependency + minimal VPU work.
5. ``s8_chain_rowmax``   — chained s8 dots with the engine's real per-row
                           dynamic quantization (rowmax + scale + round):
                           (5) - (4) prices the activation-quantize VPU
                           work; (4) - (3) prices the serialization.

Writes results/perf/int8_microbench.json; docs/PERF.md quotes it.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/int8_microbench.py
"""

import functools
import json
import os
import statistics
import sys
import time

import numpy as np

M = 2048          # rows per grid step (the engine's block width)
K = 256           # layer width
L = 8             # trunk depth
STEPS = 512       # grid steps per timed call
REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    from nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.devices()[0].platform != "tpu":
        log("must run on TPU")
        return 2

    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((STEPS * M, K)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((L, K, K)) * 0.1, jnp.bfloat16)
    x_s8 = jnp.asarray(rng.integers(-127, 128, (STEPS * M, K)), jnp.int8)
    w_s8 = jnp.asarray(rng.integers(-127, 128, (L, K, K)), jnp.int8)

    flops = 2 * M * K * K * L * STEPS  # same matmul work in every variant

    def bf16_chain_kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        for i in range(L):
            x = jax.nn.relu(jnp.dot(x, w_ref[i],
                                    preferred_element_type=jnp.float32)
                            ).astype(jnp.bfloat16)
        o_ref[:] = x.astype(jnp.float32)

    def bf16_parallel_kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros((M, K), jnp.float32)
        for i in range(L):
            acc += jnp.dot(x, w_ref[i], preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def s8_parallel_kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros((M, K), jnp.int32)
        for i in range(L):
            acc += jnp.dot(x, w_ref[i], preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32)

    def s8_chain_shift_kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        for i in range(L):
            y = jnp.dot(x, w_ref[i], preferred_element_type=jnp.int32)
            # cheapest requant: arithmetic shift + clip (no rowmax, no float)
            x = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        o_ref[:] = x.astype(jnp.float32)

    def s8_chain_rowmax_kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        for i in range(L):
            y = jnp.dot(x, w_ref[i], preferred_element_type=jnp.int32)
            # the engine's real dynamic per-row symmetric quantization
            yf = y.astype(jnp.float32)
            m = jnp.max(jnp.abs(yf), axis=1, keepdims=True)
            scale = jnp.where(m > 0, 127.0 / m, 1.0)
            x = jnp.round(yf * scale).astype(jnp.int8)
        o_ref[:] = x.astype(jnp.float32)

    def build(kernel, x, w):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, K, K), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((STEPS * M, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    variants = {
        "bf16_chain": (bf16_chain_kernel, x_bf, w_bf),
        "bf16_parallel": (bf16_parallel_kernel, x_bf, w_bf),
        "s8_parallel": (s8_parallel_kernel, x_s8, w_s8),
        "s8_chain_shift": (s8_chain_shift_kernel, x_s8, w_s8),
        "s8_chain_rowmax": (s8_chain_rowmax_kernel, x_s8, w_s8),
    }

    results = {}
    for name, (kernel, x, w) in variants.items():
        fn = jax.jit(lambda x, w, k=build(kernel, x, w): k(x, w))
        # warm (compile) + timing via host scalar fetch (tunnel-honest:
        # block_until_ready does not sync through the axon tunnel)
        float(jnp.sum(fn(x, w)[0]))
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jnp.sum(fn(x, w)[0]))
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        tops = flops / (ms / 1e3) / 1e12
        results[name] = {"ms": round(ms, 2), "tflops_or_tops": round(tops, 1)}
        log(f"{name:<18} {ms:8.2f} ms  {tops:6.1f} T(FL)OP/s")

    r = results
    payload = {
        "experiment": "int8-compute root cause: pure s8 matmul bound vs "
                      "requant epilogue cost, TPU v5e via Pallas/Mosaic",
        "shape": f"[{M},{K}]x[{K},{K}], {L} layers, {STEPS} grid steps, "
                 f"median of {REPS}",
        "flops_per_call": flops,
        "results": results,
        "derived": {
            "s8_pure_vs_bf16_pure": round(
                r["bf16_parallel"]["ms"] / r["s8_parallel"]["ms"], 3),
            "serialization_cost_ms": round(
                r["s8_chain_shift"]["ms"] - r["s8_parallel"]["ms"], 2),
            "rowmax_quant_cost_ms": round(
                r["s8_chain_rowmax"]["ms"] - r["s8_chain_shift"]["ms"], 2),
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "perf",
        "int8_microbench.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["derived"]))
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
