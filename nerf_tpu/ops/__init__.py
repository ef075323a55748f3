from nerf_tpu.ops.mlp_kernel import (
    fused_nerf_apply,
    make_pallas_apply_fn,
    pack_params,
)
from nerf_tpu.ops.quant import (
    make_quantized_apply_fn,
    quantize_model,
    quantized_nerf_apply,
)

__all__ = [
    "fused_nerf_apply",
    "make_pallas_apply_fn",
    "pack_params",
    "quantize_model",
    "quantized_nerf_apply",
    "make_quantized_apply_fn",
]
