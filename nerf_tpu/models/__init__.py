from nerf_tpu.models.encoding import positional_encoding
from nerf_tpu.models.nerf import (
    NeRFParams,
    apply_nerf,
    init_nerf_params,
    load_bmild_weights,
    params_from_torch_state_dict,
)

__all__ = [
    "positional_encoding",
    "NeRFParams",
    "apply_nerf",
    "init_nerf_params",
    "load_bmild_weights",
    "params_from_torch_state_dict",
]
