"""nerf_tpu — a TPU-native NeRF training, rendering, and benchmarking framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
project dgsmith7/nerf-dbr (see SURVEY.md): coarse/fine NeRF training on
Blender-synthetic scenes, a unified multi-engine benchmark harness running the
same trained weights through several execution engines, RGB + depth sample
renders, CSV/chart reporting, and checkpoint/resume — re-designed TPU-first:

- the model and rendering math are pure-functional jax.numpy (``models/``,
  ``utils/rendering.py``), fully differentiable;
- the hot paths (fused positional-encoding + MLP evaluation, fused
  alpha-compositing, int8 quantized matmul) are Pallas TPU kernels (``ops/``);
- scaling is via ``jax.sharding.Mesh`` + NamedSharding over the ray axis with
  XLA collectives (``parallel/``), not per-device backend forks;
- the reference's six device backends (PyTorch MPS/CPU/CUDA, NumPy+Numba,
  CPU-optimized, compressed) collapse into *engine variants* on one device
  type (``render/engines.py``): reference-XLA, fused-Pallas, compressed-int8.
"""

__version__ = "0.1.0"
