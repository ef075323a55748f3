from nerf_tpu.render.pipeline import render_rays

__all__ = ["render_rays"]
