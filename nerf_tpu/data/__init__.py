from nerf_tpu.data.blender import BlenderDataset, load_blender_data
from nerf_tpu.data.synthetic import make_procedural_dataset

__all__ = ["BlenderDataset", "load_blender_data", "make_procedural_dataset"]
