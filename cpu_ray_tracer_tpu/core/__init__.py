from cpu_ray_tracer_tpu.core import vecmath, rng
from cpu_ray_tracer_tpu.core.rays import Rays, HitRecords
from cpu_ray_tracer_tpu.core.camera import Camera
from cpu_ray_tracer_tpu.core.materials import MaterialTable
from cpu_ray_tracer_tpu.core.textures import TextureAtlas
from cpu_ray_tracer_tpu.core.film import Film

__all__ = [
    "vecmath",
    "rng",
    "Rays",
    "HitRecords",
    "Camera",
    "MaterialTable",
    "TextureAtlas",
    "Film",
]
