from cpu_ray_tracer_tpu.accel.types import TrianglePool, BVHArrays, GridArrays, KDTreeArrays
from cpu_ray_tracer_tpu.accel import bvh_builder

__all__ = [
    "TrianglePool",
    "BVHArrays",
    "GridArrays",
    "KDTreeArrays",
    "bvh_builder",
]
