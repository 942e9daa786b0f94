from cpu_ray_tracer_tpu.ops import intersect, traverse_bvh

__all__ = ["intersect", "traverse_bvh"]
