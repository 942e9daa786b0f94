from cpu_ray_tracer_tpu.ops.pallas import packet_bvh

__all__ = ["packet_bvh"]
