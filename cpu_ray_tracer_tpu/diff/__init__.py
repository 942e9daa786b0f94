from cpu_ray_tracer_tpu.diff import grad, optimize

__all__ = ["grad", "optimize"]
