from cpu_ray_tracer_tpu.render import basics, whitted, pathtracer, debug

__all__ = ["basics", "whitted", "pathtracer", "debug"]
