from cpu_ray_tracer_tpu.parallel import mesh, sharded
from cpu_ray_tracer_tpu.parallel.mesh import make_mesh, replicate_scene

__all__ = ["mesh", "sharded", "make_mesh", "replicate_scene"]
