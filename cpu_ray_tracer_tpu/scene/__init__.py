from cpu_ray_tracer_tpu.scene.types import DeviceScene, SceneInfo
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene

__all__ = ["DeviceScene", "SceneInfo", "query", "compile_scene"]
