from cpu_ray_tracer_tpu.io.obj import load_obj, MeshData
from cpu_ray_tracer_tpu.io.scene_xml import load_scene_xml, SceneSpec, ObjectSpec, MaterialSpec
from cpu_ray_tracer_tpu.io.image import load_texture_image

__all__ = [
    "load_obj",
    "MeshData",
    "load_scene_xml",
    "SceneSpec",
    "ObjectSpec",
    "MaterialSpec",
    "load_texture_image",
]
