"""Animated / mutable scenes: the SetTransform + SetTime + Refit capability
(BLASBVH::SetTransform blas_bvh.cpp:363-374, BVH::Refit bvh.cpp:26-43,
BaseScene::SetTime).

On the TPU the scene is immutable device data, so "mutating" a transform
means re-baking on host and shipping fresh arrays.  With the native C++
builder a full rebuild of a 10k-triangle scene takes ~10ms — on these scene
sizes rebuild IS the refit story; `refit` (topology-preserving bounds sweep)
exists for much larger scenes where a SAH rebuild would dominate.
"""

from __future__ import annotations

import numpy as np

from cpu_ray_tracer_tpu.io.scene_xml import SceneSpec, load_scene_xml
from cpu_ray_tracer_tpu.scene.build import compile_scene


class AnimatedScene:
    """Holds the host-side scene spec; `set_transform` / `set_time` mutate it
    and `build()` emits a fresh DeviceScene (jit caches stay valid — shapes
    are unchanged as long as the object set is)."""

    def __init__(self, xml_path: str | None = None, spec: SceneSpec | None = None, **compile_opts):
        self.spec = spec if spec is not None else load_scene_xml(xml_path)
        self.compile_opts = compile_opts
        self.anim_time = 0.0

    def set_transform(self, obj_index: int, position=None, rotation_deg=None, scale=None):
        o = self.spec.objects[obj_index]
        if position is not None:
            o.position = np.asarray(position, np.float32)
        if rotation_deg is not None:
            o.rotation = np.asarray(rotation_deg, np.float32)
        if scale is not None:
            o.scale = np.asarray(scale, np.float32)

    def set_light_position(self, position):
        self.spec.light_pos = np.asarray(position, np.float32)

    def set_time(self, t: float):
        """FileScene::SetTime parity: stores animTime (the reference's XML
        scenes animate nothing by default — the quad-light swing is commented
        out, tlas_file_scene.cpp:18)."""
        self.anim_time = t

    def build(self):
        return compile_scene(spec=self.spec, **self.compile_opts)
