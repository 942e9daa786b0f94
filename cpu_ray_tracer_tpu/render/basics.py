"""Primary-ray AOV renderer — the capability of the reference's
"1. Basics" project (1. Basics/renderer.cpp:15-26) plus the debug AOVs that
are commented-out one-liners in the other integrators
(2. WhittedStyle/renderer.cpp:34-39): albedo, normal, depth, edges, object
id, and the traversal/test heatmaps."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import debug
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.types import DeviceScene

AOV_KINDS = ("albedo", "normal", "depth", "edges", "traversal", "tests", "obj_id")


def render(scene: DeviceScene, camera: cam_mod.Camera, aov: str = "albedo"):
    rays = cam_mod.full_frame_rays(camera)
    res = query.find_nearest(scene, rays.o, rays.d)
    point = rays.o + res["t"][..., None] * rays.d
    normal, uv, mat_id = query.get_hit_info(scene, res, point, rays.d)
    hit = (res["obj_idx"] >= 0)[..., None]

    if aov == "albedo":
        img = jnp.where(hit, query.get_albedo(scene, mat_id, uv, obj=res["obj_idx"], point=point), 0.0)
    elif aov == "normal":
        img = jnp.where(hit, (normal + 1.0) * 0.5, 0.0)
    elif aov == "depth":
        img = jnp.where(hit, 0.1 * res["t"][..., None].repeat(3, -1), 0.0)
    elif aov == "edges":
        img = debug.edge_color(res["bary"])
    elif aov == "traversal":
        img = debug.traverse_count_color(res["traversed"], jnp.max(res["traversed"]))
    elif aov == "tests":
        img = debug.traverse_count_color(res["tested"], jnp.max(res["tested"]))
    elif aov == "obj_id":
        img = debug.id_color(res["obj_idx"])
    else:
        raise ValueError(f"unknown AOV {aov!r}; expected one of {AOV_KINDS}")
    return img.reshape(camera.height, camera.width, 3)


render_jit = jax.jit(render, static_argnames=("aov",))


def probe(scene: DeviceScene, camera: cam_mod.Camera, x: float, y: float) -> dict:
    """Single-ray scene query at pixel (x, y) — the reference's ImGui
    "object id under the mouse" readout (2. WhittedStyle/renderer.cpp:215-217).
    Returns python scalars: obj_idx, tri_idx, t."""
    import jax.numpy as jnp

    rays = cam_mod.primary_rays(camera, jnp.asarray([float(x)]), jnp.asarray([float(y)]))
    res = query.find_nearest(scene, rays.o, rays.d)
    return dict(
        obj_idx=int(res["obj_idx"][0]),
        tri_idx=int(res["tri_idx"][0]),
        t=float(res["t"][0]),
    )
