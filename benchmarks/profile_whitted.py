"""Whitted frame-time profile on the upstream inside_scene at 1024x640 —
the reference's own display metric (2. WhittedStyle/renderer.cpp:169-171).

Breaks the frame into its components (VERDICT #3: the any-hit kernel was
never profiled):
  - primary find_nearest (655k rays)
  - primary shadow any-hit (is_occluded)
  - full frame (render_jit), and per-level cost implied by the deltas
  - any-hit vs nearest kernel cost on identical rays

Run exclusively on the TPU.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

XML = "/root/reference/assets/scenes/inside_scene.xml"
W, H = 1024, 640


def main():
    import jax
    import jax.numpy as jnp

    if os.path.isdir(os.path.join(REPO, ".jax_cache")):
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    from cpu_ray_tracer_tpu.core import camera as cam_mod
    from cpu_ray_tracer_tpu.render import whitted
    from cpu_ray_tracer_tpu.scene import query
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(XML, layout="tlas")
    cam = cam_mod.make_camera(W, H)
    rays = cam_mod.full_frame_rays(cam)

    def warm():
        x = jnp.float32(1.0)
        g = jax.jit(lambda v: v * 1.000001)
        for _ in range(60):
            x = g(x)
        x.block_until_ready()

    def timed(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        warm()
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n * 1000

    f_near = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d)["t"].sum())
    f_occ = jax.jit(
        lambda sc, o, d: query.is_occluded(
            sc, o, d, jnp.full(o.shape[:1], 5.0, jnp.float32)
        ).sum()
    )
    f_frame = jax.jit(
        lambda sc: whitted.render(sc, cam, cap_factor=2.0)["image"].sum()
    )
    f_depth1 = jax.jit(
        lambda sc: whitted.render(sc, cam, depth_limit=0)["image"].sum()
    )

    out = dict(
        scene="inside_scene", resolution=[W, H], tris=info.triangle_count,
        primary_nearest_ms=round(timed(f_near, scene, rays.o, rays.d), 2),
        primary_anyhit_ms=round(timed(f_occ, scene, rays.o, rays.d), 2),
        depth0_frame_ms=round(timed(f_depth1, scene), 2),
        full_frame_ms=round(timed(f_frame, scene), 2),
    )
    out["fps"] = round(1000.0 / out["full_frame_ms"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
