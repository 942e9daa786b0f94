"""Decompose the config-1 Whitted frame (12 tris, 640x480, mono BVH):
19 Mrays/s means ~16 ms of pure framework overhead — the judge's r5 bar is
>= 60 Mrays/s, so every phase must justify itself.  Run exclusively.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

if os.path.isdir(os.path.join(REPO, ".jax_cache")):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import whitted, common
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=20):
    x = f(*args)
    jax.block_until_ready(x)
    dt = 1e30
    for _ in range(2):
        t = time.time()
        acc = 0.0
        for _ in range(reps):
            acc = acc + f(*args)
        float(jnp.asarray(acc))
        dt = min(dt, (time.time() - t) / reps)
    log(name, round(dt * 1000, 2), "ms")
    return dt


def main():
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "cube_scene.xml"), layout="mono"
    )
    cam = cam_mod.make_camera(640, 480)
    rays = cam_mod.full_frame_rays(cam)
    o, d = rays.o, rays.d
    r = o.shape[0]
    log("setup", info.triangle_count, "tris", r, "rays",
        "packed", scene.packed is not None, "use_pallas", scene.use_pallas)

    timeit("raygen", jax.jit(lambda: cam_mod.full_frame_rays(cam).o.sum()))
    timeit("find_nearest", jax.jit(lambda o, d: query.find_nearest(scene, o, d)["t"].sum()), o, d)

    res = jax.jit(lambda o, d: query.find_nearest(scene, o, d))(o, d)
    jax.block_until_ready(res)
    point = o + res["t"][..., None] * d

    def hitinfo(o, d, point):
        normal, uv, mat_id = query.get_hit_info(scene, res, point, d)
        mf = query.material_fields(scene, mat_id)
        alb = query.get_albedo(scene, mat_id, uv, obj=res["obj_idx"], point=point, fields=mf)
        return normal.sum() + alb.sum()

    timeit("hitinfo+albedo", jax.jit(hitinfo), o, d, point)

    normal, uv, mat_id = jax.jit(lambda: query.get_hit_info(scene, res, point, d))()
    jax.block_until_ready(normal)
    timeit(
        "direct_illumination (shadow ray)",
        jax.jit(lambda p, n: common.direct_illumination(scene, p, n).sum()),
        point, normal,
    )
    timeit("sky_color full width", jax.jit(lambda d: query.sky_color(scene, d).sum()), d)

    timeit(
        "whitted depth 0 (no children)",
        jax.jit(lambda: whitted.render(scene, cam, depth_limit=0)["image"].sum()),
    )
    for dl in (1, 5):
        timeit(
            f"whitted depth {dl}",
            jax.jit(lambda dl=dl: whitted.render(scene, cam, depth_limit=dl)["image"].sum()),
        )


def sky_micro():
    """What inside sample_equirect costs: transcendental address math vs
    the 2M-texel gather vs a small-table gather."""
    import numpy as np
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "cube_scene.xml"), layout="mono"
    )
    cam = cam_mod.make_camera(640, 480)
    d = cam_mod.full_frame_rays(cam).d
    r = d.shape[0]
    packed = scene.atlas.packed
    log("atlas texels:", int(packed.shape[0]))
    rng = np.random.default_rng(0)
    idx_big = jnp.asarray(rng.integers(0, int(packed.shape[0]), size=r).astype(np.int32))
    idx_small = jnp.asarray(rng.integers(0, 32768, size=r).astype(np.int32))
    idx_seq = jnp.arange(r, dtype=jnp.int32) % 32768

    timeit("atan2+acos address math",
           jax.jit(lambda d: (jnp.arctan2(-d[:, 2], d[:, 0]) + jnp.arccos(-d[:, 1])).sum()), d)
    timeit("gather 2M-texel table (random idx)",
           jax.jit(lambda i: packed[i].sum()), idx_big)
    timeit("gather 2M-texel table (pixel-order sky idx)",
           jax.jit(lambda dd: packed[
               (jnp.clip((jnp.arccos(-dd[:, 1]) / jnp.pi) * 1024, 0, 1023).astype(jnp.int32) * 2048
                + jnp.clip(((jnp.arctan2(-dd[:, 2], dd[:, 0]) + jnp.pi) / (2 * jnp.pi)) * 2048, 0, 2047).astype(jnp.int32))
           ].sum()), d)
    timeit("gather 32K window (random idx)",
           jax.jit(lambda i: packed[:32768][i].sum()), idx_small)
    timeit("full sample_equirect",
           jax.jit(lambda dd: query.sky_color(scene, dd).sum()), d)


if __name__ == "__main__":
    if os.environ.get("SKY_MICRO"):
        sky_micro()
    else:
        main()
