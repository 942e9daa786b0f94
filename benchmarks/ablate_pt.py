"""Ablation profiling of the PT pass: which stage owns the time?

Variants (all full 6-bounce loops at 1280x720):
  full            — the real pass
  no_shading      — traversal + RNG + bounce movement, constant shading
  no_traversal    — shading + RNG, fixed fake hits
  no_sort         — full but spatial/octant sort disabled
Run exclusively on the TPU.
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
from cpu_ray_tracer_tpu.core import rng as rng_mod
from cpu_ray_tracer_tpu.render import common
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=3):
    x = f(*args)
    jax.block_until_ready(x)
    ts = []
    for _ in range(reps):
        t = time.time()
        x = f(*args)
        jax.block_until_ready(x)
        ts.append(time.time() - t)
    log(name, round(min(ts) * 1000, 1), "ms")


def make_pass(scene, cam, use_traversal=True, use_shading=True, sort=True):
    n = cam.width * cam.height

    def run(spp_index):
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
        seeds = rng_mod.pixel_seeds(pixel_ids, spp_index)
        seeds, jx = rng_mod.random_float(seeds)
        seeds, jy = rng_mod.random_float(seeds)
        rays = cam_mod.full_frame_rays(cam, jitter_x=jx, jitter_y=jy)
        o, d = rays.o, rays.d
        throughput = jnp.ones((n, 3), jnp.float32)
        radiance = jnp.zeros((n, 3), jnp.float32)
        alive = jnp.ones((n,), jnp.bool_)
        inside = jnp.zeros((n,), jnp.bool_)
        seed = seeds
        for depth in range(6):
            if use_traversal:
                res = query.find_nearest(scene, o, d, mask=alive, sort_rays=sort and depth >= 1)
            else:
                res = dict(
                    t=jnp.full((n,), 3.0, jnp.float32),
                    obj_idx=jnp.where(alive, 2, -1),
                    tri_idx=jnp.where(alive, 5, -1),
                    bary=jnp.full((n, 2), 0.3, jnp.float32),
                    mat_id_tri=jnp.where(alive, 2, -1),
                    traversed=jnp.zeros((n,), jnp.int32),
                    tested=jnp.zeros((n,), jnp.int32),
                )
            t = res["t"]
            obj = res["obj_idx"]
            hit = (obj >= 0) & alive
            point = o + t[..., None] * d
            if use_shading:
                normal, uv, mat_id = query.get_hit_info(scene, res, point, d)
                mf = query.material_fields(scene, mat_id)
                albedo = query.get_albedo(scene, mat_id, uv, obj=obj, point=point)
            else:
                normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), point.shape)
                albedo = jnp.full((n, 3), 0.5, jnp.float32)
                mf = dict(
                    is_light=jnp.zeros((n,), jnp.bool_),
                    reflectivity=jnp.zeros((n,), jnp.float32),
                    refractivity=jnp.zeros((n,), jnp.float32),
                    absorption=jnp.zeros((n, 3), jnp.float32),
                )
            seed, r1 = rng_mod.random_float(seed)
            seed, r2 = rng_mod.random_float(seed)
            new_d = common.uniform_hemisphere(normal, r1, r2)
            radiance = radiance + jnp.where(hit[..., None], throughput * 0.01, 0.0)
            throughput = jnp.where(hit[..., None], throughput * albedo, throughput)
            o = jnp.where(hit[..., None], point + new_d * 1e-3, o)
            d = jnp.where(hit[..., None], new_d, d)
            alive = hit
        if use_shading:
            radiance = radiance + throughput * query.sky_color(scene, d)
        return radiance.sum()

    return jax.jit(run)


def main():
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    log("setup")
    timeit("full", make_pass(scene, cam), jnp.uint32(0))
    timeit("no_shading", make_pass(scene, cam, use_shading=False), jnp.uint32(0))
    timeit("no_traversal", make_pass(scene, cam, use_traversal=False), jnp.uint32(0))
    timeit("no_sort", make_pass(scene, cam, sort=False), jnp.uint32(0))


if __name__ == "__main__":
    main()
