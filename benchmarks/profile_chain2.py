"""Chained decomposition of the full-width (depth-0) pass cost.

Pieces: traversal kernel, find_nearest wrapper, hit-info interp, materials,
texture albedo, sky, RNG+camera gen, final unpermute scatters.
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


def warm_device(n=60):
    x = jnp.float32(1.0)
    f = jax.jit(lambda v: v * 1.000001)
    for _ in range(n):
        x = f(x)
    x.block_until_ready()


def chain(name, f, n=10):
    out = f()
    jax.block_until_ready(out)
    warm_device()
    t = time.time()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t) / n
    log(name, round(dt * 1000, 2), "ms")
    return dt


def main():
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    r = cam.width * cam.height
    log("setup", info.triangle_count, "tris", r, "rays")

    rays = cam_mod.full_frame_rays(cam)
    o, d = rays.o, rays.d
    jax.block_until_ready((o, d))

    # camera gen + seeds
    def gen(sc, i):
        pixel_ids = jnp.arange(r, dtype=jnp.uint32)
        seeds = rng_mod.pixel_seeds(pixel_ids, i)
        seeds, jx = rng_mod.random_float(seeds)
        seeds, jy = rng_mod.random_float(seeds)
        rr = cam_mod.full_frame_rays(cam, jitter_x=jx, jitter_y=jy)
        return rr.o.sum() + rr.d.sum() + seeds.sum()

    chain("camera+seeds", lambda f=jax.jit(gen): f(scene, jnp.uint32(1)))

    # traversal kernel alone (packet path, via find_nearest's dispatcher)
    from cpu_ray_tracer_tpu.ops.pallas import packet_bvh

    pk = scene.packed
    t_far = jnp.full((r,), 1e30, jnp.float32)
    trav = jax.jit(
        lambda pk, tris, o, d, t: packet_bvh.traverse(pk, tris, o, d, t)["t"].sum()
    )
    chain("packet kernel (traverse only)", lambda: trav(pk, scene.tris, o, d, t_far))

    fn = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d)["t"].sum())
    chain("find_nearest total", lambda: fn(scene, o, d))

    res = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d))(scene, o, d)
    jax.block_until_ready(res)
    point = o + res["t"][..., None] * d

    hi = jax.jit(
        lambda sc, res, point, d: jnp.concatenate(
            [*query.get_hit_info(sc, res, point, d)[:2]], axis=-1
        ).sum()
    )
    chain("get_hit_info", lambda: hi(scene, res, point, d))

    nrm, uv, mid = jax.jit(lambda: query.get_hit_info(scene, res, point, d))()
    jax.block_until_ready((nrm, uv, mid))

    mf = jax.jit(lambda sc, mid: query.material_fields(sc, mid)["albedo"].sum())
    chain("material one-hot", lambda: mf(scene, mid))

    alb = jax.jit(lambda sc, mid, uv: query.get_albedo(sc, mid, uv).sum())
    chain("get_albedo (texture)", lambda: alb(scene, mid, uv))

    sky = jax.jit(lambda sc, d: query.sky_color(sc, d).sum())
    chain("sky_color equirect", lambda: sky(scene, d))

    # lobe sampling math (RNG + hemisphere + dielectric)
    seeds0 = jnp.arange(r, dtype=jnp.uint32)

    def lobes(seed, d, nrm):
        seed, r1 = rng_mod.random_float(seed)
        seed, r2 = rng_mod.random_float(seed)
        dd = common.uniform_hemisphere(nrm, r1, r2)
        fr, can, t_dir, r_dir = common.dielectric_terms(d, nrm, jnp.zeros((r,), jnp.bool_))
        return dd.sum() + fr.sum() + t_dir.sum() + r_dir.sum()

    chain("lobe math", lambda f=jax.jit(lobes): f(seeds0, d, nrm))

    # final unpermute scatters
    pix = jnp.arange(r, dtype=jnp.int32)
    rad = jnp.ones((r, 3), jnp.float32)
    tr = jnp.ones((r,), jnp.int32)

    def scatters(pix, rad, tr):
        a = jnp.zeros((r, 3), jnp.float32).at[pix].set(rad)
        b = jnp.zeros((r,), jnp.int32).at[pix].set(tr)
        c = jnp.zeros((r,), jnp.int32).at[pix].set(tr)
        return a.sum() + b.sum() + c.sum()

    chain("final scatters x3", lambda f=jax.jit(scatters): f(pix, rad, tr))


if __name__ == "__main__":
    main()
