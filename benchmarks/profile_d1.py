"""Decompose the depth-1 bounce (the 68 ms marginal cost at the headline).

Builds realistic post-primary ray state via the wavefront kernel, then
times depth_body and its pieces separately: the full-width compaction sort,
the 48-chunk bounce scan, the traverse inside it, and the shade inside it.
"""

import functools
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
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene
from cpu_ray_tracer_tpu.ops.pallas import wavefront_pt

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=16):
    x = f(*args)
    jax.block_until_ready(x)
    t = time.time()
    acc = 0.0
    for _ in range(reps):
        acc = acc + f(*args)
    float(jnp.asarray(acc))
    dt = (time.time() - t) / reps
    log(name, round(dt * 1000, 2), "ms")
    return dt


def main():
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    n = cam.width * cam.height
    r = n

    def make_state(spp_idx):
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
        seeds = rng_mod.pixel_seeds(pixel_ids, spp_idx)
        seeds, jx = rng_mod.random_float(seeds)
        seeds, jy = rng_mod.random_float(seeds)
        rays = cam_mod.full_frame_rays(cam, jitter_x=jx, jitter_y=jy)
        wf = wavefront_pt.trace(scene, rays.o, rays.d, seeds, 1, 5, interpret=False)
        return dict(
            o=wf["o"], d=wf["d"], seed=wf["seed"], throughput=wf["tp"],
            lit=jnp.zeros((r,), jnp.bool_), inside=wf["inside"],
            alive=wf["alive"], missed=wf["missed"],
            traversed=wf["traversed"], tested=wf["tested"],
            pixel=jnp.arange(r, dtype=jnp.int32), locus=wf["locus"],
        )

    state = jax.jit(make_state)(jnp.uint32(1))
    jax.block_until_ready(state)
    live = int(jnp.sum(state["alive"].astype(jnp.int32)))
    log("setup:", info.triangle_count, "tris;", live, f"live of {r} ({live/r:.1%})")

    chunks = 48
    chunk = r // chunks

    # 1. full-width compaction sort
    f_sort = jax.jit(lambda st: pathtracer._sort_state(scene, st)["o"].sum())
    timeit("sort_state full width", f_sort, state)

    sorted_state = jax.jit(lambda st: pathtracer._sort_state(scene, st))(state)
    jax.block_until_ready(sorted_state)

    # 2. the whole depth_body (sort + chunked bounce)
    use_tcap, t_cap = pathtracer._tcap_setup(scene, False)
    bounce = functools.partial(
        pathtracer._bounce_step, scene, query.find_nearest, 5, use_tcap, t_cap
    )
    depth_body = pathtracer._make_depth_body(scene, bounce, chunk)

    def f_depth_body(st):
        (st2, rt), _ = jax.lax.scan(
            depth_body, (st, jnp.int32(0)), jnp.arange(1, 2)
        )
        return st2["throughput"].sum() + st2["o"].sum()

    timeit("depth_body d1 (sort+scan)", jax.jit(f_depth_body), state)

    # 3. chunked bounce scan only (pre-sorted input)
    def f_scan_only(st):
        w = r
        n_chunks = chunks
        chunked = {
            k: st[k].reshape(n_chunks, w // n_chunks, *st[k].shape[1:])
            for k in pathtracer._RAY_KEYS
        }
        chunk_alive = jnp.sum(
            st["alive"].reshape(n_chunks, w // n_chunks).astype(jnp.int32), axis=1
        )

        def chunk_body(_, inp):
            piece, calive = inp
            out = jax.lax.cond(
                calive > 0, lambda p: bounce(jnp.int32(1), p, capped=True),
                lambda p: p, piece,
            )
            return None, out

        _, chunked = jax.lax.scan(chunk_body, None, (chunked, chunk_alive))
        return chunked["throughput"].sum() + chunked["o"].sum()

    timeit("chunked bounce scan (sorted in)", jax.jit(f_scan_only), sorted_state)

    # 4. traverse only, chunked the same way
    def f_trav_only(st):
        chunked_o = st["o"].reshape(chunks, chunk, 3)
        chunked_d = st["d"].reshape(chunks, chunk, 3)
        chunk_alive = jnp.sum(
            st["alive"].reshape(chunks, chunk).astype(jnp.int32), axis=1
        )
        am = st["alive"].reshape(chunks, chunk)

        def chunk_body(_, inp):
            o, d, m, calive = inp
            out = jax.lax.cond(
                calive > 0,
                lambda: query.find_nearest(scene, o, d, mask=m, sort_rays=False)["t"].sum(),
                lambda: jnp.float32(0.0),
            )
            return None, out

        _, ts = jax.lax.scan(chunk_body, None, (chunked_o, chunked_d, am, chunk_alive))
        return ts.sum()

    timeit("traverse only (chunked, sorted)", jax.jit(f_trav_only), sorted_state)

    # 5. one full _bounce_step at full width, no chunking (upper bound)
    f_full = jax.jit(
        lambda st: pathtracer._bounce_step(
            scene, query.find_nearest, 5, False, None, jnp.int32(1), st
        )["throughput"].sum()
    )
    timeit("bounce_step full width (no chunks)", f_full, sorted_state)


if __name__ == "__main__":
    main()
