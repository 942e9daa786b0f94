"""Decompose the depth-1 bounce scan phases on sorted state (r5).

The d1 scan is ~32 ms of the pass; this times its pieces separately:
chunked traverse, the [W,16] hit-record shade path, the albedo texel tap
at several sub-chunk factors, and the lobe math, so the attack order is
measured.  Run exclusively (one TPU process).
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


def timeit(name, f, *args, reps=12):
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
            lit=wf["lit"], inside=wf["inside"],
            alive=wf["alive"], missed=wf["missed"],
            traversed=wf["traversed"], tested=wf["tested"],
            pixel=jnp.arange(r, dtype=jnp.int32), locus=wf["locus"],
        )

    sorted_state = jax.jit(
        lambda i: pathtracer._sort_state(scene, make_state(i))
    )(jnp.uint32(1))
    jax.block_until_ready(sorted_state)
    live = int(jnp.sum(sorted_state["alive"].astype(jnp.int32)))
    log("setup:", live, f"live of {r} ({live/r:.1%})")

    chunks = 48
    cw = r // chunks

    def ck(x):
        return x.reshape(chunks, cw, *x.shape[1:])

    chunk_alive = jnp.sum(ck(sorted_state["alive"]).astype(jnp.int32), axis=1)

    def chunked(fn, st, extra=()):
        """scan fn over chunks with the dead-chunk cond, like depth_body."""
        args = {k: ck(st[k]) for k in ("o", "d", "alive")}

        def body(_, inp):
            a, calive = inp
            out = jax.lax.cond(
                calive > 0, fn, lambda z: jnp.float32(0.0), a
            )
            return None, out

        _, outs = jax.lax.scan(body, None, (args, chunk_alive))
        return outs.sum()

    # 1. traverse only
    def trav(a):
        res = query.find_nearest(scene, a["o"], a["d"], mask=a["alive"], sort_rays=False)
        return res["t"].sum()

    timeit("traverse (48ch)", jax.jit(lambda st: chunked(trav, st)), sorted_state)

    # 2. traverse + hitinfo/material (no albedo, no lobes)
    def trav_hit(a):
        res = query.find_nearest(scene, a["o"], a["d"], mask=a["alive"], sort_rays=False)
        point = a["o"] + res["t"][..., None] * a["d"]
        normal, uv, mat_id = query.get_hit_info(scene, res, point, a["d"])
        mf = query.material_fields(scene, mat_id)
        return normal.sum() + uv.sum() + mf["reflectivity"].sum()

    timeit("traverse+hitinfo (48ch)", jax.jit(lambda st: chunked(trav_hit, st)), sorted_state)

    # 3. + albedo tap at tap_chunks = 1 / 8
    for tc in (1, 8):
        def trav_hit_alb(a, tc=tc):
            res = query.find_nearest(scene, a["o"], a["d"], mask=a["alive"], sort_rays=False)
            point = a["o"] + res["t"][..., None] * a["d"]
            normal, uv, mat_id = query.get_hit_info(scene, res, point, a["d"])
            mf = query.material_fields(scene, mat_id)
            obj = res["obj_idx"]
            if tc > 1:
                def tap_body(_, z):
                    mid_c, uv_c, obj_c, pt_c, mf_c = z
                    return None, query.get_albedo(
                        scene, mid_c, uv_c, obj=obj_c, point=pt_c, fields=mf_c
                    )
                w = mat_id.shape[0]
                c2 = lambda x: x.reshape(tc, w // tc, *x.shape[1:])
                _, albedo = jax.lax.scan(
                    tap_body, None,
                    (c2(mat_id), c2(uv), c2(obj), c2(point), {k: c2(v) for k, v in mf.items()}),
                )
                albedo = albedo.reshape(w, 3)
            else:
                albedo = query.get_albedo(scene, mat_id, uv, obj=obj, point=point, fields=mf)
            return albedo.sum()

        timeit(f"traverse+hitinfo+albedo tc={tc} (48ch)",
               jax.jit(lambda st, tc=tc: chunked(functools.partial(trav_hit_alb, tc=tc), st)),
               sorted_state)

    # 4. the full bounce
    use_tcap, t_cap = pathtracer._tcap_setup(scene, False)

    def full(a):
        s = dict(
            o=a["o"], d=a["d"], alive=a["alive"],
            seed=jnp.full((cw,), 7, jnp.uint32),
            throughput=jnp.ones((cw, 3), jnp.float32),
            inside=jnp.zeros((cw,), jnp.bool_),
            missed=jnp.zeros((cw,), jnp.bool_),
            lit=jnp.zeros((cw,), jnp.bool_),
            traversed=jnp.zeros((cw,), jnp.int32),
            tested=jnp.zeros((cw,), jnp.int32),
            pixel=jnp.zeros((cw,), jnp.int32),
            locus=jnp.zeros((cw,), jnp.int32),
        )
        out = pathtracer._bounce_step(
            scene, query.find_nearest, 5, use_tcap, t_cap, jnp.int32(1), s,
            capped=True,
        )
        return out["throughput"].sum()

    timeit("full bounce_step (48ch)", jax.jit(lambda st: chunked(full, st)), sorted_state)


if __name__ == "__main__":
    main()
