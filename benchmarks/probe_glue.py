"""r5 glue probe: primitive costs of every sort/permute/scatter alternative
on realistic post-primary (depth-1) ray state at the 1280x720 headline.

The r4 verdict: the pass is glue-bound — depth-1 marginal cost ~66 ms of
which traverse is only ~10, and the tail pays 3 full-width random-access
reorders (d1 sort+permute, cascade sort+permute, final un-permute).  This
probe times each candidate replacement so the r5 redesign is
measurement-driven, not guessed.

Run exclusively (one TPU process).
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
from cpu_ray_tracer_tpu.ops.traverse_bvh import ray_octants
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene
from cpu_ray_tracer_tpu.ops.pallas import wavefront_pt

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=16):
    x = f(*args)
    jax.block_until_ready(x)
    dt = 1e30
    for _ in range(2):  # two passes; first chained measure reads inflated
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
            lit=jnp.zeros((r,), jnp.bool_), inside=wf["inside"],
            alive=wf["alive"], missed=wf["missed"],
            traversed=wf["traversed"], tested=wf["tested"],
            pixel=jnp.arange(r, dtype=jnp.int32), locus=wf["locus"],
        )

    state = jax.jit(make_state)(jnp.uint32(1))
    jax.block_until_ready(state)
    live = int(jnp.sum(state["alive"].astype(jnp.int32)))
    log("setup:", info.triangle_count, "tris;", live, f"live of {r} ({live/r:.1%})")

    # --- sort-key + apply variants ---------------------------------------
    def locus_key(st):
        oct_ = ray_octants(st["d"])
        key = (oct_ << 21) | jnp.clip(st["locus"] + 1, 0, (1 << 21) - 1)
        return jnp.where(st["alive"], key, jnp.int32(0x7FFFFFFF))

    timeit("argsort(locus key) only",
           jax.jit(lambda st: jnp.argsort(locus_key(st), stable=True).sum()), state)

    perm = jax.jit(lambda st: jnp.argsort(locus_key(st), stable=True))(state)
    jax.block_until_ready(perm)

    timeit("[R,15] permute gather only",
           jax.jit(lambda st, p: pathtracer._permute_state(st, p)["o"].sum()),
           state, perm)

    timeit("sort_state (argsort+permute)",
           jax.jit(lambda st: pathtracer._sort_state(scene, st)["o"].sum()), state)

    # counting sort, 9 buckets (dead-last + octant), scatter-applied
    def octant_cs_pos(st):
        oct_ = ray_octants(st["d"])
        key = jnp.where(st["alive"], oct_, jnp.int32(8))
        oh = jax.nn.one_hot(key, 9, dtype=jnp.int32)
        within = jnp.cumsum(oh, axis=0) - oh
        counts = within[-1] + oh[-1]
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        return jnp.sum(oh * (starts[None, :] + within), axis=1)

    timeit("counting-sort positions (9 buckets)",
           jax.jit(lambda st: octant_cs_pos(st).sum()), state)
    timeit("counting sort + [R,15] scatter apply",
           jax.jit(lambda st: pathtracer._permute_state(
               st, ("scatter", octant_cs_pos(st)))["o"].sum()), state)

    # monotone compaction: alive-prefix positions via cumsum, scatter-apply
    def compact_pos(st):
        al = st["alive"].astype(jnp.int32)
        c = jnp.cumsum(al)
        n_live = c[-1]
        dead_rank = jnp.cumsum(1 - al)
        return jnp.where(st["alive"], c - 1, n_live + dead_rank - 1)

    timeit("compaction positions (cumsum)",
           jax.jit(lambda st: compact_pos(st).sum()), state)
    timeit("compaction + [R,15] scatter apply",
           jax.jit(lambda st: pathtracer._permute_state(
               st, ("scatter", compact_pos(st)))["o"].sum()), state)

    # --- retire / un-permute variants ------------------------------------
    rad = jax.jit(lambda st: jnp.where(st["missed"][..., None], st["throughput"], 0.02))(state)
    jax.block_until_ready(rad)

    timeit("final un-permute (iota-scatter + [R,3] gather)",
           jax.jit(lambda rd, px: pathtracer._apply_perm(
               rd, pathtracer._inverse_perm(px), px).sum()),
           rad, state["pixel"])

    def scatter3(rd, px):
        out0 = jnp.zeros((r,), jnp.float32).at[px].add(rd[:, 0])
        out1 = jnp.zeros((r,), jnp.float32).at[px].add(rd[:, 1])
        out2 = jnp.zeros((r,), jnp.float32).at[px].add(rd[:, 2])
        return out0.sum() + out1.sum() + out2.sum()

    timeit("3x 1-D scatter-add by pixel id (full R)",
           jax.jit(scatter3), rad, perm)

    def scatter_rows(rd, px):
        out = jnp.zeros((r, 3), jnp.float32).at[px].add(rd)
        return out.sum()

    timeit("[R,3] row scatter-add by pixel id (cliff check)",
           jax.jit(scatter_rows), rad, perm, reps=4)

    w = r // 16
    timeit("3x 1-D scatter-add narrow (R/16)",
           jax.jit(lambda rd, px: scatter3(rd[:w], px[:w])), rad, perm)

    # --- depth-1 chunk-count sweep ---------------------------------------
    use_tcap, t_cap = pathtracer._tcap_setup(scene, False)
    bounce = functools.partial(
        pathtracer._bounce_step, scene, query.find_nearest, 5, use_tcap, t_cap
    )

    for chunks in (48, 16, 8, 4, 1):
        chunk = r // chunks
        depth_body = pathtracer._make_depth_body(scene, bounce, chunk)

        def f_depth_body(st):
            (st2, rt), _ = jax.lax.scan(
                depth_body, (st, jnp.int32(0)), jnp.arange(1, 2)
            )
            return st2["throughput"].sum() + st2["o"].sum()

        timeit(f"depth_body d1 (sort+scan) chunks={chunks}",
               jax.jit(f_depth_body), state, reps=8)


if __name__ == "__main__":
    main()
