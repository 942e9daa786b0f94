"""Per-scene gap decomposition (VERDICT r3 ask #6): why do the upstream-
shaped scenes (config 4 tower/wok, config 2 teapot Whitted) run several
times slower than the bunny_teapot headline scene?

For each scene: structural facts (tris, packed nodes, SMEM path, wavefront
kernel eligibility + the first failing gate), per-depth live fractions and
traversal counters, and chained timings of the traverse / shade / pass
pieces.  JSONL to stdout.

Usage: python benchmarks/profile_scene.py [--scenes bunny,inside,teapot]
"""

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

if os.path.isdir(os.path.join(REPO, ".jax_cache")):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.core import rng as rng_mod
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene


def timeit(f, *a, reps=6):
    x = f(*a)
    jax.block_until_ready(x)
    dt = 1e30
    for _ in range(2):
        t1 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            acc = acc + f(*a)
        float(acc)
        dt = min(dt, (time.time() - t1) / reps)
    return dt * 1000


def wavefront_gate(scene):
    """First gate of pathtracer._use_wavefront that fails, or 'eligible'."""
    pk = getattr(scene, "packed", None)
    if not getattr(scene, "use_pallas", False):
        return "no pallas"
    if pk is None or pk.node_aabb is None:
        return "no SMEM node tables (scene too big for the 480KB budget)"
    if pk.tri_shade_rows is None or not pk.meta_in_shade:
        return "no fused meta-in-shade rows (ids exceed 20/6/5-bit fields)"
    if getattr(scene, "shared", None) is not None:
        return "shared-instancing mode"
    if scene.packed_wide is not None:
        return "wide-kernel experiment active"
    if scene.bilinear or not (scene.has_light and scene.has_floor):
        return "bilinear or missing light/floor"
    if int(scene.materials.albedo.shape[0]) > 16:
        return f"material table {int(scene.materials.albedo.shape[0])} > 16"
    atlas = scene.atlas
    if atlas.packed is None:
        return "no packed atlas"
    if int(atlas.packed.shape[0]) >= (1 << 31):
        return f"atlas {int(atlas.packed.shape[0])} texels >= 2^31"
    return "eligible"


SCENES = {
    "bunny": (
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"),
        dict(pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5)),
    ),
    "inside": (
        "/root/reference/assets/scenes/inside_scene.xml",
        dict(pos=(0, 1.0, -3.0), target=(0, 0.5, 2.0)),
    ),
    "uniform": (
        "/root/reference/assets/scenes/uniform_distributed_scene.xml",
        dict(pos=(0, 1.0, -3.0), target=(0, 0.5, 2.0)),
    ),
}


def profile(name, xml, camkw):
    scene, info = compile_scene(xml, layout="tlas")
    cam = cam_mod.make_camera(1280, 720, **camkw)
    n = cam.width * cam.height
    pk = scene.packed
    rec = dict(
        scene=name,
        tris=info.triangle_count,
        packed_nodes=pk.num_nodes if pk is not None else None,
        smem_nodes=bool(pk is not None and pk.node_aabb is not None
                        and pk.num_nodes * 96 <= 480 * 1024),
        stack_walk=bool(pk is not None and pk.node_nearfar is not None),
        atlas_texels=int(scene.atlas.packed.shape[0]),
        materials=int(scene.materials.albedo.shape[0]),
        wavefront=wavefront_gate(scene),
    )

    # primary rays + per-depth live/steps/tested via manual bounce steps
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    seeds = rng_mod.pixel_seeds(pixel_ids, jnp.uint32(1))
    seeds, jx = rng_mod.random_float(seeds)
    seeds, jy = rng_mod.random_float(seeds)
    rays = cam_mod.full_frame_rays(cam, jitter_x=jx, jitter_y=jy)
    state = dict(
        o=rays.o, d=rays.d, seed=seeds,
        throughput=jnp.ones((n, 3), jnp.float32),
        lit=jnp.zeros((n,), jnp.bool_),
        inside=jnp.zeros((n,), jnp.bool_), alive=jnp.ones((n,), jnp.bool_),
        missed=jnp.zeros((n,), jnp.bool_),
        traversed=jnp.zeros((n,), jnp.int32), tested=jnp.zeros((n,), jnp.int32),
        pixel=jnp.arange(n, dtype=jnp.int32), locus=jnp.full((n,), -1, jnp.int32),
    )
    bounce = functools.partial(
        pathtracer._bounce_step, scene, query.find_nearest, 5, False, None
    )
    step = jax.jit(lambda s, d: bounce(d, s))
    live, steps_m, tested_m = [], [], []
    prev_tr, prev_te = 0.0, 0.0
    for depth in range(4):
        state = step(state, jnp.int32(depth))
        jax.block_until_ready(state["alive"])
        live.append(round(float(jnp.mean(state["alive"].astype(jnp.float32))), 4))
        tr = float(jnp.sum(state["traversed"].astype(jnp.float64)))
        te = float(jnp.sum(state["tested"].astype(jnp.float64)))
        steps_m.append(round((tr - prev_tr) / n, 1))
        tested_m.append(round((te - prev_te) / n, 1))
        prev_tr, prev_te = tr, te
    rec["live_after_depth"] = live
    rec["steps_per_ray_by_depth"] = steps_m
    rec["tested_per_ray_by_depth"] = tested_m

    # chained piece timings
    o, d = rays.o, rays.d
    ftrav = jax.jit(lambda o, d: query.find_nearest(scene, o, d)["t"].sum())
    _ = timeit(ftrav, o, d)  # discard first-in-process inflation
    rec["primary_traverse_ms"] = round(timeit(ftrav, o, d), 2)
    res = jax.jit(lambda o, d: query.find_nearest(scene, o, d))(o, d)
    jax.block_until_ready(res)

    def shade(o, d):
        pt = o + res["t"][..., None] * d
        nrm, uv, mid = query.get_hit_info(scene, res, pt, d)
        mf = query.material_fields(scene, mid)
        alb = query.get_albedo(scene, mid, uv, obj=res["obj_idx"], point=pt, fields=mf)
        return (alb + nrm).sum()

    rec["shade_full_ms"] = round(timeit(jax.jit(shade), o, d), 2)
    rec["sky_ms"] = round(
        timeit(jax.jit(lambda d: query.sky_color(scene, d).sum()), d), 2
    )

    fpass = jax.jit(
        lambda sc, i: pathtracer.render_pass(sc, cam, i, depth_limit=5)[0].sum()
    )
    rec["pass_ms"] = round(timeit(fpass, scene, jnp.uint32(1)), 1)
    rec["mrays_s_1spp"] = round(n * 1e-3 / rec["pass_ms"], 2)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="bunny,inside")
    ap.add_argument("--out", default="", help="also append JSONL rows here")
    args = ap.parse_args()
    recs = []
    for name in args.scenes.split(","):
        xml, camkw = SCENES[name]
        if not os.path.isfile(xml):
            print(json.dumps({"scene": name, "skipped": "xml missing"}), flush=True)
            continue
        recs.append(profile(name, xml, camkw))
    if args.out:
        with open(args.out, "w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
