"""Fine-grained PT pipeline profiling on the TPU (run exclusively!).

Measures: per-bounce cost slope (depth_limit sweep), sort on/off, shading
component split.  Prints timing lines; JSONL-friendly.
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
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.build import compile_scene

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=8):
    """Chained steady-state timing: N back-to-back calls then one scalar
    readback.  Single-call timing on the tunneled runtime measures
    idle-slow-mode dispatch latency (3-40 ms), not the op.  Two passes,
    keep the faster — the first chained measurement of a process reads
    several-fold inflated on the tunneled device (r4 finding)."""
    x = f(*args)
    jax.block_until_ready(x)
    g = jax.jit(lambda v: v * 1.000001)
    y = jnp.float32(1.0)
    for _ in range(60):
        y = g(y)
    float(y)
    dt = 1e30
    for _ in range(2):
        t = time.time()
        for _ in range(reps):
            x = f(*args)
        float(jnp.asarray(x).sum())
        dt = min(dt, (time.time() - t) / reps)
    log(name, round(dt * 1000, 1), "ms")
    return dt


def main():
    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    log("setup", info.triangle_count, "tris")

    # depth sweep: cost(d) - cost(d-1) = per-bounce marginal cost
    # (scene passed as a jit ARG — closures inline it as constants and
    # compile for minutes)
    times = {}
    for dl in [0, 1, 2, 5]:
        f = jax.jit(
            lambda sc, i, dl=dl: pathtracer.render_pass(sc, cam, i, depth_limit=dl)[0].sum()
        )
        times[dl] = timeit(f"pass depth_limit={dl}", f, scene, jnp.uint32(0))
    for a, b in [(0, 1), (1, 2), (2, 5)]:
        per = (times[b] - times[a]) / (b - a)
        log(f"marginal bounce cost {a}->{b}: {per*1000:.1f} ms")

    # shading split: full shade vs no-gather shade vs sky only
    rays = cam_mod.full_frame_rays(cam)
    o, d = rays.o, rays.d
    res = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d))(scene, o, d)
    jax.block_until_ready(res)

    def shade_full(sc, res, o, d):
        pt = o + res["t"][..., None] * d
        nrm, uv, mid = query.get_hit_info(sc, res, pt, d)
        mf = query.material_fields(sc, mid)
        alb = query.get_albedo(sc, mid, uv)
        sky = query.sky_color(sc, d)
        return (alb + sky + nrm + mf["albedo"]).sum()

    def shade_no_tex(sc, res, o, d):
        pt = o + res["t"][..., None] * d
        nrm, uv, mid = query.get_hit_info(sc, res, pt, d)
        mf = query.material_fields(sc, mid)
        return (nrm + mf["albedo"]).sum()

    def tex_only(sc, res, o, d):
        pt = o + res["t"][..., None] * d
        nrm, uv, mid = query.get_hit_info(sc, res, pt, d)
        return query.get_albedo(sc, mid, uv).sum()

    timeit("shade full", jax.jit(shade_full), scene, res, o, d)
    timeit("shade no-tex (hitinfo+materials)", jax.jit(shade_no_tex), scene, res, o, d)
    timeit("tex albedo only", jax.jit(tex_only), scene, res, o, d)

    # --- kernel-only and glue-only pieces (r2: find the pass's 233ms) ---
    import numpy as np
    from cpu_ray_tracer_tpu.render.pathtracer import (
        _compaction_perm,
        _permute_state,
    )

    ftrav = jax.jit(
        lambda sc, o, d: query.find_nearest(sc, o, d, sort_rays=False)["t"].sum()
    )
    timeit("traverse kernel coherent (no sort)", ftrav, scene, o, d)

    # bounce-like rays: random hemisphere dirs from primary hit points,
    # sorted ONCE outside the timed region -> pure kernel cost on the
    # exact ray population the production bounce traverses
    rng = np.random.default_rng(0)
    hitp = o + res["t"][..., None] * d
    rd = jnp.asarray(rng.normal(size=(o.shape[0], 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    ob, db = hitp + rd * 1e-3, rd
    alive = jnp.ones((o.shape[0],), jnp.bool_)
    perm = jax.jit(_compaction_perm)(scene, ob, db, alive)
    obs, dbs = ob[perm], db[perm]
    jax.block_until_ready((obs, dbs))
    timeit("traverse kernel bounce pre-sorted (no sort)", ftrav, scene, obs, dbs)

    # production resort: key+argsort+ONE packed [R,24] gather
    state = dict(
        o=ob, d=db,
        throughput=jnp.ones_like(ob), lit=jnp.zeros((o.shape[0],), jnp.bool_),
        missed=jnp.zeros((o.shape[0],), jnp.bool_),
        seed=jnp.arange(o.shape[0], dtype=jnp.uint32),
        inside=jnp.zeros((o.shape[0],), jnp.bool_),
        alive=alive,
        traversed=jnp.zeros((o.shape[0],), jnp.int32),
        tested=jnp.zeros((o.shape[0],), jnp.int32),
        pixel=jnp.arange(o.shape[0], dtype=jnp.int32),
        locus=jnp.full((o.shape[0],), -1, jnp.int32),
    )

    def resort(sc, st):
        p = _compaction_perm(sc, st["o"], st["d"], st["alive"])
        return _permute_state(st, p)["o"].sum()

    timeit("production resort (argsort + packed gather)", jax.jit(resort), scene, state)

    def argsort_only(sc, st):
        return _compaction_perm(sc, st["o"], st["d"], st["alive"]).sum()

    timeit("argsort only", jax.jit(argsort_only), scene, state)

    timeit("sky gather only", jax.jit(lambda sc, d: query.sky_color(sc, d).sum()), scene, d)


if __name__ == "__main__":
    main()
