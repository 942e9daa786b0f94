"""Decompose the depth-0 pass (the per-pass fixed cost floor) on the TPU.

Every timed function is wrapped to return ONE scalar (sums computed
on-device inside the jit) and reps are chained back-to-back before a single
readback — non-scalar outputs measure the tunnel's per-call dispatch
latency (3-40 ms) instead of the op (see profile_pt.timeit)."""

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
    """f must return a scalar; reps chained then one readback.  Two passes,
    keep the faster — the first chained measurement of a process reads
    several-fold inflated on the tunneled device (r4 finding)."""
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
    log("setup", info.triangle_count, "tris", n, "rays")

    def raygen(spp_idx):
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
        seeds = rng_mod.pixel_seeds(pixel_ids, spp_idx)
        seeds, jx = rng_mod.random_float(seeds)
        seeds, jy = rng_mod.random_float(seeds)
        rays = cam_mod.full_frame_rays(cam, jitter_x=jx, jitter_y=jy)
        return rays.o, rays.d, seeds

    timeit(
        # reduce ALL outputs (o, d, AND the carried-forward seed state) so
        # XLA cannot dead-code the final seed updates render_pass pays for
        "raygen (seeds+jitter+rays)",
        jax.jit(
            lambda i: (
                sum(jnp.sum(v) for v in raygen(i)[:2])
                + jnp.sum(raygen(i)[2].astype(jnp.float32))
            ).astype(jnp.float32)
        ),
        jnp.uint32(1),
    )

    o, d, seeds = jax.jit(raygen)(jnp.uint32(1))
    jax.block_until_ready((o, d, seeds))

    def ker(sc, o, d, s):
        wf = wavefront_pt.trace(sc, o, d, s, 1, 0, interpret=False)
        return jnp.sum(wf["tp"]) + jnp.sum(wf["tex_idx"]).astype(jnp.float32)

    timeit("wavefront kernel k=1 d0", jax.jit(ker), scene, o, d, seeds)

    wf = jax.jit(
        lambda sc, o, d, s: wavefront_pt.trace(sc, o, d, s, 1, 0, interpret=False)
    )(scene, o, d, seeds)
    jax.block_until_ready(wf)

    packed = scene.atlas.packed
    scale = jnp.float32(1.0 / 255.0)

    def tex_rgb(idx):
        p = packed[jnp.maximum(idx, 0)]
        rgb = jnp.stack(
            [
                ((p >> 16) & 0xFF).astype(jnp.float32),
                ((p >> 8) & 0xFF).astype(jnp.float32),
                (p & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        ) * scale
        return jnp.where((idx >= 0)[..., None], rgb, 1.0)

    def texel_epilogue(idx):
        out = pathtracer._chunked_contrib(
            lambda i: tex_rgb(i) - 1.0, idx >= 0, (idx,), 48
        )
        return jnp.sum(out)

    timeit("texel factor epilogue (48 ch)", jax.jit(texel_epilogue), wf["tex_idx"][:, 0])

    def sky_fn(m, tp, dd):
        return jnp.where(m[..., None], tp, 0.0) * query.sky_color(scene, dd)

    timeit(
        "sky epilogue (48 ch)",
        jax.jit(
            lambda m, tp, dd: jnp.sum(
                pathtracer._chunked_contrib(sky_fn, m, (m, tp, dd), 48)
            )
        ),
        wf["missed"], wf["tp"], wf["d"],
    )

    timeit(
        "sample_radiance depth 0",
        jax.jit(lambda sc, o, d, s: pathtracer.sample_radiance(sc, o, d, s, 0)[0].sum()),
        scene, o, d, seeds,
    )

    for dl in (0, 1, 2, 5):
        timeit(
            f"render_pass depth {dl}",
            jax.jit(
                lambda sc, i, dl=dl: pathtracer.render_pass(
                    sc, cam, i, depth_limit=dl
                )[0].sum()
            ),
            scene, jnp.uint32(1),
        )


if __name__ == "__main__":
    main()
