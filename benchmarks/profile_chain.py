"""Chained PT profiling — immune to the per-blocked-call sync artifact.

Each measured fn is launched N times back-to-back, blocking ONCE on the last
output; cost = total/N.  Calls serialize on the device execution queue, so no
explicit data dependency is needed.  See memory: blocked single calls on this
tunneled TPU pay a ~30ms fixed sync that corrupts per-call timing; also warm
up with rapid trivial calls to exit idle slow-mode.

Run exclusively (one TPU process at a time).
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
from cpu_ray_tracer_tpu.scene.build import compile_scene

T0 = time.time()


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def warm_device(n=60):
    """Rapid trivial calls to exit idle slow-mode before timing."""
    x = jnp.float32(1.0)
    f = jax.jit(lambda v: v * 1.000001)
    for _ in range(n):
        x = f(x)
    x.block_until_ready()


def chain(name, f, n=10):
    """f: () -> device output.  Launch n back-to-back, block once."""
    out = f()
    jax.block_until_ready(out)  # compile
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
    log("setup", info.triangle_count, "tris")

    # ---- depth sweep ----
    times = {}
    for dl in [0, 1, 2, 3, 5]:
        f = jax.jit(
            lambda sc, i, dl=dl: (
                pathtracer.render_pass(sc, cam, i, depth_limit=dl)[0].sum()
            )
        )
        times[dl] = chain(f"pass dl={dl}", lambda f=f: f(scene, jnp.uint32(1)))
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 5)]:
        per = (times[b] - times[a]) / (b - a)
        log(f"marginal depth cost {a}->{b}: {per*1000:.1f} ms")

    # ---- isolated sort + permute at full width ----
    r = cam.width * cam.height
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (r, 3))
    d = jax.random.normal(key, (r, 3))
    alive = jnp.ones((r,), jnp.bool_)
    state = dict(
        o=o, d=d, seed=jnp.arange(r, dtype=jnp.uint32),
        throughput=jnp.ones((r, 3)), lit=jnp.zeros((r,), jnp.bool_),
        inside=jnp.zeros((r,), jnp.bool_), alive=alive,
        traversed=jnp.zeros((r,), jnp.int32), tested=jnp.zeros((r,), jnp.int32),
        missed=jnp.zeros((r,), jnp.bool_), pixel=jnp.arange(r, dtype=jnp.int32),
        locus=jnp.full((r,), -1, jnp.int32),
    )

    sortf = jax.jit(lambda sc, o, d, a: pathtracer._compaction_perm(sc, o, d, a))
    chain("compaction argsort", lambda: sortf(scene, o, d, alive))

    perm = sortf(scene, o, d, alive)
    jax.block_until_ready(perm)
    permf = jax.jit(lambda st, p: pathtracer._permute_state(st, p))
    chain("permute_state gather", lambda: permf(state, perm))

    # ---- bench-style pass (film accumulate, chained like bench.py) ----
    @jax.jit
    def one_pass(sc, film, i):
        img, st = pathtracer.render_pass(sc, cam, i)
        return film + img, i + 1

    film0 = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    fp = one_pass(scene, film0, jnp.uint32(0))
    jax.block_until_ready(fp)
    warm_device()
    t = time.time()
    film, i = film0, jnp.uint32(0)
    for _ in range(16):
        film, i = one_pass(scene, film, i)
    jax.block_until_ready(film)
    log("bench-style pass", round((time.time() - t) / 16 * 1000, 2), "ms")


if __name__ == "__main__":
    main()
