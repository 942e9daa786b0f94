"""Probe the axon-tunnel per-call dispatch overhead.

Round-2 mystery: after compile_scene runs, every device call in the process
appears to cost ~30ms (block_until_ready round-trip), independent of work.
This probe answers, in ONE process with interleaved measurements:

  A. trivial jit call latency, fresh process
  B. does a chain of N data-independent calls pipeline (block once at end)?
  C. does a chain of N data-DEPENDENT calls pipeline?
  D. same three after compile_scene (the "poison" test)
  E. poison bisection: many small live device arrays vs ctypes .so load

Usage: python benchmarks/overhead_probe.py [--stage all|pre|poison]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_call(fn, x, iters=20):
    """Median per-call latency, block each call."""
    y = fn(x)
    y.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        y = fn(x)
        y.block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_chain(fn, x, n=16, iters=5):
    """Wall time for n chained dependent calls, block once."""
    y = x
    for _ in range(n):
        y = fn(y)
    y.block_until_ready()
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / n


def bench_indep(fn, xs, iters=5):
    """Wall time for len(xs) independent calls, block once at end."""
    ys = [fn(x) for x in xs]
    for y in ys:
        y.block_until_ready()
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        ys = [fn(x) for x in xs]
        ys[-1].block_until_ready()
        for y in ys:
            y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / len(xs)


def report(tag, val_ms):
    print(f"{tag}: {val_ms*1e3:.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.path.isdir(os.path.join(REPO, ".jax_cache")):
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    print(f"devices: {jax.devices()}", flush=True)

    trivial = jax.jit(lambda x: x * 1.0003 + 0.1)
    x = jnp.ones((8, 128), jnp.float32)
    xs = [jnp.full((8, 128), float(i), jnp.float32) for i in range(16)]

    def suite(tag):
        report(f"{tag}/trivial_blocked", bench_call(trivial, x))
        report(f"{tag}/trivial_chain16", bench_chain(trivial, x, 16))
        report(f"{tag}/trivial_indep16", bench_indep(trivial, xs))

    suite("fresh")

    # a moderately-sized pallas call for comparison
    from cpu_ray_tracer_tpu.ops.pallas import packet_bvh  # noqa: F401  (import only)

    # --- poison bisection -------------------------------------------------
    # candidate 1: many small live device arrays
    small = [jnp.full((4, 4), float(i)) for i in range(200)]
    suite("after_200_small_arrays")
    del small
    suite("after_del_small_arrays")

    # candidate 2: ctypes native lib load + call
    import numpy as np

    from cpu_ray_tracer_tpu.accel import bvh_builder

    tri = np.random.RandomState(0).rand(300, 3, 3).astype(np.float32)
    nodes = bvh_builder.build_bvh(tri.reshape(300, 9))
    print(f"native build ok: {type(nodes)}", flush=True)
    suite("after_native_build")

    # candidate 3: full compile_scene
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(
        os.path.join(REPO, "assets/scenes/bunny_teapot.xml"), layout="tlas"
    )
    print(f"scene tris={info.triangle_count}", flush=True)
    suite("after_compile_scene")

    # does the real traversal kernel pipeline? independent calls, block at end
    from cpu_ray_tracer_tpu.core import camera as cam_mod

    camera = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    rays = cam_mod.full_frame_rays(camera)
    o, d = rays.o, rays.d
    t0 = jnp.full((o.shape[0],), 1e30, jnp.float32)

    def trav(oo):
        return packet_bvh.traverse(scene.packed, scene.tris, oo, d, t0)["t"]

    y = trav(o)
    y.block_until_ready()
    # blocked per call
    ts = []
    for _ in range(8):
        t1 = time.perf_counter()
        trav(o).block_until_ready()
        ts.append(time.perf_counter() - t1)
    ts.sort()
    report("traverse/blocked_per_call", ts[len(ts) // 2])
    # 8 independent calls, block at end
    best = 1e30
    os_ = [o + 0.001 * i for i in range(8)]
    for _ in range(3):
        t1 = time.perf_counter()
        ys = [trav(oo) for oo in os_]
        for yy in ys:
            yy.block_until_ready()
        best = min(best, time.perf_counter() - t1)
    report("traverse/indep8_per_call", best / 8)

    suite("end")


if __name__ == "__main__":
    main()
