"""Raw traversal-kernel microbenchmark: binary packet kernel vs wide kernel.

Measures ONLY find_nearest-style traversal (no shading) on primary and
bounce-like (shuffled) ray distributions, with proper warmup — unlike frame
benchmarks this isolates the kernel the round-2 work targets.

Usage:  python benchmarks/kernel_speed.py [--rays N] [--iters K]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=921600)  # 1280x720
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scene", default=os.path.join(REPO, "assets/scenes/bunny_teapot.xml"))
    ap.add_argument("--kernels", default="wide,binary")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.path.isdir(os.path.join(REPO, ".jax_cache")):
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    from cpu_ray_tracer_tpu.core import camera as cam_mod
    from cpu_ray_tracer_tpu.ops.pallas import packet_bvh, wide_bvh
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(args.scene, layout="tlas")
    w = 1280
    h = args.rays // w
    camera = cam_mod.make_camera(w, h, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    rays = cam_mod.full_frame_rays(camera)
    o, d = rays.o, rays.d
    r = o.shape[0]
    t0 = jnp.full((r,), 1e30, jnp.float32)
    print(
        f"scene {info.triangle_count} tris; rays {r}; "
        f"wide nodes {scene.packed_wide.num_wide if scene.packed_wide is not None else 0}; "
        f"binary nodes {scene.packed.num_nodes}",
        file=sys.stderr,
    )

    # bounce-like distribution: shuffled origins at hit points, random dirs
    key = jax.random.PRNGKey(0)
    db = jax.random.normal(key, (r, 3))
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    ob = o + 2.0 * d  # points inside the scene-ish

    def timed(fn, *a):
        # chained steady-state timing: per-call block_until_ready measures
        # the tunnel's dispatch latency (tens of ms), not the kernel — chain
        # scalar-returning calls and read back ONCE (see profile_d0.timeit).
        # TWO passes, keep the second: the first chained measurement of a
        # process reads ~6x inflated on this tunneled device (r4 finding —
        # a whole kernel rewrite was nearly misjudged from it).
        f = jax.jit(lambda *aa: fn(*aa)["t"].sum())
        acc = f(*a)
        jax.block_until_ready(acc)
        dt = 1e30
        for _ in range(2):
            t1 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(args.iters):
                acc = acc + f(*a)
            float(acc)
            dt = min(dt, (time.perf_counter() - t1) / args.iters)
        return dt

    results = {}
    kernels = args.kernels.split(",")
    for name in kernels:
        if name == "wide":
            if scene.packed_wide is None:
                continue
            trav, pk = wide_bvh.traverse, scene.packed_wide
            trav_s = wide_bvh.traverse_sorted
        else:
            trav, pk = packet_bvh.traverse, scene.packed
            trav_s = packet_bvh.traverse_sorted
        dt_p = timed(trav, pk, scene.tris, o, d, t0)
        dt_b = timed(trav_s, pk, scene.tris, ob, db, t0)
        results[name] = dict(
            primary_mrays=r / dt_p / 1e6,
            bounce_sorted_mrays=r / dt_b / 1e6,
        )
        print(f"{name}: primary {r/dt_p/1e6:.2f} Mrays/s  bounce(sorted) {r/dt_b/1e6:.2f} Mrays/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
