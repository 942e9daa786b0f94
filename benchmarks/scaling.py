"""Scaling-efficiency benchmark: rays/s with 1..N devices on the sharded
path-trace step (BASELINE target: >= 80% efficiency to >= 2 hosts).

On a single-chip machine run with the virtual CPU mesh to validate the
sharded program; on a pod slice the same code measures real ICI scaling:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --cpu --devices 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--passes", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from cpu_ray_tracer_tpu.core.camera import make_camera
    from cpu_ray_tracer_tpu.parallel.mesh import make_mesh, replicate_scene
    from cpu_ray_tracer_tpu.parallel.sharded import sharded_render_pass
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    base_scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    results = {}
    for n_dev in [int(x) for x in args.devices.split(",")]:
        if n_dev > len(jax.devices()):
            continue
        width = args.width - (args.width % n_dev or n_dev) + n_dev * (args.width % n_dev > 0)
        width = (args.width // n_dev) * n_dev
        cam = make_camera(width, args.height)
        mesh = make_mesh(n_dev)
        scene = replicate_scene(base_scene, mesh)
        run = sharded_render_pass(scene, cam, mesh)
        run(jnp.uint32(0)).block_until_ready()  # compile
        t0 = time.perf_counter()
        for p in range(args.passes):
            out = run(jnp.uint32(p + 1))
        out.block_until_ready()
        dt = time.perf_counter() - t0
        prim_rays = width * args.height * args.passes
        rays_s = prim_rays / dt
        results[n_dev] = rays_s
        eff = rays_s / (results[1] * n_dev) if 1 in results else 1.0
        print(
            json.dumps(
                dict(devices=n_dev, primary_rays_s=rays_s, seconds=dt, efficiency=eff)
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
