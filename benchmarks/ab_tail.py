"""A/B the r5 tail restructure pieces via env gates, one subprocess per
config (env read at import/trace time).

Configs: fused deep tail on/off x depth-1 tier on/off, timing
render_pass at depth 1, 2 and 5 on the headline scene.
"""

import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def single():
    import jax
    import jax.numpy as jnp

    if os.path.isdir(os.path.join(REPO, ".jax_cache")):
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    from cpu_ray_tracer_tpu.core import camera as cam_mod
    from cpu_ray_tracer_tpu.render import pathtracer
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))

    out = {}
    for dl in (1, 2, 5):
        f = jax.jit(
            lambda sc, i, dl=dl: pathtracer.render_pass(sc, cam, i, depth_limit=dl)[0].sum()
        )
        x = f(scene, jnp.uint32(1))
        jax.block_until_ready(x)
        dt = 1e30
        for _ in range(2):
            t = time.time()
            acc = 0.0
            for _ in range(10):
                acc = acc + f(scene, jnp.uint32(1))
            float(jnp.asarray(acc))
            dt = min(dt, (time.time() - t) / 10)
        out[f"d{dl}_ms"] = round(dt * 1000, 2)
    print("RESULT " + json.dumps(out), flush=True)


def main():
    for fused, d1tier in itertools.product(("1", "0"), ("1", "0")):
        env = dict(os.environ)
        env["CRT_FUSED_TAIL"] = fused
        env["CRT_D1_TIER"] = d1tier
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            env=env, capture_output=True, text=True,
        )
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        print(
            f"fused={fused} d1tier={d1tier}:",
            res[-1][7:] if res else f"FAILED rc={p.returncode} {p.stderr[-300:]}",
            f"({round(time.time()-t0)}s)",
            flush=True,
        )


if __name__ == "__main__":
    if "--single" in sys.argv:
        single()
    else:
        main()
