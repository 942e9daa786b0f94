"""VERDICT r4 ask #2: re-try the union-shrinking levers on SORTED bounce
tiles with the 15-lane state — bounce-depth TILE sweep x cursor GROUPS.

CRT_PACKET_TILE/CRT_PACKET_GROUPS only configure the host packet kernel,
which since r4 serves ONLY the bounce depths of the PT pipeline (the
primary runs in wavefront_pt with its own CRT_WF_TILE), so this sweep is
exactly the "bounce-only tile size" experiment.  One subprocess per config
(env is read at import).
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
    for dl in (1, 5):
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
    cfgs = [(4096, 1), (2048, 1), (1024, 1), (4096, 2), (2048, 2)]
    for tile, groups in cfgs:
        env = dict(os.environ)
        env["CRT_PACKET_TILE"] = str(tile)
        env["CRT_PACKET_GROUPS"] = str(groups)
        env.setdefault("CRT_FUSED_TAIL", "0")
        env.setdefault("CRT_D1_TIER", "0")
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            env=env, capture_output=True, text=True,
        )
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        print(
            f"tile={tile} groups={groups}:",
            res[-1][7:] if res else f"FAILED rc={p.returncode} {p.stderr[-300:]}",
            f"({round(time.time()-t0)}s)",
            flush=True,
        )


if __name__ == "__main__":
    if "--single" in sys.argv:
        single()
    else:
        main()
