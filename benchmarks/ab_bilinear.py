"""Sweep the bilinear fwd+bwd knobs: diff compaction chunks x tap-scatter
chunks.  One subprocess per config (env read at trace time)."""

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
    from cpu_ray_tracer_tpu.diff import grad as grad_mod
    from cpu_ray_tracer_tpu.render import pathtracer
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, _ = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"),
        layout="tlas", bilinear=True,
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    target = jnp.zeros((720, 1280, 3), jnp.float32)
    params = grad_mod.extract_params(scene, keys=grad_mod.PARAM_KEYS)

    def loss_fn(p, spp):
        s = grad_mod.apply_params(scene, p)
        img, _ = pathtracer.render_pass(s, cam, spp, depth_limit=5, differentiable=True)
        return grad_mod.l2_image_loss(img, target)

    f = jax.jit(
        lambda p, s: sum(jnp.sum(g * g) for g in jax.tree.leaves(jax.grad(loss_fn)(p, s)))
    )
    x = f(params, jnp.uint32(1))
    jax.block_until_ready(x)
    dt = 1e30
    for _ in range(2):
        t = time.time()
        acc = 0.0
        for _ in range(4):
            acc = acc + f(params, jnp.uint32(1))
        float(jnp.asarray(acc))
        dt = min(dt, (time.time() - t) / 4)
    print("RESULT " + json.dumps({"step_ms": round(dt * 1000, 2)}), flush=True)


def main():
    cfgs = [(16, 48), (16, 96), (16, 192), (8, 96), (24, 96), (48, 96)]
    for dc, tc in cfgs:
        env = dict(os.environ)
        env["CRT_COMPACTION_CHUNKS_DIFF"] = str(dc)
        env["CRT_TAP_SCATTER_CHUNKS"] = str(tc)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            env=env, capture_output=True, text=True,
        )
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        print(
            f"diff_chunks={dc} tap_scatter={tc}:",
            res[-1][7:] if res else f"FAILED rc={p.returncode} {p.stderr[-300:]}",
            f"({round(time.time()-t0)}s)",
            flush=True,
        )


if __name__ == "__main__":
    if "--single" in sys.argv:
        single()
    else:
        main()
