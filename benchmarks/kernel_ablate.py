"""Chained kernel-only ablation: binary packet vs wide kernel, coherent vs
incoherent rays.  Env knobs (CRT_PACKET_TILE/GROUPS/UNROLL, CRT_SMEM_NODES,
CRT_WIDE) are read at import, so each config runs as a subprocess from the
sweep driver below when invoked with --sweep; single-config mode otherwise.

Run exclusively (one TPU process at a time).
"""

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
    from cpu_ray_tracer_tpu.scene import query
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    r = cam.width * cam.height
    rays = cam_mod.full_frame_rays(cam)
    o, d = rays.o, rays.d

    # incoherent set: shuffle ray order (bounce-like: mixed octants per tile)
    import numpy as np

    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r))
    oi, di = o[perm], d[perm]

    # bounce-like origins: surface points with random hemisphere directions
    res0 = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d))(scene, o, d)
    jax.block_until_ready(res0)
    hitp = o + res0["t"][..., None] * d
    rd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    ob, db = hitp + rd * 1e-3, rd

    f = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d)["t"].sum())

    def warm():
        x = jnp.float32(1.0)
        g = jax.jit(lambda v: v * 1.000001)
        for _ in range(60):
            x = g(x)
        x.block_until_ready()

    def chain(o_, d_, n=10):
        out = f(scene, o_, d_)
        jax.block_until_ready(out)
        warm()
        t = time.time()
        for _ in range(n):
            out = f(scene, o_, d_)
        jax.block_until_ready(out)
        return (time.time() - t) / n

    cfg = {k: os.environ.get(k, "") for k in (
        "CRT_PACKET_TILE", "CRT_PACKET_GROUPS", "CRT_PACKET_UNROLL",
        "CRT_SMEM_NODES", "CRT_WIDE")}
    out = dict(cfg=cfg,
               coherent_ms=round(chain(o, d) * 1000, 2),
               shuffled_ms=round(chain(oi, di) * 1000, 2),
               bounce_ms=round(chain(ob, db) * 1000, 2))
    print(json.dumps(out), flush=True)


def sweep():
    cfgs = [
        # {} (default) and SMEM=0 measured 2026-08-17: default 9.15/114/72 ms,
        # SMEM=0 14.9/137/86 ms (coherent/shuffled/bounce)
        {"CRT_PACKET_GROUPS": "2"},
        {"CRT_PACKET_GROUPS": "4"},
        {"CRT_PACKET_GROUPS": "8"},
        {"CRT_PACKET_TILE": "4096"},
        {"CRT_PACKET_TILE": "16384"},
        {"CRT_PACKET_TILE": "4096", "CRT_PACKET_GROUPS": "2"},
        {"CRT_WIDE": "1"},
        {"CRT_WIDE": "1", "CRT_PACKET_TILE": "4096"},
    ]
    for c in cfgs:
        env = dict(os.environ, **c)
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
        p = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True,
            timeout=900,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        print(json.dumps(c), "->", line[-1] if line else f"FAIL rc={p.returncode} {p.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    else:
        single()
