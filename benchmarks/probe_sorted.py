"""Union-size + timing probe for SORTED bounce rays (the regime the PT
bench actually runs after Morton+octant compaction).

For each config (tile size x cursor groups) measures, on bounce-like rays
after the production sort:
  - wall ms per traverse call,
  - mean/p95 per-ray `traversed` (== the owning tile's node-step count,
    since every live lane increments once per tile step) -> the packet
    union size, the quantity that decides whether smaller packets are worth
    more scalar chains (sublane-wide kernel design question).

Run exclusively (one TPU process).  Each config is a subprocess (env knobs
read at import).
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
    import numpy as np

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

    rng = np.random.default_rng(0)
    res0 = jax.jit(lambda sc, o, d: query.find_nearest(sc, o, d))(scene, o, d)
    jax.block_until_ready(res0)
    hitp = o + res0["t"][..., None] * d
    rd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    ob, db = hitp + rd * 1e-3, rd
    # shuffle so the sort does all the work (matches bounce state order)
    perm = jnp.asarray(rng.permutation(r))
    ob, db = ob[perm], db[perm]

    # the production path: sorted traversal (scene.use_pallas is True on TPU)
    f = jax.jit(
        lambda sc, o, d: query.find_nearest(sc, o, d, sort_rays=True)["t"].sum()
    )
    fstats = jax.jit(
        lambda sc, o, d: (
            lambda res: (
                jnp.mean(res["traversed"].astype(jnp.float32)),
                jnp.percentile(res["traversed"].astype(jnp.float32), 95),
                jnp.mean(res["tested"].astype(jnp.float32)),
            )
        )(query.find_nearest(sc, o, d, sort_rays=True))
    )

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

    ms = chain(ob, db) * 1000
    mean_tr, p95_tr, mean_te = jax.device_get(fstats(scene, ob, db))
    ms_coh = chain(o, d) * 1000
    mean_c, p95_c, mean_te_c = jax.device_get(fstats(scene, o, d))

    cfg = {k: os.environ.get(k, "") for k in (
        "CRT_PACKET_TILE", "CRT_PACKET_GROUPS", "CRT_PACKET_UNROLL",
        "CRT_SMEM_NODES", "CRT_WIDE", "CRT_SORT_DIRBITS")}
    print(json.dumps(dict(
        cfg=cfg,
        sorted_bounce_ms=round(float(ms), 2),
        bounce_steps_mean=round(float(mean_tr), 1),
        bounce_steps_p95=round(float(p95_tr), 1),
        bounce_tested_mean=round(float(mean_te), 1),
        coherent_ms=round(float(ms_coh), 2),
        coherent_steps_mean=round(float(mean_c), 1),
        coherent_tested_mean=round(float(mean_te_c), 1),
    )), flush=True)


def sweep():
    cfgs = [
        {"CRT_WIDE": "1"},  # r4 SMEM-table wide kernel
        {},  # binary packet kernel, TILE 4096 default
        {"CRT_PACKET_GROUPS": "2"},
        {"CRT_PACKET_GROUPS": "4"},
        {"CRT_PACKET_GROUPS": "8"},
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
