"""VERDICT r4 ask #3: decompose the bilinear-over-parity fwd+bwd cost.

r4 measured texture-learning (bilinear) fwd+bwd at 1.94 Mrays/s vs 4.53
for the nearest-parity mode — 2.33x — without a map of where the extra
cost goes.  This chains, at full bench scale (1280x720, depth 5):

  1. forward-only, nearest vs bilinear     -> tap-RECORD build cost
  2. fwd+bwd, nearest, full params         -> the parity reference
  3. fwd+bwd, bilinear, params w/o texels  -> XLA DCEs the atlas scatter,
     isolating the flat-cotangent scatter from everything else
  4. fwd+bwd, bilinear, full params        -> the headline
  5. the 12R-element flat scatter-add alone at realistic occupancy

Run exclusively (one TPU process).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

if os.path.isdir(os.path.join(REPO, ".jax_cache")):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.diff import grad as grad_mod
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene.build import compile_scene

T0 = time.time()
W, H, DEPTH = 1280, 720, 5


def log(*a):
    print(round(time.time() - T0, 1), *a, flush=True)


def timeit(name, f, *args, reps=4):
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
    cam = cam_mod.make_camera(W, H, pos=(0.0, 0.3, -1.2), target=(0.0, -0.1, 2.5))
    target = jnp.zeros((H, W, 3), jnp.float32)

    results = {}
    for mode in ("nearest", "bilinear"):
        scene, info = compile_scene(
            os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"),
            layout="tlas", bilinear=(mode == "bilinear"),
        )

        def loss_fn(params, spp):
            s = grad_mod.apply_params(scene, params)
            img, stats = pathtracer.render_pass(
                s, cam, spp, depth_limit=DEPTH, differentiable=True
            )
            return grad_mod.l2_image_loss(img, target)

        full = grad_mod.extract_params(scene, keys=grad_mod.PARAM_KEYS)
        no_tex = {k: v for k, v in full.items() if k != "texels"}
        log(f"--- {mode}: params {sorted(full)}")

        results[f"{mode}_fwd"] = timeit(
            f"{mode} forward-only (diff path)",
            jax.jit(lambda p, s: loss_fn(p, s)), full, jnp.uint32(1),
        )
        results[f"{mode}_fwdbwd"] = timeit(
            f"{mode} fwd+bwd full params",
            jax.jit(jax.grad(loss_fn).__call__ if False else (
                lambda p, s: sum(jnp.sum(g * g) for g in jax.tree.leaves(jax.grad(loss_fn)(p, s)))
            )),
            full, jnp.uint32(1),
        )
        if mode == "bilinear":
            results["bilinear_fwdbwd_no_texels"] = timeit(
                "bilinear fwd+bwd w/o texels leaf",
                jax.jit(
                    lambda p, s: sum(
                        jnp.sum(g * g) for g in jax.tree.leaves(jax.grad(loss_fn)(p, s))
                    )
                ),
                no_tex, jnp.uint32(1),
            )

    # 5. the flat scatter alone: 12 contributions per textured-bounce lane
    r = W * H
    texels = jnp.zeros((scene.atlas.texels.reshape(-1).shape[0],), jnp.float32)
    rng = np.random.default_rng(0)
    for occ in (1.0, 0.25):
        nz = int(12 * r * occ)
        ids = jnp.asarray(
            rng.integers(0, texels.shape[0], size=nz).astype(np.int32)
        )
        cts = jnp.ones((nz,), jnp.float32)
        timeit(
            f"flat scatter-add {nz/1e6:.1f}M ids (occ {occ})",
            jax.jit(lambda i, c: jnp.zeros_like(texels).at[i].add(c).sum()),
            ids, cts,
        )

    ratio = results["nearest_fwdbwd"] / results["bilinear_fwdbwd"]
    log(f"bilinear/nearest fwd+bwd ratio: {1/ratio:.2f}x")


if __name__ == "__main__":
    main()
