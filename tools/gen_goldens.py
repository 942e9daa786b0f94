"""Generate committed mid-res goldens for upstream scenes (VERDICT #8).

- inside_whitted_160x100.npy : scalar-oracle Whitted render of the upstream
  inside_scene.xml (reference default scene, 2. WhittedStyle/renderer.h:57)
  at 160x100 — an independent check of traversal + integrator at a
  realistic scene scale, not just the 12-tri cube.
- inside_pt_64x40_pass0.npy  : fixed-seed path-tracer pass 0 on the same
  scene, rendered on the CPU backend (regression pin for the estimator;
  regenerate with this script if the estimator intentionally changes).

Run from repo root: python tools/gen_goldens.py   (CPU backend, ~minutes)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene.build import compile_scene

INSIDE_XML = "/root/reference/assets/scenes/inside_scene.xml"
OUT_DIR = os.path.join(REPO, "tests", "goldens")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    scene, info = compile_scene(INSIDE_XML, layout="tlas")
    print(f"inside_scene: {info.triangle_count} tris, {info.object_count} objects", flush=True)

    t0 = time.time()
    from tests.oracle import WhittedOracle

    cam = cam_mod.make_camera(160, 100)
    img = WhittedOracle(scene).render(cam)
    np.save(os.path.join(OUT_DIR, "inside_whitted_160x100.npy"), img)
    print(f"whitted oracle golden in {time.time()-t0:.1f}s, mean={img.mean():.4f}", flush=True)

    t0 = time.time()
    cam_pt = cam_mod.make_camera(64, 40)
    img_pt, stats = pathtracer.render_pass(scene, cam_pt, jnp.uint32(0))
    np.save(os.path.join(OUT_DIR, "inside_pt_64x40_pass0.npy"), np.asarray(img_pt))
    print(
        f"pt pass-0 golden in {time.time()-t0:.1f}s, "
        f"mean={np.asarray(img_pt).mean():.4f} rays={int(np.asarray(stats['rays_traced']))}",
        flush=True,
    )


if __name__ == "__main__":
    main()
