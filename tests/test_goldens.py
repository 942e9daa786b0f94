"""Committed golden-image regression tests.

Whitted renders are deterministic; the path tracer is deterministic given a
seed.  Goldens are small .npy files regenerated with
`python tests/test_goldens.py --regen` (do so ONLY when an intentional
behavior change lands; document it in the commit message)."""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _render_whitted_cube():
    from cpu_ray_tracer_tpu.core.camera import make_camera
    from cpu_ray_tracer_tpu.render import whitted
    from cpu_ray_tracer_tpu.scene.build import compile_scene
    from tests.conftest import OUR_ASSETS

    scene, _ = compile_scene(
        os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml"), layout="tlas"
    )
    cam = make_camera(48, 32)
    return np.asarray(whitted.render(scene, cam)["image"])


def _render_pt_cube():
    import jax.numpy as jnp

    from cpu_ray_tracer_tpu.core.camera import make_camera
    from cpu_ray_tracer_tpu.render import pathtracer
    from cpu_ray_tracer_tpu.scene.build import compile_scene
    from tests.conftest import OUR_ASSETS

    scene, _ = compile_scene(
        os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml"), layout="tlas"
    )
    cam = make_camera(32, 24)
    img, _ = pathtracer.render_pass(scene, cam, jnp.uint32(11))
    return np.asarray(img)


RENDERS = {
    "whitted_cube_48x32": _render_whitted_cube,
    "pt_cube_seed11_32x24": _render_pt_cube,
}


def _check(name, fn):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    img = fn()
    golden = np.load(path)
    np.testing.assert_allclose(img, golden, atol=2e-3, rtol=1e-3)


def test_whitted_cube_golden():
    _check("whitted_cube_48x32", _render_whitted_cube)


def test_pt_cube_golden():
    _check("pt_cube_seed11_32x24", _render_pt_cube)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import tests.conftest  # noqa: F401  (forces CPU backend)

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in RENDERS.items():
            np.save(os.path.join(GOLDEN_DIR, name + ".npy"), fn())
            print("wrote", name)
