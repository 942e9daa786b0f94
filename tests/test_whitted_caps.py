"""Whitted child-buffer overflow must be impossible to miss (VERDICT r4
weak #4 / ask #5): a child dropped at the capacity silently darkens
mirror/glass pixels, so the DEFAULT fixed-cap path must render every
shipped scene drop-free, and the renderer must report the count.

The reference has no cap at all — its recursion allocates stack frames
(2. WhittedStyle/renderer.cpp:54-72); our wavefront bounds the tree with
static buffers, so the bound needs a guarantee.
"""

import os

import pytest

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import whitted
from cpu_ray_tracer_tpu.scene.build import compile_scene

REF_SCENES = "/root/reference/assets/scenes"
SHIPPED = [
    "base_scene.xml",
    "different_size_scene.xml",
    "inside_scene.xml",
    "uniform_distributed_scene.xml",
]


@pytest.mark.parametrize("xml", SHIPPED)
def test_default_cap_renders_drop_free(xml):
    """All four upstream scenes at the DEFAULT cap_factor: dropped == 0.

    384x240 keeps the level caps above the 8192 floor for the first two
    levels, so the cap FRACTION under test matches full resolution (both
    the child count and the capacity scale with the pixel count)."""
    scene, _ = compile_scene(os.path.join(REF_SCENES, xml), layout="tlas")
    cam = cam_mod.make_camera(384, 240)
    out = whitted.render_jit(scene, cam)
    assert int(out["dropped"]) == 0, (
        f"{xml}: {int(out['dropped'])} children dropped at the default "
        "cap_factor — image is silently darkened"
    )


def test_dropped_is_reported_and_adaptive_recovers():
    """A deliberately starved cap must (a) report a nonzero dropped count
    from the fixed path and (b) be healed by render_adaptive's grow loop
    (dropped == 0 at the returned cap_factor)."""
    scene, _ = compile_scene(
        os.path.join(REF_SCENES, "different_size_scene.xml"), layout="tlas"
    )
    cam = cam_mod.make_camera(128, 80)
    # different_size_scene's material 0 has reflectivity 1.0: primary hits
    # on it emit mirror children.  A cap this small cannot hold them.
    starved = whitted.render_jit(scene, cam, cap_factor=0.001)
    assert int(starved["dropped"]) > 0
    healed = whitted.render_adaptive(scene, cam, cap_factor=0.001)
    assert int(healed["dropped"]) == 0
    assert healed["cap_factor"] > 0.001
