"""Fused Whitted level-0 kernel (ops/pallas/whitted_wf.py) parity: the
whole-frame image through the kernel path (CRT_WHITTED_WF=1, interpret
mode) must match the host _shade_level path on scenes covering every
branch: diffuse+shadow (cube), textured floor + skydome (all), mirror
children (different_size), and instanced/tlas geometry."""

import os

import numpy as np
import pytest

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import whitted
from cpu_ray_tracer_tpu.scene.build import compile_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SCENES = "/root/reference/assets/scenes"

CASES = [
    (os.path.join(REPO, "assets", "scenes", "cube_scene.xml"), "mono"),
    (os.path.join(REF_SCENES, "different_size_scene.xml"), "tlas"),
    # bunny_teapot's teapot is a dielectric (refractivity 0.9): covers the
    # emit2/Fresnel/inside-flip/absorption branches
    (os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), "tlas"),
]


@pytest.mark.parametrize(
    "xml,layout", CASES, ids=["cube-mono", "mirror-tlas", "dielectric-tlas"]
)
def test_kernel_level0_matches_host(xml, layout, monkeypatch):
    scene, _ = compile_scene(xml, layout=layout, use_pallas=True)
    # irregular camera: Whitted primary rays are unjittered, and an
    # axis-aligned view of the axis-aligned floor lands pixel centers
    # EXACTLY on texel boundaries, where one ULP of FMA-contraction
    # difference between the kernel's and the host's `o + t*d` flips the
    # truncated texel index (both results are valid roundings of the same
    # math; the reference's own FP choices are equally arbitrary there).
    # An incommensurate camera keeps hit points off exact n/512 ties so
    # the comparison tests the LOGIC, not the compiler's FMA choices.
    cam = cam_mod.make_camera(
        96, 64, pos=(0.0137, 0.271, -1.973), target=(0.031, -0.117, 2.531)
    )

    monkeypatch.setenv("CRT_WHITTED_WF", "0")
    host = whitted.render(scene, cam, depth_limit=2)

    monkeypatch.setenv("CRT_WHITTED_WF", "1")
    kern = whitted.render(scene, cam, depth_limit=2)

    host_img = np.asarray(host["image"])
    kern_img = np.asarray(kern["image"])
    np.testing.assert_allclose(kern_img, host_img, atol=2e-5, rtol=1e-4)
    # primary traversal effort must be reported (nonzero where geometry is)
    assert int(np.asarray(kern["traversed"]).sum()) > 0
