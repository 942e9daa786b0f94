"""In-kernel bounce-wavefront parity (ops/pallas/wavefront_pt.py).

The wavefront kernel runs traverse -> shade -> bounce for leading depths
inside one Pallas program, deferring texture/sky taps exactly (see module
docstring).  These tests pin it against the host XLA bounce pipeline on the
cube scene (textured floor + skydome + quad light — every deferred-tap path
exercised), in interpret mode on the CPU backend.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene.build import compile_scene

from conftest import OUR_ASSETS

W, H = 48, 32


@pytest.fixture(scope="module")
def cube_scene_packed():
    scene, info = compile_scene(
        os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml"),
        layout="tlas",
        use_pallas=True,
    )
    assert scene.packed is not None and scene.packed.node_aabb is not None
    return scene


@pytest.fixture()
def wf_env(monkeypatch):
    def set_env(depths):
        monkeypatch.setenv("CRT_WAVEFRONT", "1")
        monkeypatch.setenv("CRT_WF_DEPTHS", str(depths))

    return set_env


def _host_image(scene, monkeypatch):
    monkeypatch.setenv("CRT_WAVEFRONT", "0")
    cam = cam_mod.make_camera(W, H)
    img, stats = pathtracer.render_pass(scene, cam, jnp.uint32(1))
    return np.asarray(img), int(stats["rays_traced"])


def test_wavefront_prefix_matches_host(cube_scene_packed, wf_env, monkeypatch):
    """K=1 (primary in-kernel, default TPU config): image allclose, exact
    rays_traced parity (the RNG streams and estimator structure are
    identical — only fp op order differs)."""
    scene = cube_scene_packed
    ref, ref_rays = _host_image(scene, monkeypatch)
    wf_env(1)
    cam = cam_mod.make_camera(W, H)
    img, stats = pathtracer.render_pass(scene, cam, jnp.uint32(1))
    assert int(stats["rays_traced"]) == ref_rays
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5, rtol=1e-4)


def test_wavefront_full_depth_matches_host(cube_scene_packed, wf_env, monkeypatch):
    """All six depths in-kernel (no XLA tail at all): exercises the
    multi-depth texel records, the depth cutoff, deferred sky and the
    light-hit termination."""
    scene = cube_scene_packed
    ref, ref_rays = _host_image(scene, monkeypatch)
    wf_env(6)
    cam = cam_mod.make_camera(W, H)
    img, stats = pathtracer.render_pass(scene, cam, jnp.uint32(1))
    assert int(stats["rays_traced"]) == ref_rays
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5, rtol=1e-4)


def test_wavefront_ineligible_scenes_fall_back(monkeypatch):
    """Scenes the kernel cannot serve (no packed BVH) must take the host
    path even when forced on — _use_wavefront gates them out."""
    scene, _ = compile_scene(
        os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml"),
        layout="tlas",
        use_pallas=False,
    )
    monkeypatch.setenv("CRT_WAVEFRONT", "1")
    assert not pathtracer._use_wavefront(scene, False)
    assert not pathtracer._use_wavefront(scene, True)
