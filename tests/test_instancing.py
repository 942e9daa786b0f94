"""Shared-BLAS object-space instancing (instancing="shared"): per-instance
ray transforms against unique-mesh BLASes, the reference's
BLASBVH::Intersect semantics (blas_bvh.cpp:376-389) — vs the default
world-baked fused forest (instancing="baked")."""

import copy
import os

import jax
import numpy as np
import pytest

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.io.scene_xml import load_scene_xml
from cpu_ray_tracer_tpu.render import whitted
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.animate import AnimatedScene, update_shared_transforms
from cpu_ray_tracer_tpu.scene.build import compile_scene

from tests.conftest import OUR_ASSETS

CUBE_XML = os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml")
BENCH_XML = os.path.join(OUR_ASSETS, "scenes", "bunny_teapot.xml")


def dup_spec(xml, n_copies=3, offset=(1.5, 0.0, 0.0)):
    """Spec with the first object duplicated at shifted positions — N
    instances of ONE mesh."""
    spec = load_scene_xml(xml)
    base = spec.objects[0]
    for c in range(1, n_copies):
        o = copy.deepcopy(base)
        o.position = base.position + np.asarray(offset, np.float32) * c
        spec.objects.append(o)
    return spec


@pytest.fixture(scope="module")
def pair():
    spec = dup_spec(CUBE_XML)
    shared = compile_scene(spec=spec, layout="tlas", instancing="shared")
    baked = compile_scene(spec=spec, layout="tlas", instancing="baked")
    return shared, baked


class TestSharedInstancing:
    def test_one_blas_per_unique_mesh(self, pair):
        (scene, info), _ = pair
        sh = scene.shared
        assert sh is not None
        assert len(set(sh.inst_mesh)) == 1  # 3 instances, 1 unique mesh
        assert len(sh.bvhs) == 1
        # pool holds the mesh ONCE; the scene still reports instanced counts
        assert scene.tris.v0.shape[0] * 3 == info.triangle_count

    def test_find_nearest_matches_baked(self, pair):
        (s_sh, _), (s_bk, _) = pair
        cam = cam_mod.make_camera(48, 30)
        rays = cam_mod.full_frame_rays(cam)
        a = jax.jit(query.find_nearest)(s_sh, rays.o, rays.d)
        b = jax.jit(query.find_nearest)(s_bk, rays.o, rays.d)
        hit_a = np.asarray(a["obj_idx"]) >= 2
        hit_b = np.asarray(b["obj_idx"]) >= 2
        # identical hit sets up to fp-borderline pixels
        assert (hit_a != hit_b).mean() < 0.01
        both = hit_a & hit_b
        np.testing.assert_allclose(
            np.asarray(a["t"])[both], np.asarray(b["t"])[both], rtol=1e-4, atol=1e-4
        )
        assert (np.asarray(a["obj_idx"])[both] == np.asarray(b["obj_idx"])[both]).all()

    def test_occlusion_matches_baked(self, pair):
        (s_sh, _), (s_bk, _) = pair
        cam = cam_mod.make_camera(32, 20)
        rays = cam_mod.full_frame_rays(cam)
        dist = np.full(rays.o.shape[0], 10.0, np.float32)
        a = np.asarray(jax.jit(query.is_occluded)(s_sh, rays.o, rays.d, dist))
        b = np.asarray(jax.jit(query.is_occluded)(s_bk, rays.o, rays.d, dist))
        assert (a != b).mean() < 0.01

    def test_whitted_image_matches_baked(self, pair):
        (s_sh, _), (s_bk, _) = pair
        cam = cam_mod.make_camera(48, 30)
        img_a = np.asarray(whitted.render(s_sh, cam)["image"])
        img_b = np.asarray(whitted.render(s_bk, cam)["image"])
        # fp-borderline pixels may flip; the images must agree almost
        # everywhere and closely where they agree
        diff = np.abs(img_a - img_b).max(axis=-1)
        assert (diff > 0.02).mean() < 0.01

    def test_pallas_interpret_matches_xla(self):
        spec = dup_spec(CUBE_XML, n_copies=2)
        s_pk, _ = compile_scene(
            spec=spec, layout="tlas", instancing="shared", use_pallas=True
        )
        s_xla, _ = compile_scene(
            spec=spec, layout="tlas", instancing="shared", use_pallas=False
        )
        assert s_pk.shared.packs is not None
        cam = cam_mod.make_camera(24, 16)
        rays = cam_mod.full_frame_rays(cam)
        a = query.find_nearest(s_pk, rays.o, rays.d)
        b = query.find_nearest(s_xla, rays.o, rays.d)
        np.testing.assert_allclose(
            np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-5, atol=1e-5
        )
        assert (np.asarray(a["obj_idx"]) == np.asarray(b["obj_idx"])).all()

    def test_transform_update_is_o1_and_exact(self):
        spec = dup_spec(CUBE_XML)
        anim = AnimatedScene(spec=spec, layout="tlas", instancing="shared")
        scene, _ = anim.build()
        anim.set_transform(1, position=(3.0, 0.5, 2.0), rotation_deg=(0, 45, 0))
        fast = anim.update(scene)  # O(1): matrices + AABBs only
        full, _ = anim.build()  # full recompile of the same spec
        cam = cam_mod.make_camera(32, 20)
        img_fast = np.asarray(whitted.render(fast, cam)["image"])
        img_full = np.asarray(whitted.render(full, cam)["image"])
        np.testing.assert_array_equal(img_fast, img_full)
        # and the update actually moved something vs the original
        img_orig = np.asarray(whitted.render(scene, cam)["image"])
        assert np.abs(img_fast - img_orig).max() > 0.01

    def test_nonuniform_scale_normals(self):
        # squash the cube 4x in y: shared mode must use the inverse-
        # transpose for normals (a pure rotation of raw normals would tilt
        # the squashed top face's normal away from +y)
        spec = dup_spec(CUBE_XML, n_copies=1)
        spec.objects[0].scale = np.asarray([1.0, 0.25, 1.0], np.float32)
        scene, _ = compile_scene(spec=spec, layout="tlas", instancing="shared")
        cam = cam_mod.make_camera(32, 20)
        rays = cam_mod.full_frame_rays(cam)
        hit = query.find_nearest(scene, rays.o, rays.d)
        point = rays.o + np.asarray(hit["t"])[..., None] * rays.d
        normal, _, _ = query.get_hit_info(scene, hit, point, rays.d)
        n = np.asarray(normal)[np.asarray(hit["obj_idx"]) >= 2]
        assert n.shape[0] > 0
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)

    def test_diff_grad_flows(self):
        spec = dup_spec(CUBE_XML, n_copies=2)
        scene, _ = compile_scene(spec=spec, layout="tlas", instancing="shared")
        cam = cam_mod.make_camera(16, 10)
        rays = cam_mod.full_frame_rays(cam)

        def loss(o):
            hit = query.find_nearest_diff(scene, o, rays.d)
            return (hit["t"] * (hit["obj_idx"] >= 2)).sum()

        g = jax.grad(loss)(rays.o)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0.0
