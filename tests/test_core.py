"""Unit tests for core math, RNG, camera, textures, film."""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.core import film as film_mod
from cpu_ray_tracer_tpu.core import materials as mat_mod
from cpu_ray_tracer_tpu.core import rng as rng_mod
from cpu_ray_tracer_tpu.core import textures as tex_mod
from cpu_ray_tracer_tpu.core import vecmath as vm


class TestVecMath:
    def test_reflect(self):
        i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 1.0, 0.0]])
        r = vm.reflect(i, n)
        np.testing.assert_allclose(r, np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2), atol=1e-6)

    def test_reflect_preserves_length(self, rng):
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        n = rng.normal(size=(64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        r = vm.reflect(jnp.asarray(d), jnp.asarray(n))
        np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)

    def test_refract_straight_through(self):
        # eta=1 should transmit without bending: cost2 = cosi^2, T = D.
        d = jnp.array([[0.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        cosi, cost2, t = vm.refract_terms(d, n, jnp.float32(1.0))
        np.testing.assert_allclose(cosi, 1.0, atol=1e-6)
        np.testing.assert_allclose(cost2, 1.0, atol=1e-6)
        np.testing.assert_allclose(t, d, atol=1e-6)

    def test_refract_tir(self):
        # Grazing exit from dense medium: total internal reflection -> cost2 < 0.
        d = jnp.array([[0.99, -0.141, 0.0]])
        d = vm.normalize(d)
        n = jnp.array([[0.0, 1.0, 0.0]])
        _, cost2, _ = vm.refract_terms(d, n, jnp.float32(1.2))  # inside -> out
        assert float(cost2[0]) < 0.0

    def test_snell_law(self):
        # 45 degrees into glass-like n=1.2.
        d = vm.normalize(jnp.array([[1.0, -1.0, 0.0]]))
        n = jnp.array([[0.0, 1.0, 0.0]])
        eta = jnp.float32(1.0 / 1.2)
        _, _, t = vm.refract_terms(d, n, eta)
        sin_in = np.sqrt(0.5)
        sin_out = float(jnp.sqrt(t[0, 0] ** 2 + t[0, 2] ** 2) / vm.length(t)[0])
        np.testing.assert_allclose(sin_out, sin_in / 1.2, atol=1e-5)

    def test_schlick_normal_incidence(self):
        fr = vm.schlick_fresnel(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.2))
        np.testing.assert_allclose(fr, ((1 - 1.2) / (1 + 1.2)) ** 2, rtol=1e-5)

    def test_transforms_roundtrip(self, rng):
        t = vm.mat_translate((1, 2, 3)) @ vm.mat_rotate_y(0.7) @ vm.mat_rotate_x(-0.3)
        inv = vm.mat_inverted_no_scale(t)
        np.testing.assert_allclose(t @ inv, np.eye(4), atol=1e-5)
        p = rng.normal(size=(16, 3)).astype(np.float32)
        world = vm.transform_position(jnp.asarray(p), jnp.asarray(t))
        back = vm.transform_position(world, jnp.asarray(inv))
        np.testing.assert_allclose(back, p, atol=1e-4)


class TestRNG:
    def test_wang_hash_matches_reference_values(self):
        # Scalar reference computed by hand-executing tmplmath.cpp:5-12.
        def ref_wang(s):
            s = np.uint32(s)
            s = np.uint32((s ^ np.uint32(61)) ^ (s >> np.uint32(16)))
            s = np.uint32(s * np.uint32(9))
            s = np.uint32(s ^ (s >> np.uint32(4)))
            s = np.uint32(s * np.uint32(0x27D4EB2D))
            s = np.uint32(s ^ (s >> np.uint32(15)))
            return s

        xs = np.array([0, 1, 17, 1799, 0xDEADBEEF], dtype=np.uint32)
        got = np.asarray(rng_mod.wang_hash(jnp.asarray(xs)))
        want = np.array([ref_wang(x) for x in xs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_xorshift_sequence(self):
        # xorshift32 from seed 0x12345678, 3 steps, vs scalar reference.
        def step(s):
            s = np.uint32(s)
            with np.errstate(over="ignore"):
                s = np.uint32(s ^ np.uint32((int(s) << 13) & 0xFFFFFFFF))
                s = np.uint32(s ^ (s >> np.uint32(17)))
                s = np.uint32(s ^ np.uint32((int(s) << 5) & 0xFFFFFFFF))
            return s

        s_ref = np.uint32(0x12345678)
        s_jax = jnp.asarray(np.array([0x12345678], dtype=np.uint32))
        for _ in range(3):
            s_ref = step(s_ref)
            s_jax = rng_mod.xorshift32(s_jax)
        assert int(np.asarray(s_jax)[0]) == int(s_ref)

    def test_random_float_range(self):
        seeds = rng_mod.init_seed(jnp.arange(4096, dtype=jnp.uint32))
        _, f = rng_mod.random_float(seeds)
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() < 1.0
        assert abs(f.mean() - 0.5) < 0.02


class TestCamera:
    def test_default_matches_reference_frustum(self):
        # camera.h:14-21: default pos (0,0,-2) target (0,0,-1),
        # topLeft(-aspect,1,0) etc. — our SetCameraState math must reproduce it.
        cam = cam_mod.make_camera(constants.SCRWIDTH, constants.SCRHEIGHT)
        aspect = constants.SCRWIDTH / constants.SCRHEIGHT
        np.testing.assert_allclose(cam.top_left, [-aspect, 1, 0], atol=1e-6)
        np.testing.assert_allclose(cam.top_right, [aspect, 1, 0], atol=1e-6)
        np.testing.assert_allclose(cam.bottom_left, [-aspect, -1, 0], atol=1e-6)

    def test_center_ray_points_ahead(self):
        cam = cam_mod.make_camera(640, 480, pos=(1, 2, 3), target=(4, 2, 3))
        rays = cam_mod.primary_rays(
            cam, jnp.array([320.0]), jnp.array([240.0])
        )
        np.testing.assert_allclose(rays.d[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(rays.o[0], [1, 2, 3], atol=1e-6)

    def test_full_frame_shape_and_normalized(self):
        cam = cam_mod.make_camera(64, 32)
        rays = cam_mod.full_frame_rays(cam)
        assert rays.o.shape == (64 * 32, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays.d), axis=-1), 1.0, atol=1e-5
        )


class TestTextures:
    def _atlas(self):
        img0 = np.zeros((2, 2, 3), np.float32)
        img0[0, 0] = (1, 0, 0)  # top-left red
        img0[0, 1] = (0, 1, 0)
        img0[1, 0] = (0, 0, 1)
        img0[1, 1] = (1, 1, 1)
        img1 = np.full((1, 1, 3), 0.5, np.float32)
        return tex_mod.build_atlas([img0, img1])

    def test_nearest_corners(self):
        atlas = self._atlas()
        tid = jnp.zeros((4,), jnp.int32)
        # v flipped: v=1 samples row 0 (top).
        u = jnp.array([0.0, 0.9, 0.0, 0.9])
        v = jnp.array([0.9, 0.9, 0.0, 0.0])
        rgb = np.asarray(tex_mod.sample_nearest(atlas, tid, u, v))
        np.testing.assert_allclose(rgb[0], (1, 0, 0))
        np.testing.assert_allclose(rgb[1], (0, 1, 0))
        np.testing.assert_allclose(rgb[2], (0, 0, 1))
        np.testing.assert_allclose(rgb[3], (1, 1, 1))

    def test_second_texture_and_missing(self):
        atlas = self._atlas()
        rgb = np.asarray(
            tex_mod.sample_nearest(
                atlas, jnp.array([1, -1]), jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5])
            )
        )
        # nearest taps go through the packed 8-bit path (quantized)
        np.testing.assert_allclose(rgb[0], (0.5, 0.5, 0.5), atol=1 / 255)
        np.testing.assert_allclose(rgb[1], (0, 0, 0))

    def test_bilinear_center_average(self):
        atlas = self._atlas()
        rgb = np.asarray(
            tex_mod.sample_bilinear(
                atlas, jnp.array([0]), jnp.array([0.5]), jnp.array([0.5])
            )
        )
        np.testing.assert_allclose(rgb[0], (0.5, 0.5, 0.5), atol=1e-6)

    def test_bilinear_gradient_flows_to_texels(self):
        atlas = self._atlas()

        def f(texels):
            a = atlas.replace(texels=texels)
            return jnp.sum(
                tex_mod.sample_bilinear(a, jnp.array([0]), jnp.array([0.3]), jnp.array([0.6]))
            )

        g = jax.grad(f)(atlas.texels)
        assert float(jnp.abs(g).sum()) > 0.0

    def test_equirect_up_down(self):
        img = np.zeros((4, 8, 3), np.float32)
        img[0, :] = (1, 0, 0)  # top row = zenith
        img[-1, :] = (0, 0, 1)  # bottom row = nadir
        atlas = tex_mod.build_atlas([img])
        # d=(0,1,0) (up): theta=acos(-1)=pi -> v=1 -> texture flip -> row 0
        # (top). d=(0,-1,0) (down): theta=0 -> v=0 -> flip -> bottom row.
        up = tex_mod.sample_equirect(atlas, 0, jnp.array([[0.0, 1.0, 0.0]]))
        down = tex_mod.sample_equirect(atlas, 0, jnp.array([[0.0, -1.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(up)[0], (1, 0, 0))
        np.testing.assert_allclose(np.asarray(down)[0], (0, 0, 1))


class TestMaterialsFilm:
    def test_get_albedo_texture_vs_constant(self):
        atlas = tex_mod.build_atlas([np.full((2, 2, 3), 0.25, np.float32)])
        table = mat_mod.make_table(
            [
                {"albedo": (0.9, 0.8, 0.7)},
                {"tex_id": 0},
            ]
        )
        rgb = np.asarray(
            mat_mod.get_albedo(
                table, atlas, jnp.array([0, 1]), jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5])
            )
        )
        np.testing.assert_allclose(rgb[0], (0.9, 0.8, 0.7), atol=1e-6)
        np.testing.assert_allclose(rgb[1], (0.25, 0.25, 0.25), atol=1 / 255)

    def test_film_accumulate_and_tonemap(self):
        f = film_mod.make_film(4, 4)
        f = film_mod.add_samples(f, jnp.ones((4, 4, 3)) * 2.0, 1)
        f = film_mod.add_samples(f, jnp.ones((4, 4, 3)) * 0.0, 1)
        np.testing.assert_allclose(f.mean(), 1.0)
        u8 = np.asarray(film_mod.to_rgb8(f.mean() * 0.5))
        assert u8.dtype == np.uint8
        assert int(u8[0, 0, 0]) == 127

    def test_multi_device_visible(self):
        assert len(jax.devices()) == 8


class TestCameraInput:
    def test_handle_input_moves_forward(self):
        cam = cam_mod.make_camera(64, 32, pos=(0, 0, -2), target=(0, 0, -1))
        cam2 = cam_mod.handle_input(cam, dt_ms=1000.0, move=(0, 0, 1))
        # W moves along +z here; reference scale 0.00025*1000*5*2 = 2.5
        np.testing.assert_allclose(np.asarray(cam2.pos), [0, 0, 0.5], atol=1e-5)

    def test_handle_input_turn_changes_target(self):
        cam = cam_mod.make_camera(64, 32)
        cam2 = cam_mod.handle_input(cam, dt_ms=1000.0, turn=(1, 0))
        assert not np.allclose(np.asarray(cam2.target), np.asarray(cam.target))


class TestProbe:
    def test_probe_returns_ids(self):
        import os
        from cpu_ray_tracer_tpu.render.basics import probe
        from cpu_ray_tracer_tpu.scene.build import compile_scene
        from tests.conftest import OUR_ASSETS

        scene, _ = compile_scene(
            os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml"), layout="tlas"
        )
        cam = cam_mod.make_camera(64, 40)
        hit = probe(scene, cam, 32, 20)  # center: the cube
        assert hit["obj_idx"] == 2
        assert hit["t"] > 0
