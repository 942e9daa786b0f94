"""Analytic primitives + PrimitiveScene tests."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.core import vecmath as vm
from cpu_ray_tracer_tpu.ops import primitives as prim
from cpu_ray_tracer_tpu.render import basics, whitted
from cpu_ray_tracer_tpu.scene import primitive_scene as ps


class TestSphere:
    def test_outside_hit(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.sphere(o, d, jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0), jnp.array([1e34]))
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    def test_inside_hit_far_root(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.sphere(o, d, jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0), jnp.array([1e34]))
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-5)

    def test_miss(self):
        o = jnp.array([[0.0, 5.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.sphere(o, d, jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0), jnp.array([1e34]))
        assert not bool(hit[0])


class TestCube:
    def test_axis_aligned(self):
        inv_m = jnp.eye(4)
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.cube(
            o, d, inv_m, jnp.array([-0.5, -0.5, -0.5]), jnp.array([0.5, 0.5, 0.5]), jnp.array([1e34])
        )
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 2.5, atol=1e-5)

    def test_rotated(self):
        m = jnp.asarray(vm.mat_rotate_y(np.pi / 4))
        inv_m = jnp.asarray(vm.mat_inverted_no_scale(np.asarray(m)))
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.cube(
            o, d, inv_m, jnp.array([-0.5, -0.5, -0.5]), jnp.array([0.5, 0.5, 0.5]), jnp.array([1e34])
        )
        assert bool(hit[0])
        # rotated 45deg: the edge faces the ray, hit at z = -sqrt(0.5)
        np.testing.assert_allclose(float(t[0]), 3.0 - np.sqrt(0.5), atol=1e-4)
        n = prim.cube_normal(
            o + t[:, None] * d, m, inv_m, jnp.array([-0.5, -0.5, -0.5]), jnp.array([0.5, 0.5, 0.5])
        )
        np.testing.assert_allclose(np.linalg.norm(np.asarray(n)[0]), 1.0, atol=1e-5)


class TestTorus:
    def test_major_circle_hit(self):
        # torus rc=0.8 rt=0.25 in xy plane (z axis): ray along x hits at
        # x = -(rc+rt) from outside
        inv_t = jnp.eye(4)
        o = jnp.array([[-3.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        t, hit = prim.torus(
            o, d, inv_t, jnp.float32(0.64), jnp.float32(0.0625), jnp.float32(1.1025), jnp.array([1e34])
        )
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 3.0 - 1.05, atol=1e-3)

    def test_center_miss(self):
        # ray through the torus hole along z
        inv_t = jnp.eye(4)
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit = prim.torus(
            o, d, inv_t, jnp.float32(0.64), jnp.float32(0.0625), jnp.float32(1.1025), jnp.array([1e34])
        )
        assert not bool(hit[0])

    def test_normal_unit(self):
        inv_t = jnp.eye(4)
        p = jnp.array([[1.05, 0.0, 0.0]])
        n = prim.torus_normal(p, jnp.eye(4), inv_t, jnp.float32(0.64), jnp.float32(0.0625))
        np.testing.assert_allclose(np.asarray(n)[0], [1.0, 0.0, 0.0], atol=1e-4)


class TestPrimitiveScene:
    def test_compile_and_render(self):
        scene = ps.compile_primitive_scene()
        cam = cam_mod.make_camera(32, 20)
        out = whitted.render(scene, cam, depth_limit=3)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    def test_object_ids_via_probe(self):
        scene = ps.compile_primitive_scene()
        # ray straight down from above the floor hits the floor (obj 6)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        res = ps.find_nearest(scene, o, d)
        assert int(res["obj_idx"][0]) == 6
        np.testing.assert_allclose(float(res["t"][0]), 1.0, atol=1e-5)
        # ray toward the bouncing sphere at (-1.8, -0.4, 1) (anim_time 0)
        o2 = jnp.array([[-1.8, -0.4, -3.0]])
        d2 = jnp.array([[0.0, 0.0, 1.0]])
        res2 = ps.find_nearest(scene, o2, d2)
        assert int(res2["obj_idx"][0]) == 1

    def test_albedo_overrides(self):
        scene = ps.compile_primitive_scene()
        cam = cam_mod.make_camera(24, 16)
        img = np.asarray(basics.render(scene, cam, aov="albedo"))
        assert np.isfinite(img).all()

    def test_animation_moves_sphere(self):
        s0 = ps.compile_primitive_scene(0.0)
        s1 = ps.compile_primitive_scene(1.0)
        assert not np.allclose(np.asarray(s0.sphere_pos[0]), np.asarray(s1.sphere_pos[0]))
        assert not np.allclose(np.asarray(s0.cube_m), np.asarray(s1.cube_m))
