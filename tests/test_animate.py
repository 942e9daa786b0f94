"""SetTransform / Refit capability tests."""

import os

import numpy as np

from cpu_ray_tracer_tpu.accel import bvh_builder
from cpu_ray_tracer_tpu.scene.animate import AnimatedScene

from tests.conftest import OUR_ASSETS

CUBE_XML = os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml")


class TestRefit:
    def test_refit_bounds_valid_after_motion(self, rng):
        base = rng.uniform(-4, 4, size=(200, 1, 3))
        tri_v = (base + rng.normal(0, 0.4, size=(200, 3, 3))).astype(np.float32)
        host, idx, _ = bvh_builder.build_bvh(tri_v)
        # move everything
        tri_v2 = tri_v + np.float32([1.0, -2.0, 0.5])
        bvh_builder.refit_bvh(host, idx, tri_v2)
        # invariants hold on the moved geometry
        tmin = tri_v2.min(axis=1)
        tmax = tri_v2.max(axis=1)
        for node in range(host.nodes_used):
            c = host.tri_count[node]
            if c > 0:
                sl = idx[host.left_first[node] : host.left_first[node] + c]
                assert np.all(host.node_min[node] <= tmin[sl].min(axis=0) + 1e-5)
                assert np.all(host.node_max[node] >= tmax[sl].max(axis=0) - 1e-5)
            else:
                li, ri = host.left[node], host.right[node]
                assert np.all(host.node_min[node] <= host.node_min[li] + 1e-6)
                assert np.all(host.node_max[node] >= host.node_max[ri] - 1e-6)


class TestAnimatedScene:
    def test_transform_moves_geometry(self):
        anim = AnimatedScene(CUBE_XML, layout="tlas")
        s0, _ = anim.build()
        lo0 = np.asarray(s0.tris.v0).min(axis=0)
        anim.set_transform(0, position=(5.0, 0.0, 2.5))
        s1, _ = anim.build()
        lo1 = np.asarray(s1.tris.v0).min(axis=0)
        assert lo1[0] > lo0[0] + 3.0  # cube moved +x

    def test_light_moves(self):
        anim = AnimatedScene(CUBE_XML, layout="tlas")
        s0, _ = anim.build()
        anim.set_light_position((3.0, 4.0, 5.0))
        s1, _ = anim.build()
        np.testing.assert_allclose(np.asarray(s1.light_t)[:3, 3], [3, 4, 5], atol=1e-6)

    def test_rebuild_reuses_jit(self):
        # same shapes -> a jitted render keeps its cache across rebuilds
        import jax
        import jax.numpy as jnp

        from cpu_ray_tracer_tpu.core.camera import make_camera
        from cpu_ray_tracer_tpu.render import basics

        anim = AnimatedScene(CUBE_XML, layout="tlas")
        cam = make_camera(16, 8)
        fn = jax.jit(lambda s: basics.render(s, cam, aov="depth"))
        s0, _ = anim.build()
        img0 = fn(s0)
        anim.set_transform(0, position=(0.3, 0.0, 2.5))
        s1, _ = anim.build()
        img1 = fn(s1)  # no recompile (same treedef/shapes)
        assert img0.shape == img1.shape
        assert not np.allclose(np.asarray(img0), np.asarray(img1))
