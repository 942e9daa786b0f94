"""Packet-traversal Pallas kernel vs the pure-JAX traversal and the brute
oracle — run in interpreter mode on the CPU backend."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu.accel import bvh_builder, pack
from cpu_ray_tracer_tpu.accel.compile import compile_bvh, make_triangle_pool
from cpu_ray_tracer_tpu.ops import intersect
from cpu_ray_tracer_tpu.ops.pallas import packet_bvh


def random_scene(rng, n):
    base = rng.uniform(-4, 4, size=(n, 1, 3))
    tri_v = (base + rng.normal(0, 0.4, size=(n, 3, 3))).astype(np.float32)
    pool = make_triangle_pool(tri_v)
    bvh, stats = compile_bvh(tri_v, force_split_cap=8)
    pk = pack.pack_from_arrays(bvh, pool)
    return tri_v, pool, bvh, pk


def random_rays(rng, r, spread=6.0):
    o = rng.uniform(-spread, spread, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestPacking:
    def test_slot_map_covers_all_tris(self, rng):
        _, pool, bvh, pk = random_scene(rng, 200)
        slots = np.asarray(pk.slot_tri)
        present = set(slots[slots >= 0].tolist())
        assert present == set(range(200))

    def test_node_record_roundtrip(self, rng):
        tri_v, pool, bvh, pk = random_scene(rng, 64)
        rows = np.asarray(pk.node_rows)
        # record 0 of octant 0 must hold the root bounds
        root = pk.root
        r, sub = root // pack.NODES_PER_ROW, root % pack.NODES_PER_ROW
        rec = rows[0, r, sub * pack.NODE_F : (sub + 1) * pack.NODE_F]
        np.testing.assert_allclose(rec[0:3], np.asarray(bvh.node_min)[root], rtol=1e-6)
        np.testing.assert_allclose(rec[3:6], np.asarray(bvh.node_max)[root], rtol=1e-6)


class TestKernelInterpret:
    def test_matches_brute_force(self, rng):
        tri_v, pool, bvh, pk = random_scene(rng, 256)
        o, d = random_rays(rng, 1024)
        t0 = jnp.full((1024,), 1e34, jnp.float32)
        res = packet_bvh.traverse(pk, pool, o, d, t0, interpret=True)
        bt, bu, bv, btri = intersect.brute_force_nearest(o, d, t0, pool.v0, pool.e1, pool.e2)
        np.testing.assert_allclose(np.asarray(res["t"]), np.asarray(bt), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(res["tri_idx"]), np.asarray(btri))

    def test_non_tile_multiple_and_mask(self, rng):
        tri_v, pool, bvh, pk = random_scene(rng, 128)
        o, d = random_rays(rng, 700)  # not a multiple of 1024
        t0 = jnp.full((700,), 1e34, jnp.float32)
        mask = jnp.ones((700,), jnp.float32).at[::2].set(0.0)  # half dead
        res = packet_bvh.traverse(pk, pool, o, d, t0, mask=mask, interpret=True)
        bt, _, _, btri = intersect.brute_force_nearest(o, d, t0, pool.v0, pool.e1, pool.e2)
        tri = np.asarray(res["tri_idx"])
        # dead lanes report no hit
        assert (tri[::2] == -1).all()
        np.testing.assert_array_equal(tri[1::2], np.asarray(btri)[1::2])

    def test_any_hit(self, rng):
        tri_v, pool, bvh, pk = random_scene(rng, 128)
        o, d = random_rays(rng, 512)
        t0 = jnp.full((512,), 1e34, jnp.float32)
        near = packet_bvh.traverse(pk, pool, o, d, t0, interpret=True)
        anyh = packet_bvh.traverse(pk, pool, o, d, t0, any_hit=True, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(near["tri_idx"]) >= 0, np.asarray(anyh["tri_idx"]) >= 0
        )

    def test_shadow_t_max(self, rng):
        tri_v = np.array([[[-5, -5, 2], [5, -5, 2], [0, 5, 2]]], np.float32)
        pool = make_triangle_pool(tri_v)
        bvh, _ = compile_bvh(tri_v, force_split_cap=8)
        pk = pack.pack_from_arrays(bvh, pool)
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        far = packet_bvh.traverse(pk, pool, o, d, jnp.array([1e34], jnp.float32), interpret=True)
        near = packet_bvh.traverse(pk, pool, o, d, jnp.array([1.5], jnp.float32), interpret=True)
        assert int(far["tri_idx"][0]) == 0
        assert int(near["tri_idx"][0]) == -1

    def test_big_leaf_multi_row(self, rng):
        # parity-mode build (no split cap) can make >8-tri leaves
        tri_v = np.tile(
            np.array([[[0, 0, 2], [1, 0, 2], [0, 1, 2]]], np.float32), (20, 1, 1)
        )  # 20 identical tris -> SAH can't split -> one big leaf
        pool = make_triangle_pool(tri_v)
        bvh, stats = compile_bvh(tri_v, force_split_cap=None)
        assert bvh.max_leaf > 8
        pk = pack.pack_from_arrays(bvh, pool)
        o = jnp.array([[0.2, 0.2, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        res = packet_bvh.traverse(pk, pool, o, d, jnp.array([1e34], jnp.float32), interpret=True)
        assert int(res["tri_idx"][0]) >= 0
        np.testing.assert_allclose(float(res["t"][0]), 2.0, rtol=1e-5)


class TestPallasSceneIntegration:
    def test_whitted_image_matches_xla_path(self, rng):
        import os
        from cpu_ray_tracer_tpu.core import camera as cam_mod
        from cpu_ray_tracer_tpu.render import whitted
        from cpu_ray_tracer_tpu.scene.build import compile_scene
        from tests.conftest import OUR_ASSETS

        xml = os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml")
        cam = cam_mod.make_camera(24, 16)
        ref_scene, _ = compile_scene(xml, layout="tlas", use_pallas=False)
        ref = np.asarray(whitted.render(ref_scene, cam)["image"])
        pal_scene, _ = compile_scene(xml, layout="tlas", use_pallas=True)
        assert pal_scene.use_pallas and pal_scene.packed is not None
        img = np.asarray(whitted.render(pal_scene, cam)["image"])
        np.testing.assert_allclose(img, ref, atol=2e-3, rtol=1e-3)
