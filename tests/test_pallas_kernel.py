"""Packet-traversal Pallas kernel vs the pure-JAX traversal and the brute
oracle — run in interpreter mode on the CPU backend."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu.accel import bvh_builder, pack
from cpu_ray_tracer_tpu.accel import wide as wide_mod
from cpu_ray_tracer_tpu.accel.compile import compile_bvh, make_triangle_pool
from cpu_ray_tracer_tpu.ops import intersect
from cpu_ray_tracer_tpu.ops.pallas import packet_bvh, wide_bvh


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

    def test_slot_meta_mat_id_5bit_guard(self):
        # regression (ADVICE r1): mat_id rides in bits 26-31 of a SIGNED
        # int32 whose sign bit is the -1 pad sentinel; mat_id = 32 would set
        # bit 31 and make real hits decode as misses.  make_slot_meta must
        # refuse anything that does not fit 5 bits.
        slot_tri = np.array([0, 1, -1], np.int32)
        obj = np.array([2, 3], np.int32)
        ok = pack.make_slot_meta(slot_tri, obj, np.array([31, 31], np.int32))
        meta = np.asarray(ok)
        assert (meta[:2] >= 0).all() and meta[2] == -1
        assert ((meta[:2] >> 26) & 0x3F).tolist() == [31, 31]
        assert pack.make_slot_meta(slot_tri, obj, np.array([31, 32], np.int32)) is None

    def test_meta_in_shade_lane15_roundtrip(self):
        # the fused ids+shade gather: pack_host bitcasts the per-tri meta
        # word into shade lane 15 when ids fit; when mat_id overflows 5
        # bits it must fall back (meta_in_shade False, lane 15 = mat float)
        tri_v = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 0, 1], [0, 1, 1]]],
            np.float32,
        )
        v0 = tri_v[:, 0]
        e1 = tri_v[:, 1] - v0
        e2 = tri_v[:, 2] - v0
        node_min = np.array([[0, 0, 0]], np.float32)
        node_max = np.array([[1, 1, 1]], np.float32)
        left_first = np.array([0], np.int32)
        tri_count = np.array([2], np.int32)
        idx = np.array([0, 1], np.int32)
        hit = np.full((8, 1), -1, np.int32)
        miss = np.full((8, 1), -1, np.int32)
        shade16 = np.zeros((2, 16), np.float32)
        shade16[:, 15] = [7.0, 9.0]  # mat as float (non-fused layout)
        obj = np.array([2, 3], np.int32)

        pk = pack.pack_host(
            node_min, node_max, left_first, tri_count, idx, v0, e1, e2,
            hit, miss, 0, obj_id=obj, mat_id=np.array([7, 9], np.int32),
            shade16=shade16,
        )
        assert pk.meta_in_shade
        rows = np.asarray(pk.tri_shade_rows).reshape(-1, 16)
        meta = rows[:2, 15].view(np.int32)
        assert (meta & 0xFFFFF).tolist() == [0, 1]
        assert ((meta >> 20) & 0x3F).tolist() == [2, 3]
        assert ((meta >> 26) & 0x3F).tolist() == [7, 9]

        pk2 = pack.pack_host(
            node_min, node_max, left_first, tri_count, idx, v0, e1, e2,
            hit, miss, 0, obj_id=obj, mat_id=np.array([7, 40], np.int32),
            shade16=shade16,
        )
        assert not pk2.meta_in_shade  # mat 40 needs 6 bits -> fallback
        rows2 = np.asarray(pk2.tri_shade_rows).reshape(-1, 16)
        assert rows2[0, 15] == 7.0  # lane 15 stays the float mat id

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


def wide_scene(rng, n, force_split_cap=8):
    base = rng.uniform(-4, 4, size=(n, 1, 3))
    tri_v = (base + rng.normal(0, 0.4, size=(n, 3, 3))).astype(np.float32)
    pool = make_triangle_pool(tri_v)
    host, idx, _ = bvh_builder.build_bvh(tri_v, force_split_cap=force_split_cap)
    v0 = tri_v[:, 0]
    pw = wide_mod.pack_wide_host(
        host.node_min, host.node_max, host.left, host.right,
        host.left_first, host.tri_count, idx,
        v0, tri_v[:, 1] - v0, tri_v[:, 2] - v0, 0,
    )
    return tri_v, pool, host, pw


class TestWideCollapse:
    def test_every_leaf_once_and_slots_cover(self, rng):
        tri_v, pool, host, pw = wide_scene(rng, 300)
        kids, depth = wide_mod.collapse_wide(
            host.left, host.right, host.tri_count, host.node_min, host.node_max, 0
        )
        leaf_ids = [c[0] for w in kids for c in w if c[1] < 0]
        expect = np.where(host.tri_count > 0)[0]
        assert sorted(leaf_ids) == sorted(expect.tolist())
        wide_ids = [c[1] for w in kids for c in w if c[1] >= 0]
        assert sorted(wide_ids) == list(range(1, len(kids)))  # each wide node is a child once
        slots = np.asarray(pw.slot_tri)
        assert set(slots[slots >= 0].tolist()) == set(range(300))

    def test_meta_and_rows_shapes(self, rng):
        _, _, _, pw = wide_scene(rng, 64)
        assert pw.aabb48.shape == (48, pw.num_wide)
        assert pw.cmeta.shape == (8, pw.num_wide)
        assert pw.orderw.shape == (8, pw.num_wide)
        # every orderw word is a permutation of slots 0..7
        ow = np.asarray(pw.orderw)
        slots = (ow[..., None] >> (3 * np.arange(8))) & 7
        filled = np.asarray(pw.cmeta).T > 0  # [W, 8] real children
        for o in range(8):
            for wi in range(pw.num_wide):
                ranks = set(slots[o, wi].tolist())
                # real child slots must all appear in the permutation
                need = set(np.where(filled[wi])[0].tolist())
                assert need <= ranks


class TestWideKernelInterpret:
    def test_matches_brute_force(self, rng):
        tri_v, pool, host, pw = wide_scene(rng, 256)
        o, d = random_rays(rng, 1024)
        t0 = jnp.full((1024,), 1e34, jnp.float32)
        res = wide_bvh.traverse(pw, pool, o, d, t0, interpret=True)
        bt, bu, bv, btri = intersect.brute_force_nearest(o, d, t0, pool.v0, pool.e1, pool.e2)
        np.testing.assert_allclose(np.asarray(res["t"]), np.asarray(bt), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(res["tri_idx"]), np.asarray(btri))

    def test_mask_and_any_hit(self, rng):
        tri_v, pool, host, pw = wide_scene(rng, 128)
        o, d = random_rays(rng, 700)
        t0 = jnp.full((700,), 1e34, jnp.float32)
        mask = jnp.ones((700,), jnp.float32).at[::2].set(0.0)
        res = wide_bvh.traverse(pw, pool, o, d, t0, mask=mask, interpret=True)
        bt, _, _, btri = intersect.brute_force_nearest(o, d, t0, pool.v0, pool.e1, pool.e2)
        tri = np.asarray(res["tri_idx"])
        assert (tri[::2] == -1).all()
        np.testing.assert_array_equal(tri[1::2], np.asarray(btri)[1::2])
        anyh = wide_bvh.traverse(pw, pool, o, d, t0, any_hit=True, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(res["tri_idx"])[1::2] >= 0, np.asarray(anyh["tri_idx"])[1::2] >= 0
        )

    def test_shadow_t_max_single_tri(self, rng):
        tri_v = np.array([[[-5, -5, 2], [5, -5, 2], [0, 5, 2]]], np.float32)
        pool = make_triangle_pool(tri_v)
        host, idx, _ = bvh_builder.build_bvh(tri_v, force_split_cap=8)
        v0 = tri_v[:, 0]
        pw = wide_mod.pack_wide_host(
            host.node_min, host.node_max, host.left, host.right,
            host.left_first, host.tri_count, idx,
            v0, tri_v[:, 1] - v0, tri_v[:, 2] - v0, 0,
        )
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        far = wide_bvh.traverse(pw, pool, o, d, jnp.array([1e34], jnp.float32), interpret=True)
        near = wide_bvh.traverse(pw, pool, o, d, jnp.array([1.5], jnp.float32), interpret=True)
        assert int(far["tri_idx"][0]) == 0
        assert int(near["tri_idx"][0]) == -1


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


def stack_scene(rng, n):
    """Random-soup PackedBVH equipped with the stack-descent tables
    (node_nearfar + stack_depth), the way scene/build.py attaches them."""
    base = rng.uniform(-4, 4, size=(n, 1, 3))
    tri_v = (base + rng.normal(0, 0.4, size=(n, 3, 3))).astype(np.float32)
    pool = make_triangle_pool(tri_v)
    host, idx, _ = bvh_builder.build_bvh(tri_v, force_split_cap=8)
    hit, miss = bvh_builder.thread_links(host.left, host.right, host.tri_count, host.axis)
    v0 = tri_v[:, 0]
    pk = pack.pack_host(
        host.node_min, host.node_max, host.left_first, host.tri_count,
        idx, v0, tri_v[:, 1] - v0, tri_v[:, 2] - v0, hit, miss, 0,
    )
    pk = pk.replace(
        node_nearfar=jnp.asarray(
            pack.nearfar_from_children(host.left, host.right, host.axis)
        ),
        stack_depth=pack.tree_depth(host.left, host.right, 0),
    )
    return tri_v, pool, pk


class TestStackKernel:
    """SMEM-stack ordered two-child descent (CRT_STACK=1) must agree with
    the threaded-link walk bit-for-bit — same tree, same Möller–Trumbore,
    only the traversal order differs (infra/bvh.cpp:224-258 semantics)."""

    def _ab(self, monkeypatch, pk, pool, o, d, t0, **kw):
        monkeypatch.setattr(packet_bvh, "STACK", False)
        link = packet_bvh.traverse(pk, pool, o, d, t0, interpret=True, **kw)
        monkeypatch.setattr(packet_bvh, "STACK", True)
        stack = packet_bvh.traverse(pk, pool, o, d, t0, interpret=True, **kw)
        return link, stack

    def test_matches_link_kernel(self, rng, monkeypatch):
        tri_v, pool, pk = stack_scene(rng, 256)
        assert pk.stack_depth > 0 and pk.num_nodes >= 3
        o, d = random_rays(rng, 1024)
        t0 = jnp.full((1024,), 1e34, jnp.float32)
        link, stack = self._ab(monkeypatch, pk, pool, o, d, t0)
        np.testing.assert_array_equal(np.asarray(link["t"]), np.asarray(stack["t"]))
        np.testing.assert_array_equal(
            np.asarray(link["tri_idx"]), np.asarray(stack["tri_idx"])
        )
        np.testing.assert_array_equal(
            np.asarray(link["bary"]), np.asarray(stack["bary"])
        )

    def test_mask_any_hit_t_max(self, rng, monkeypatch):
        tri_v, pool, pk = stack_scene(rng, 128)
        o, d = random_rays(rng, 700)  # not a tile multiple
        t0 = jnp.full((700,), 2.5, jnp.float32)  # finite shadow-style t_max
        mask = jnp.ones((700,), jnp.float32).at[::2].set(0.0)
        link, stack = self._ab(monkeypatch, pk, pool, o, d, t0, mask=mask)
        tri_l, tri_s = np.asarray(link["tri_idx"]), np.asarray(stack["tri_idx"])
        assert (tri_s[::2] == -1).all()
        np.testing.assert_array_equal(tri_l, tri_s)
        la, sa = self._ab(monkeypatch, pk, pool, o, d, t0, mask=mask, any_hit=True)
        np.testing.assert_array_equal(
            np.asarray(la["tri_idx"]) >= 0, np.asarray(sa["tri_idx"]) >= 0
        )

    def test_forest_roots_match_link_kernel(self, rng, monkeypatch):
        # grid-accel TLAS scene -> the packed structure is a MERGED FOREST
        # (one cell tree per instance); the link walk chains roots through
        # threaded miss links, the stack walk seeds its stack with them —
        # both must see every instance
        import os
        from cpu_ray_tracer_tpu.scene.build import compile_scene

        xml = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "scenes", "bunny_teapot.xml",
        )
        scene, info = compile_scene(xml, layout="tlas", accel="grid", use_pallas=True)
        pk = scene.packed
        assert len(pk.stack_roots) == info.object_count == 3
        o, d = random_rays(rng, 1024, spread=3.0)
        t0 = jnp.full((1024,), 1e34, jnp.float32)
        link, stack = self._ab(monkeypatch, pk, scene.tris, o, d, t0)
        np.testing.assert_array_equal(np.asarray(link["t"]), np.asarray(stack["t"]))
        np.testing.assert_array_equal(
            np.asarray(link["tri_idx"]), np.asarray(stack["tri_idx"])
        )
        # all three instances must be reachable through the stack walk
        hit_objs = set(np.asarray(stack["obj_id"]).tolist()) - {-1}
        assert len(hit_objs) >= 2
