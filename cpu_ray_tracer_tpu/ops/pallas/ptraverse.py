"""Shared in-kernel BVH traversal builder for the Pallas wavefront kernels.

`make_traverser` returns a `traverse(ox, oy, oz, dx, dy, dz, t0, alive, o8)`
closure over the caller's SMEM/VMEM refs that walks the packed node tables
and Möller–Trumbore-tests leaf rows with shading-attribute interpolation
(normal/uv/mat ride the while carry) — the exact recipe proven in
ops/pallas/wavefront_pt.py (r3–r4), extracted verbatim in r5 so the fused
Whitted kernel (whitted_wf.py) reuses it instead of duplicating ~250 lines.

Two walks, selected by `use_stack`:
* ordered two-child SMEM-stack descent (packet_bvh._kernel_stack recipe):
  one packed reduce decides BOTH children of an interior node;
* threaded hit/miss link walk with successor prefetch (cell forests).

`any_hit=True` builds the shadow variant (reference semantics of
infra/scene/file_scene.cpp:177-187 via scene/query.is_occluded): the first
accepted triangle hit COLLAPSES the lane's t to ~0, so the lane stops
enlarging any node's slab union and the packet walk runs itself dry early;
shading interpolation is skipped entirely.  Occlusion = slot >= 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from cpu_ray_tracer_tpu import constants

TRI_EPS = constants.TRI_EPS
_ANY_HIT_T = np.float32(1e-30)


def make_traverser(
    aabb_ref, meta2_ref, links_ref, tris_ref, shade_ref, stack_ref,
    *,
    shape,
    root: int,
    roots: tuple,
    max_steps: int,
    meta_shade: bool,
    use_stack: bool,
    any_hit: bool = False,
):
    from cpu_ray_tracer_tpu.accel.pack import TRI_F, TRIS_PER_ROW

    def fetch_rec(node, o8):
        # links_ref holds the per-octant NEAR/FAR child table instead of
        # hit/miss links when use_stack (the caller swaps the input); the
        # stack walk never calls this
        return (
            aabb_ref[0, node], aabb_ref[1, node], aabb_ref[2, node],
            aabb_ref[3, node], aabb_ref[4, node], aabb_ref[5, node],
            meta2_ref[0, node], meta2_ref[1, node],
            links_ref[o8, 0, node], links_ref[o8, 1, node],
        )

    def fetch8(node):
        return (
            aabb_ref[0, node], aabb_ref[1, node], aabb_ref[2, node],
            aabb_ref[3, node], aabb_ref[4, node], aabb_ref[5, node],
            meta2_ref[0, node], meta2_ref[1, node],
        )

    def make_leaf_tests(ox, oy, oz, dx, dy, dz, mask, lf, nrows):
        """MT rows [lf, lf+nrows) with shading-attribute interpolation —
        shared by the link and stack walks (args: t, slot, nx, ny, nz,
        tu, tv, mat, tests)."""

        def leaf_tests(args):
            def row_body(i, a2):
                t, slot, nx, ny, nz, tu, tv, mat, tests = a2
                trow = tris_ref[pl.ds(lf + i, 1), :]
                if not any_hit:
                    srow = shade_ref[pl.ds(lf + i, 1), :]
                    if meta_shade:
                        # scalar f32 bitcasts are not lowerable
                        # (tpu.bitcast wants vectors): bitcast the whole
                        # row once, then extract the meta scalars
                        srow_i = jax.lax.bitcast_convert_type(srow, jnp.int32)
                base_slot = (lf + i) * TRIS_PER_ROW
                for k in range(TRIS_PER_ROW):
                    lane0 = k * TRI_F
                    v0x, v0y, v0z = trow[0, lane0], trow[0, lane0 + 1], trow[0, lane0 + 2]
                    e1x, e1y, e1z = trow[0, lane0 + 3], trow[0, lane0 + 4], trow[0, lane0 + 5]
                    e2x, e2y, e2z = trow[0, lane0 + 6], trow[0, lane0 + 7], trow[0, lane0 + 8]
                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    uu = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    vv = f * (dx * qx + dy * qy + dz * qz)
                    tt = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (
                        (jnp.abs(a) >= TRI_EPS)
                        & (uu >= 0.0) & (uu <= 1.0)
                        & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > TRI_EPS) & (tt < t)
                        & mask
                    )
                    if any_hit:
                        # first hit wins: collapse t so the lane stops
                        # driving slab unions (early-out by exhaustion)
                        t = jnp.where(ok, _ANY_HIT_T, t)
                        slot = jnp.where(ok, base_slot + k, slot)
                        tests = tests + TRIS_PER_ROW
                        continue
                    t = jnp.where(ok, tt, t)
                    slot = jnp.where(ok, base_slot + k, slot)
                    ww = 1.0 - uu - vv
                    n0x, n0y, n0z = srow[0, lane0], srow[0, lane0 + 1], srow[0, lane0 + 2]
                    n1x, n1y, n1z = srow[0, lane0 + 3], srow[0, lane0 + 4], srow[0, lane0 + 5]
                    n2x, n2y, n2z = srow[0, lane0 + 6], srow[0, lane0 + 7], srow[0, lane0 + 8]
                    u0a, v0a = srow[0, lane0 + 9], srow[0, lane0 + 10]
                    u1a, v1a = srow[0, lane0 + 11], srow[0, lane0 + 12]
                    u2a, v2a = srow[0, lane0 + 13], srow[0, lane0 + 14]
                    if meta_shade:
                        m_id = (srow_i[0, lane0 + 15] >> 26) & 0x3F
                    else:
                        m_id = srow[0, lane0 + 15].astype(jnp.int32)
                    nx = jnp.where(ok, ww * n0x + uu * n1x + vv * n2x, nx)
                    ny = jnp.where(ok, ww * n0y + uu * n1y + vv * n2y, ny)
                    nz = jnp.where(ok, ww * n0z + uu * n1z + vv * n2z, nz)
                    tu = jnp.where(ok, ww * u0a + uu * u1a + vv * u2a, tu)
                    tv = jnp.where(ok, ww * v0a + uu * v1a + vv * v2a, tv)
                    mat = jnp.where(ok, m_id, mat)
                tests = tests + TRIS_PER_ROW
                return t, slot, nx, ny, nz, tu, tv, mat, tests

            return jax.lax.fori_loop(0, nrows, row_body, args)

        return leaf_tests

    def traverse_stack(ox, oy, oz, dx, dy, dz, t0, alive, o8):
        """Ordered two-child SMEM-stack walk (packet_bvh._kernel_stack
        recipe) with shading attributes carried — one packed reduce decides
        both children of each interior node."""
        rdx = 1.0 / dx
        rdy = 1.0 / dy
        rdz = 1.0 / dz
        mask = alive > 0

        def cond(c):
            return (c[0] >= 0) & (c[-2] < max_steps)

        def body(c):
            cur, sp, t, slot, nx, ny, nz, tu, tv, mat, steps, tests = c
            active = cur >= 0
            node = jnp.maximum(cur, 0)
            near = links_ref[o8, 0, node]  # near/far table rides links_ref
            far = links_ref[o8, 1, node]
            nrec = fetch8(jnp.maximum(near, 0))
            frec = fetch8(jnp.maximum(far, 0))

            def slab(rec):
                bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = rec[:6]
                tx1 = (bminx - ox) * rdx
                tx2 = (bmaxx - ox) * rdx
                tmin = jnp.minimum(tx1, tx2)
                tmax = jnp.maximum(tx1, tx2)
                ty1 = (bminy - oy) * rdy
                ty2 = (bmaxy - oy) * rdy
                tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
                tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
                tz1 = (bminz - oz) * rdz
                tz2 = (bmaxz - oz) * rdz
                tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
                tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
                return (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & mask & active

            hitN = slab(nrec)
            hitF = slab(frec)
            packed = jnp.sum(hitN.astype(jnp.int32) + (hitF.astype(jnp.int32) << 16))
            anyN = (packed & 0xFFFF) > 0
            anyF = packed >= (1 << 16)
            leafN = nrec[7] > 0
            leafF = frec[7] > 0

            args = (t, slot, nx, ny, nz, tu, tv, mat, tests)
            args = jax.lax.cond(
                anyN & leafN,
                make_leaf_tests(ox, oy, oz, dx, dy, dz, mask, nrec[6], nrec[7]),
                lambda a: a, args,
            )
            args = jax.lax.cond(
                anyF & leafF,
                make_leaf_tests(ox, oy, oz, dx, dy, dz, mask, frec[6], frec[7]),
                lambda a: a, args,
            )
            t, slot, nx, ny, nz, tu, tv, mat, tests = args

            goN = anyN & (~leafN) & active
            goF = anyF & (~leafF) & active
            both = goN & goF

            @pl.when(both)
            def _push():
                stack_ref[sp] = far

            sp2 = sp + both.astype(jnp.int32)
            pop_val = jnp.where(
                sp2 > 0, stack_ref[jnp.maximum(sp2 - 1, 0)], jnp.int32(-1)
            )
            nxt = jnp.where(goN, near, jnp.where(goF, far, pop_val))
            sp3 = jnp.where(goN | goF, sp2, jnp.maximum(sp2 - 1, 0))
            cur = jnp.where(active, nxt, cur)
            sp = jnp.where(active, sp3, sp)
            steps = steps + jnp.where(active, 1, 0)
            return cur, sp, t, slot, nx, ny, nz, tu, tv, mat, steps, tests

        n_live = jnp.sum(alive)
        rts = roots or (root,)
        cur0 = jnp.where(n_live > 0, rts[0], -1).astype(jnp.int32)
        # forest: seed the stack with the remaining roots (re-written on
        # every traversal — the scratch persists across calls)
        for i, rt in enumerate(rts[1:]):
            stack_ref[i] = jnp.int32(rt)
        init = (
            cur0,
            jnp.int32(len(rts) - 1),  # stack pointer
            t0,
            jnp.full(shape, -1, jnp.int32),  # slot
            jnp.zeros(shape, jnp.float32),  # nx
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),  # tu
            jnp.zeros(shape, jnp.float32),
            jnp.full(shape, -1, jnp.int32),  # mat
            jnp.int32(0),
            jnp.int32(0),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out[2:]

    def traverse_links(ox, oy, oz, dx, dy, dz, t0, alive, o8):
        """Single-cursor packet walk (packet_bvh.py recipe) with shading
        attributes carried: returns (t, slot, nx, ny, nz, tu, tv, mat,
        steps, tests)."""
        rdx = 1.0 / dx
        rdy = 1.0 / dy
        rdz = 1.0 / dz
        mask = alive > 0

        def cond(c):
            head = c[0]
            steps = c[-2]
            return (head[0] >= 0) & (steps < max_steps)

        def body(c):
            head, t, slot, nx, ny, nz, tu, tv, mat, steps, tests = c
            cur = head[0]
            active = cur >= 0
            (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
             lf, nrows, hit_link, miss_link) = head[1]
            is_leaf = nrows > 0

            tx1 = (bminx - ox) * rdx
            tx2 = (bmaxx - ox) * rdx
            tmin = jnp.minimum(tx1, tx2)
            tmax = jnp.maximum(tx1, tx2)
            ty1 = (bminy - oy) * rdy
            ty2 = (bmaxy - oy) * rdy
            tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
            tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
            tz1 = (bminz - oz) * rdz
            tz2 = (bmaxz - oz) * rdz
            tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
            tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
            lane_hit = (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & mask & active
            any_lane = jnp.sum(lane_hit.astype(jnp.int32)) > 0

            steps = steps + jnp.where(active, 1, 0)
            # prefetch both successors while the reduce is in flight
            rec_hit = fetch_rec(jnp.maximum(hit_link, 0), o8)
            rec_miss = fetch_rec(jnp.maximum(miss_link, 0), o8)

            t, slot, nx, ny, nz, tu, tv, mat, tests = jax.lax.cond(
                any_lane & is_leaf,
                make_leaf_tests(ox, oy, oz, dx, dy, dz, mask, lf, nrows),
                lambda a: a,
                (t, slot, nx, ny, nz, tu, tv, mat, tests),
            )
            descend = any_lane & (~is_leaf)
            cur = jnp.where(active, jnp.where(descend, hit_link, miss_link), cur)
            rec = tuple(
                jnp.where(descend, rh, rm) for rh, rm in zip(rec_hit, rec_miss)
            )
            return ((cur, rec), t, slot, nx, ny, nz, tu, tv, mat, steps, tests)

        n_live = jnp.sum(alive)
        cur0 = jnp.where(n_live > 0, root, -1).astype(jnp.int32)
        init = (
            (cur0, fetch_rec(jnp.int32(root), o8)),
            t0,
            jnp.full(shape, -1, jnp.int32),  # slot
            jnp.zeros(shape, jnp.float32),  # nx
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),  # tu
            jnp.zeros(shape, jnp.float32),
            jnp.full(shape, -1, jnp.int32),  # mat
            jnp.int32(0),
            jnp.int32(0),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out[1:]

    return traverse_stack if use_stack else traverse_links
