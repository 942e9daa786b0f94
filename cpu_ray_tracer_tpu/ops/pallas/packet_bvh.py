"""Pallas TPU packet BVH traversal — the hot kernel of the framework.

Replaces the pure-XLA lockstep traversal (ops/traverse_bvh.py) whose
per-step cost is dominated by dispatch + gathers: here a TILE of rays
shares ONE scalar node cursor.  Two walks:

  * `_kernel_stack` (default for SAH BVHs): ordered two-child descent —
    each step slab-tests BOTH children of one interior node, decides them
    with a single packed vector->scalar reduce, runs leaf children's
    Möller–Trumbore rows inline, and defers the far interior child on a
    per-group SMEM stack (infra/bvh.cpp:224-258 semantics, one reduce per
    TWO nodes).
  * `_kernel` (default for grid/KD cell forests): threaded per-octant
    hit/miss skip links, one node per step, successor records prefetched
    during the reduce.

Both do broadcast slab tests of the whole tile (pure VPU math, zero
gathers) and unconditional Möller–Trumbore tests of whole 8-triangle
rows (degenerate padding never hits); node records come from SMEM scalar
tables (or octant-replicated VMEM rows for huge scenes).

The packet visits the union of nodes any live lane needs — the classic
packet-traversal trade: slightly more nodes than per-ray traversal, vastly
cheaper per node on a lockstep vector machine.  Ordering uses the tile's
majority ray-direction octant (correctness is octant-independent; only
early-out quality varies).

Grid = one program per ray tile; programs run sequentially per core, each
with its own data-dependent while_loop, so total time is the sum of per-tile
union traversals, not the max over the whole frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.ops.traverse_bvh import ray_octants
from cpu_ray_tracer_tpu.accel.pack import (
    F_BMAX,
    F_BMIN,
    F_CNT,
    F_HIT,
    F_LF,
    F_MISS,
    F_NROWS,
    NODE_F,
    NODES_PER_ROW,
    PackedBVH,
    TRI_F,
    TRIS_PER_ROW,
)

import os as _os

# rays per tile: 4096 beats 8192 on sorted-bounce AND coherent regimes on
# v5e (smaller per-tile node unions; bench 6.31 -> 6.54 Mrays/s end-to-end)
TILE = int(_os.environ.get("CRT_PACKET_TILE", "4096"))
TILE_SHAPE = (TILE // 128, 128)
UNROLL = int(_os.environ.get("CRT_PACKET_UNROLL", "2"))  # node steps per loop iter
# Independent cursor groups per tile: each group of TILE/GROUPS rays follows
# its own node cursor (own majority octant, own subtree path).  >1 shrinks
# each packet's node union AND interleaves independent scalar fetch chains
# (the kernel's bound resource).  1 = classic whole-tile packet.
GROUPS = int(_os.environ.get("CRT_PACKET_GROUPS", "1"))
assert TILE_SHAPE[0] % max(GROUPS, 1) == 0, "GROUPS must divide tile sublanes"
GSUB = TILE_SHAPE[0] // max(GROUPS, 1)  # sublanes per cursor group
# SMEM scalar node tables: on (1 = default) uses pk.node_aabb/meta2/links for
# the per-step fetch when they fit the budget; 0 forces the VMEM row path.
SMEM_NODES = _os.environ.get("CRT_SMEM_NODES", "1") != "0"
# profiling-only: 1 skips all leaf Möller–Trumbore work (results are WRONG);
# isolates node-walk cost from leaf-row cost in the probes
NO_LEAF = _os.environ.get("CRT_NO_LEAF", "0") == "1"
# profiling-only: 1 drops the per-tri u/v select chains + while-carries
# from the leaf rows (bary outputs are WRONG — zeros); measures the ceiling
# of recomputing barycentrics outside the kernel from the winning slot
NO_UV = _os.environ.get("CRT_NO_UV", "0") == "1"
# Successor prefetch (SMEM node-table path): each step carries the CURRENT
# node's record and fetches BOTH successors' records while the
# vector->scalar hit reduction is still in flight; the branch then SELECTS
# among prefetched scalars instead of fetching after the reduce — the SMEM
# load latency leaves the serial chain entirely (sync_probe: the reduce,
# not the fetch, is the per-step wall).
PREFETCH = _os.environ.get("CRT_PREFETCH", "1") != "0"
# in-kernel shading-attribute interpolation (normal/uv/mat ride the while
# carry) — net-negative on v5e (register pressure), kept for experiments
KERNEL_SHADE = _os.environ.get("CRT_KERNEL_SHADE", "0") == "1"
# SMEM-stack ordered two-child descent (CRT_STACK=1): each step processes
# one INTERIOR node — slab-tests both its (near, far) children and decides
# both with ONE packed vector->scalar reduce (near count in bits 0:16, far
# in 16:32); leaf children run their Möller–Trumbore rows inline, interior
# hits descend near-first with far pushed to a per-group SMEM stack.  The
# link walk pays one reduce per VISITED node (interior + leaf); the stack
# walk pays one per interior-with-a-hit — the serial reduce chain is the
# kernel's measured wall (docs/ROOFLINE.md), so this halves the bound
# resource at the cost of 2 slab tests (cheap VPU math) per step.
# Tri-state: CRT_STACK unset -> per-structure default (pk.stack_default:
# ON for SAH BVHs, 13.03 -> 13.41 Mrays/s headline; OFF for grid/KD cell
# forests, whose tight sibling partitions hit both children nearly every
# step and the heavier 2-slab step loses ~12% on KD — interchange_r2.json);
# CRT_STACK=1/0 forces it globally.
_stack_env = _os.environ.get("CRT_STACK")
STACK = None if _stack_env is None else (_stack_env == "1")


def _want_stack(pk) -> bool:
    return pk.stack_default if STACK is None else STACK
STACK_CAP = 128  # ints per cursor group; pack-time depth is asserted below
# r3 latency-hiding experiments REMOVED in r4 (both measured neutral, see
# docs/ROOFLINE.md history): CRT_STACK_PREFETCH (3-candidate record
# prefetch during the reduce; 13.45 vs 13.50 Mrays/s) and CRT_STACK_DEFER
# (leaf rows one step late between reduce issue and read; 13.07 vs 13.12)
# — the scalar unit already overlaps this work with the in-flight reduce.
SMEM_BUDGET = int(_os.environ.get("CRT_SMEM_BUDGET", str(480 * 1024)))  # bytes
TRI_EPS = constants.TRI_EPS
BIG = jnp.float32(1e30)


def _select_record(row128: jnp.ndarray, sub: jnp.ndarray, n_per_row: int, rec_f: int):
    """Rotate subrecord `sub` of a packed (1, 128) row to lanes [0, rec_f)
    so its fields can be read with static extracts.  A dynamic lane rotate
    is one VPU op (tpu.dynamic_rotate) — no cross-layout reshape, no
    per-lane gather."""
    return pltpu.roll(row128, -rec_f * sub, 1)


def _kernel(
    oct_ref,  # SMEM [G, T] i32 per-cursor-group octant (group-major)
    ox_ref, oy_ref, oz_ref,  # VMEM [8,128] blocks per tile
    dx_ref, dy_ref, dz_ref,
    t0_ref, mask_ref,
    *node_and_rest,
    root: int,
    any_hit: bool,
    max_steps: int,
    with_shade: bool,
    smem: bool,
    meta_shade: bool = False,
):
    # node data: either one VMEM row table, or three SMEM scalar tables
    if smem:
        aabb_ref, meta_ref, links_ref, tris_ref = node_and_rest[:4]
        rest = node_and_rest[4:]
    else:
        nodes_ref, tris_ref = node_and_rest[:2]
        rest = node_and_rest[2:]
    if with_shade:
        shade_ref = rest[0]
        (t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref,
         nx_ref, ny_ref, nz_ref, tu_ref, tv_ref, mat_ref) = rest[1:]
    else:
        t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref = rest
    # trav/test are LANE-UNIFORM within a cursor group (every masked lane
    # increments together on the shared union walk), so they are carried as
    # per-group SMEM scalars, not (GSUB, 128) vectors — 8 fewer vregs of
    # while-carry.  Broadcast to per-ray shape happens outside the kernel.
    pid = pl.program_id(0)

    def group_inputs(g):
        s = slice(g * GSUB, (g + 1) * GSUB)
        ox, oy, oz = ox_ref[0][s], oy_ref[0][s], oz_ref[0][s]
        dx, dy, dz = dx_ref[0][s], dy_ref[0][s], dz_ref[0][s]
        # reciprocal directions (template/ray.h:19)
        return (
            ox, oy, oz, dx, dy, dz,
            1.0 / dx, 1.0 / dy, 1.0 / dz,
            mask_ref[0][s] > 0.5,
            oct_ref[g, pid],
        )

    gin = [group_inputs(g) for g in range(GROUPS)]

    prefetch = smem and PREFETCH

    def cond(c):
        steps, groups = c
        go = jnp.int32(0)
        for g in range(GROUPS):
            head = groups[g][0]
            cur = head[0] if prefetch else head
            t, u, v, slot = groups[g][1:5]
            gg = (cur >= 0).astype(jnp.int32)
            if any_hit:
                # a lane still "needs" traversal while it has no hit; derived
                # from `slot` so no extra bool carry (Mosaic layout bug with
                # i1 carries in unrolled while bodies)
                mask = gin[g][9]
                gg = gg * (jnp.sum((mask & (slot < 0)).astype(jnp.int32)) > 0).astype(jnp.int32)
            go = go + gg
        return (go > 0) & (steps < max_steps)

    def fetch_rec(node, o8):
        """The 10 scalar fields of one node from the SMEM tables."""
        return (
            aabb_ref[0, node], aabb_ref[1, node], aabb_ref[2, node],
            aabb_ref[3, node], aabb_ref[4, node], aabb_ref[5, node],
            meta_ref[0, node], meta_ref[1, node],
            links_ref[o8, 0, node], links_ref[o8, 1, node],
        )

    def group_step(g, c):
        ox, oy, oz, dx, dy, dz, rdx, rdy, rdz, mask, o8 = gin[g]
        if with_shade:
            head, t, u, v, slot, trav, test, nx, ny, nz, tu, tv, mat = c
        else:
            head, t, u, v, slot, trav, test = c
        cur = head[0] if prefetch else head
        # trav/test: per-group SCALAR step/test counters (lane-uniform)
        # safe when cur < 0 (parked): the unrolled second step may be
        # executed predicated on TPU, so reads must stay in bounds and
        # state must not advance
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        if prefetch:
            # the current node's record was prefetched by the PREVIOUS step
            (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
             lf, nrows, hit_link, miss_link) = head[1]
            is_leaf = nrows > 0
        elif smem:
            # scalar-table fetch: ~10 native SMEM loads, no rotate/extracts
            (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
             lf, nrows, hit_link, miss_link) = fetch_rec(node, o8)
            is_leaf = nrows > 0
        else:
            r = node // NODES_PER_ROW
            sub = node % NODES_PER_ROW
            row = nodes_ref[o8, pl.ds(r, 1), :]  # (1, 128)
            rec = _select_record(row, sub, NODES_PER_ROW, NODE_F)  # (1, 16)
            bminx, bminy, bminz = rec[0, F_BMIN], rec[0, F_BMIN + 1], rec[0, F_BMIN + 2]
            bmaxx, bmaxy, bmaxz = rec[0, F_BMAX], rec[0, F_BMAX + 1], rec[0, F_BMAX + 2]
            lf = rec[0, F_LF].astype(jnp.int32)
            cnt = rec[0, F_CNT].astype(jnp.int32)
            is_leaf = cnt > 0
            hit_link = rec[0, F_HIT].astype(jnp.int32)
            miss_link = rec[0, F_MISS].astype(jnp.int32)
            nrows = rec[0, F_NROWS].astype(jnp.int32)

        # broadcast slab test (infra/bvh.cpp:181-190)
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
        if any_hit:
            lane_hit = lane_hit & (slot < 0)
        n_hit = jnp.sum(lane_hit.astype(jnp.int32))
        any_lane = n_hit > 0

        trav = trav + jnp.where(active, 1, 0)

        if prefetch:
            # fetch BOTH successors now — independent of the reduce above,
            # so the SMEM latency overlaps it instead of following it
            rec_hit = fetch_rec(jnp.maximum(hit_link, 0), o8)
            rec_miss = fetch_rec(jnp.maximum(miss_link, 0), o8)

        def leaf_tests(args):
            def row_body(i, args2):
                if with_shade:
                    t, u, v, slot, test, nx, ny, nz, tu, tv, mat = args2
                    srow = shade_ref[pl.ds(lf + i, 1), :]  # (1, 128)
                else:
                    t, u, v, slot, test = args2
                trow = tris_ref[pl.ds(lf + i, 1), :]  # (1, 128)
                base_slot = (lf + i) * TRIS_PER_ROW
                for k in range(TRIS_PER_ROW):
                    lane0 = k * TRI_F
                    v0x, v0y, v0z = trow[0, lane0], trow[0, lane0 + 1], trow[0, lane0 + 2]
                    e1x, e1y, e1z = trow[0, lane0 + 3], trow[0, lane0 + 4], trow[0, lane0 + 5]
                    e2x, e2y, e2z = trow[0, lane0 + 6], trow[0, lane0 + 7], trow[0, lane0 + 8]
                    # Möller–Trumbore, broadcast tri vs ray tile
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
                        & (uu >= 0.0)
                        & (uu <= 1.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > TRI_EPS)
                        & (tt < t)
                        & mask
                    )
                    t = jnp.where(ok, tt, t)
                    if not NO_UV:
                        u = jnp.where(ok, uu, u)
                        v = jnp.where(ok, vv, v)
                    slot = jnp.where(ok, base_slot + k, slot)
                    if with_shade:
                        # interpolate shading attributes at test time using
                        # this tri's broadcast record — the winning values
                        # ride per-lane registers; no post-traversal gather
                        ww = 1.0 - uu - vv
                        sl0 = lane0
                        n0x, n0y, n0z = srow[0, sl0], srow[0, sl0 + 1], srow[0, sl0 + 2]
                        n1x, n1y, n1z = srow[0, sl0 + 3], srow[0, sl0 + 4], srow[0, sl0 + 5]
                        n2x, n2y, n2z = srow[0, sl0 + 6], srow[0, sl0 + 7], srow[0, sl0 + 8]
                        u0a, v0a = srow[0, sl0 + 9], srow[0, sl0 + 10]
                        u1a, v1a = srow[0, sl0 + 11], srow[0, sl0 + 12]
                        u2a, v2a = srow[0, sl0 + 13], srow[0, sl0 + 14]
                        m_raw = srow[0, sl0 + 15]
                        if meta_shade:
                            # lane 15 is the meta word bitcast to f32
                            m_id = (
                                jax.lax.bitcast_convert_type(m_raw, jnp.int32)
                                >> 26
                            ) & 0x3F
                        else:
                            m_id = m_raw
                        nx = jnp.where(ok, ww * n0x + uu * n1x + vv * n2x, nx)
                        ny = jnp.where(ok, ww * n0y + uu * n1y + vv * n2y, ny)
                        nz = jnp.where(ok, ww * n0z + uu * n1z + vv * n2z, nz)
                        tu = jnp.where(ok, ww * u0a + uu * u1a + vv * u2a, tu)
                        tv = jnp.where(ok, ww * v0a + uu * v1a + vv * v2a, tv)
                        mat = jnp.where(ok, m_id.astype(jnp.int32), mat)
                test = test + TRIS_PER_ROW
                if with_shade:
                    return t, u, v, slot, test, nx, ny, nz, tu, tv, mat
                return t, u, v, slot, test

            return jax.lax.fori_loop(0, nrows, row_body, args)

        do_leaf = any_lane & is_leaf & (not NO_LEAF)
        if with_shade:
            t, u, v, slot, test, nx, ny, nz, tu, tv, mat = jax.lax.cond(
                do_leaf, leaf_tests, lambda a: a,
                (t, u, v, slot, test, nx, ny, nz, tu, tv, mat),
            )
        else:
            t, u, v, slot, test = jax.lax.cond(
                do_leaf, leaf_tests, lambda a: a, (t, u, v, slot, test)
            )

        descend = any_lane & (~is_leaf)
        cur = jnp.where(active, jnp.where(descend, hit_link, miss_link), cur)
        if prefetch:
            # select the next node's record among the prefetched pair —
            # 10 scalar selects instead of a post-reduce refetch
            rec = tuple(
                jnp.where(descend, rh, rm) for rh, rm in zip(rec_hit, rec_miss)
            )
            head = (cur, rec)
        else:
            head = cur
        if with_shade:
            return head, t, u, v, slot, trav, test, nx, ny, nz, tu, tv, mat
        return head, t, u, v, slot, trav, test

    def body(c):
        # unrolled: halves/quarters while_loop bookkeeping per node step (the
        # kernel is scalar-step bound); `group_step` is a no-op on a parked
        # cursor.  Groups advance independent cursors — their scalar chains
        # interleave.  With GROUPS > 1 the group loop already provides the
        # unroll, so the explicit unroll stays at 1.
        # NOTE: the any-hit variant keeps unroll 1 — its extra `need` carry
        # trips Mosaic layout inference ("failed to legalize scf.yield")
        # when the body is unrolled on this toolchain.
        steps, groups = c
        for _ in range(1 if (any_hit or GROUPS > 1) else UNROLL):
            groups = tuple(group_step(g, groups[g]) for g in range(GROUPS))
            steps = steps + 1
        return steps, groups

    t0 = t0_ref[0]

    def group_init(g):
        s = slice(g * GSUB, (g + 1) * GSUB)
        gshape = (GSUB, 128)
        # park fully-masked-out groups immediately: wavefront callers pass
        # capacity-sized buffers whose dead tail would otherwise traverse
        # the whole tree recording nothing
        mask = gin[g][9]
        cur0 = jnp.where(jnp.sum(mask.astype(jnp.int32)) > 0, root, -1).astype(jnp.int32)
        head0 = (cur0, fetch_rec(jnp.int32(root), gin[g][10])) if prefetch else cur0
        init = (
            head0,
            t0[s],
            jnp.zeros(gshape, jnp.float32),
            jnp.zeros(gshape, jnp.float32),
            jnp.full(gshape, -1, jnp.int32),
            jnp.int32(0),  # trav: scalar steps counter
            jnp.int32(0),  # test: scalar tri-test counter
        )
        if with_shade:
            init = init + (
                jnp.zeros(gshape, jnp.float32),
                jnp.zeros(gshape, jnp.float32),
                jnp.zeros(gshape, jnp.float32),
                jnp.zeros(gshape, jnp.float32),
                jnp.zeros(gshape, jnp.float32),
                jnp.full(gshape, -1, jnp.int32),
            )
        return init

    carry = (jnp.int32(0), tuple(group_init(g) for g in range(GROUPS)))
    steps, groups = jax.lax.while_loop(cond, body, carry)
    for g in range(GROUPS):
        s = slice(g * GSUB, (g + 1) * GSUB)
        _, t, u, v, slot, trav, test = groups[g][:7]
        t_ref[0, s, :] = t
        u_ref[0, s, :] = u
        v_ref[0, s, :] = v
        slot_ref[0, s, :] = slot
        trav_ref[g, pid] = trav
        test_ref[g, pid] = test
        if with_shade:
            nx, ny, nz, tu, tv, mat = groups[g][7:]
            nx_ref[0, s, :] = nx
            ny_ref[0, s, :] = ny
            nz_ref[0, s, :] = nz
            tu_ref[0, s, :] = tu
            tv_ref[0, s, :] = tv
            mat_ref[0, s, :] = mat


def _kernel_stack(
    oct_ref,  # SMEM [G, T] i32 per-cursor-group octant (group-major)
    ox_ref, oy_ref, oz_ref,  # VMEM [8,128] blocks per tile
    dx_ref, dy_ref, dz_ref,
    t0_ref, mask_ref,
    aabb_ref, meta_ref, nf_ref,  # SMEM node tables (nf = per-octant near/far)
    tris_ref,
    t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref,
    stack_ref,  # SMEM scratch [G, STACK_CAP] deferred far-child stack
    *,
    roots: tuple,
    any_hit: bool,
    max_steps: int,
):
    """Ordered two-child descent with a per-group SMEM stack (CRT_STACK=1).

    Each step handles one INTERIOR node: both its octant-ordered children
    are slab-tested against the tile and decided by a single packed reduce
    (near-hit count in bits 0:16, far in 16:32).  Leaf children run their
    triangle rows inline; interior hits descend near-first, the far child
    deferred on the stack — the ordered traversal of the reference
    (infra/bvh.cpp:224-258) vectorised per packet.  One reduce covers two
    nodes, vs one per visited node on the threaded-link walk.

    Forests (`roots` longer than 1, e.g. the per-instance grid/KD cell
    trees chained under a TLAS layout) seed the stack with roots[1:] —
    exactly the chaining the link walk encodes in its threaded miss links.
    """
    pid = pl.program_id(0)

    def group_inputs(g):
        s = slice(g * GSUB, (g + 1) * GSUB)
        ox, oy, oz = ox_ref[0][s], oy_ref[0][s], oz_ref[0][s]
        dx, dy, dz = dx_ref[0][s], dy_ref[0][s], dz_ref[0][s]
        return (
            ox, oy, oz, dx, dy, dz,
            1.0 / dx, 1.0 / dy, 1.0 / dz,
            mask_ref[0][s] > 0.5,
            oct_ref[g, pid],
        )

    gin = [group_inputs(g) for g in range(GROUPS)]

    def cond(c):
        steps, groups = c
        go = jnp.int32(0)
        for g in range(GROUPS):
            cur = groups[g][0]
            slot = groups[g][5]
            gg = (cur >= 0).astype(jnp.int32)
            if any_hit:
                mask = gin[g][9]
                gg = gg * (jnp.sum((mask & (slot < 0)).astype(jnp.int32)) > 0).astype(jnp.int32)
            go = go + gg
        return (go > 0) & (steps < max_steps)

    def fetch8(node):
        """aabb + (leaf row, nrows) of one node — no links on this walk."""
        return (
            aabb_ref[0, node], aabb_ref[1, node], aabb_ref[2, node],
            aabb_ref[3, node], aabb_ref[4, node], aabb_ref[5, node],
            meta_ref[0, node], meta_ref[1, node],
        )

    def leaf_tests_for(g):
        """MT row loop over [lf, lf+nrows) for cursor group g."""
        ox, oy, oz, dx, dy, dz = gin[g][:6]
        mask = gin[g][9]

        def leaf_tests(lf, nrows, args):
            def row_body(i, args2):
                t, u, v, slot, test = args2
                trow = tris_ref[pl.ds(lf + i, 1), :]  # (1, 128)
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
                        & (uu >= 0.0)
                        & (uu <= 1.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > TRI_EPS)
                        & (tt < t)
                        & mask
                    )
                    t = jnp.where(ok, tt, t)
                    if not NO_UV:
                        u = jnp.where(ok, uu, u)
                        v = jnp.where(ok, vv, v)
                    slot = jnp.where(ok, base_slot + k, slot)
                test = test + TRIS_PER_ROW
                return t, u, v, slot, test

            return jax.lax.fori_loop(0, nrows, row_body, args)

        return leaf_tests

    def group_step(g, c):
        ox, oy, oz, dx, dy, dz, rdx, rdy, rdz, mask, o8 = gin[g]
        head, sp, t, u, v, slot, trav, test = c
        # predicated-safe when parked (cur < 0): reads stay in bounds and
        # state does not advance
        cur = head
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        near = nf_ref[o8, 0, node]
        far = nf_ref[o8, 1, node]
        # interior nodes always have both children; parked cursors read
        # node 0 (root, interior on this path) harmlessly
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
            h = (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & mask & active
            if any_hit:
                h = h & (slot < 0)
            return h

        hitN = slab(nrec)
        hitF = slab(frec)
        # ONE vector->scalar reduce decides BOTH children (lane counts fit
        # 16 bits: tiles are <= 8192 rays)
        packed = jnp.sum(hitN.astype(jnp.int32) + (hitF.astype(jnp.int32) << 16))
        leaf_tests = leaf_tests_for(g)
        anyN = (packed & 0xFFFF) > 0
        anyF = packed >= (1 << 16)
        leafN = nrec[7] > 0
        leafF = frec[7] > 0

        args = (t, u, v, slot, test)
        args = jax.lax.cond(
            anyN & leafN & (not NO_LEAF),
            lambda a: leaf_tests(nrec[6], nrec[7], a), lambda a: a, args,
        )
        args = jax.lax.cond(
            anyF & leafF & (not NO_LEAF),
            lambda a: leaf_tests(frec[6], frec[7], a), lambda a: a, args,
        )
        t, u, v, slot, test = args

        goN = anyN & (~leafN) & active
        goF = anyF & (~leafF) & active
        both = goN & goF

        @pl.when(both)
        def _push():
            stack_ref[g, sp] = far

        sp2 = sp + both.astype(jnp.int32)
        pop_val = jnp.where(
            sp2 > 0, stack_ref[g, jnp.maximum(sp2 - 1, 0)], jnp.int32(-1)
        )
        nxt = jnp.where(goN, near, jnp.where(goF, far, pop_val))
        sp3 = jnp.where(goN | goF, sp2, jnp.maximum(sp2 - 1, 0))
        head = jnp.where(active, nxt, cur)
        sp = jnp.where(active, sp3, sp)
        trav = trav + jnp.where(active, 1, 0)
        return head, sp, t, u, v, slot, trav, test

    def body(c):
        # unrolled like the link walk: group_step is a no-op on a parked
        # cursor, so running two steps per while iteration only halves the
        # cond-evaluation bookkeeping
        steps, groups = c
        for _ in range(1 if (any_hit or GROUPS > 1) else UNROLL):
            groups = tuple(group_step(g, groups[g]) for g in range(GROUPS))
            steps = steps + 1
        return steps, groups

    t0 = t0_ref[0]

    def group_init(g):
        s = slice(g * GSUB, (g + 1) * GSUB)
        gshape = (GSUB, 128)
        mask = gin[g][9]
        o8 = gin[g][10]
        cur0 = jnp.where(
            jnp.sum(mask.astype(jnp.int32)) > 0, roots[0], -1
        ).astype(jnp.int32)
        # forest: remaining roots pre-pushed (popped in order once the
        # first tree's walk drains)
        for i, rt in enumerate(roots[1:]):
            stack_ref[g, i] = jnp.int32(rt)
        return (
            cur0,
            jnp.int32(len(roots) - 1),  # stack pointer
            t0[s],
            jnp.zeros(gshape, jnp.float32),
            jnp.zeros(gshape, jnp.float32),
            jnp.full(gshape, -1, jnp.int32),
            jnp.int32(0),  # trav: interior steps (stats; link walk counts visits)
            jnp.int32(0),  # test: tri-test counter
        )

    carry = (jnp.int32(0), tuple(group_init(g) for g in range(GROUPS)))
    steps, groups = jax.lax.while_loop(cond, body, carry)
    for g in range(GROUPS):
        s = slice(g * GSUB, (g + 1) * GSUB)
        _, _, t, u, v, slot, trav, test = groups[g][:8]
        t_ref[0, s, :] = t
        u_ref[0, s, :] = u
        v_ref[0, s, :] = v
        slot_ref[0, s, :] = slot
        trav_ref[g, pid] = trav
        test_ref[g, pid] = test


def _tile_arrays(x: jnp.ndarray, n_tiles: int):
    return x.reshape(n_tiles, *TILE_SHAPE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "any_hit", "interpret", "root", "max_steps", "with_shade", "meta_shade",
        "stack", "roots",
    ),
)
def _run(
    oct_per_tile,
    comps,
    node_rows,
    tri_rows,
    shade_rows,
    root: int,
    any_hit: bool,
    max_steps: int,
    interpret: bool,
    with_shade: bool,
    meta_shade: bool = False,
    stack: bool = False,
    roots: tuple = (),
):
    n_tiles = oct_per_tile.shape[1]
    tile_spec = pl.BlockSpec((1, *TILE_SHAPE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = lambda ndim: pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.int32)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # per-(tile, group) scalars are laid out [G, n_tiles] (group-MAJOR):
    # SMEM pads every ROW to 512 B, so the tile-major [n_tiles, G] layout
    # grew linearly with the grid (452 KB at 900 tiles — SMEM OOM on
    # megabatches); group-major pads G rows total regardless of grid size
    stat = jax.ShapeDtypeStruct((max(GROUPS, 1), n_tiles), jnp.int32)
    out_shapes = [f32, f32, f32, i32, stat, stat]  # t u v slot traversed tested
    out_specs = [tile_spec] * 4 + [smem_spec] * 2
    extra_in = []
    smem = isinstance(node_rows, tuple)
    in_specs = [
        smem_spec,  # octants [G, n_tiles]
        *[tile_spec] * 8,  # ox..mask
        *([smem_spec] * 3 if smem else [full(3)]),  # node tables
        full(2),  # tris
    ]
    node_in = node_rows if smem else (node_rows,)
    if with_shade:
        out_shapes += [f32, f32, f32, f32, f32, i32]  # nx ny nz tu tv mat
        out_specs += [tile_spec] * 6
        extra_in = [shade_rows]
        in_specs.append(full(2))
    if stack:
        # node_rows is (aabb, meta2, nearfar); same SMEM specs as the link
        # tables.  The deferred-far stack is SMEM scratch.
        kernel = functools.partial(
            _kernel_stack, roots=roots or (root,), any_hit=any_hit,
            max_steps=max_steps,
        )
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.SMEM((max(GROUPS, 1), STACK_CAP), jnp.int32)],
            interpret=interpret,
        )(oct_per_tile, *comps, *node_in, tri_rows, *extra_in)
    kernel = functools.partial(
        _kernel, root=root, any_hit=any_hit, max_steps=max_steps,
        with_shade=with_shade, smem=smem, meta_shade=meta_shade,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(oct_per_tile, *comps, *node_in, tri_rows, *extra_in)


def traverse(
    pk: PackedBVH,
    tris,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Same contract as ops.traverse_bvh.traverse, via the packet kernel.

    `tris` is the TrianglePool (for obj/mat id recovery).  `mask` marks live
    rays (dead lanes neither traverse nor hit).
    """
    r = o.shape[0]
    n_tiles = max((r + TILE - 1) // TILE, 1)
    pad = n_tiles * TILE - r

    def pad1(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    ox = pad1(o[:, 0], 0.0)
    oy = pad1(o[:, 1], 0.0)
    oz = pad1(o[:, 2], 0.0)
    dx = pad1(d[:, 0], 1.0)
    dy = pad1(d[:, 1], 1.0)
    dz = pad1(d[:, 2], 1.0)
    t0p = pad1(t0, 0.0)
    if mask is None:
        mask = jnp.ones((r,), jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    maskp = pad1(mask, 0.0)

    # per-cursor-group majority octant (cheap: bincount over 8 buckets)
    oct_ray = (
        (dx < 0).astype(jnp.int32)
        + 2 * (dy < 0).astype(jnp.int32)
        + 4 * (dz < 0).astype(jnp.int32)
    ).reshape(n_tiles, GROUPS, TILE // GROUPS)
    onehot = jax.nn.one_hot(oct_ray, 8, dtype=jnp.int32)  # [T, G, TILE/G, 8]
    counts = jnp.sum(
        onehot * maskp.reshape(n_tiles, GROUPS, TILE // GROUPS, 1).astype(jnp.int32),
        axis=2,
    )
    oct_tile = jnp.argmax(counts, axis=-1).astype(jnp.int32)  # [T, G]

    comps = [
        _tile_arrays(x, n_tiles) for x in (ox, oy, oz, dx, dy, dz, t0p, maskp)
    ]
    max_steps = 4 * pk.num_nodes + 16
    # in-kernel attribute interpolation is opt-in (measured net-negative:
    # +6 vector carries); the shading rows themselves are always packed so
    # the post-kernel fused ids+shade gather works either way
    with_shade = (
        KERNEL_SHADE and pk.tri_shade_rows is not None and not any_hit
    )
    # prefer the SMEM scalar-table fetch (no rotate/extract chain) when the
    # tables fit the SMEM budget; fall back to VMEM rows for huge scenes
    use_smem = (
        SMEM_NODES
        and pk.node_aabb is not None
        and pk.num_nodes * 96 <= SMEM_BUDGET
    )
    # SMEM-stack ordered descent: needs the near/far table, a known tree
    # depth within the stack capacity, and a root that is interior
    use_stack = (
        _want_stack(pk)
        and use_smem
        and pk.node_nearfar is not None
        and not with_shade
        and pk.num_nodes >= 3
        and 0 < pk.stack_depth <= STACK_CAP
    )
    if use_stack:
        node_in = (pk.node_aabb, pk.node_meta2, pk.node_nearfar)
    elif use_smem:
        node_in = (pk.node_aabb, pk.node_meta2, pk.node_links)
    else:
        node_in = pk.node_rows
    outs = _run(
        oct_tile.T,
        tuple(comps),
        node_in,
        pk.tri_rows,
        pk.tri_shade_rows if with_shade else pk.tri_rows,
        root=pk.root,
        any_hit=any_hit,
        max_steps=max_steps,
        interpret=interpret,
        with_shade=with_shade and not use_stack,
        meta_shade=pk.meta_in_shade,
        stack=use_stack,
        roots=pk.stack_roots if use_stack else (),
    )
    t, u, v, slot, trav, test = outs[:6]

    def unpad(x):
        return x.reshape(-1)[:r]

    def bstat(x):
        # (n_tiles, GROUPS) scalar stats -> per-ray, masked like the old
        # per-lane counters (dead lanes report 0)
        per_ray = jnp.repeat(x.T.reshape(-1), TILE // max(GROUPS, 1))
        return jnp.where(maskp > 0.5, per_ray, 0).reshape(-1)[:r]

    t = unpad(t)
    u = unpad(u)
    v = unpad(v)
    slot = unpad(slot)
    res = dict(
        t=t,
        bary=jnp.stack([u, v], axis=-1),
        traversed=bstat(trav),
        tested=bstat(test),
    )
    if any_hit:
        # occlusion queries need only the hit FLAG: pad triangles are
        # degenerate and never win, so slot >= 0 already means "real hit" —
        # skip the per-ray slot_meta gather entirely
        res["tri_idx"] = jnp.where(slot >= 0, 0, -1)
        res["obj_id"] = jnp.full_like(slot, -1)
        res["mat_id"] = jnp.full_like(slot, -1)
        return res
    if with_shade:
        nx, ny, nz, tu, tv, mat = outs[6:]
        # normal normalized here (reference normalizes after the lerp,
        # blas_bvh.cpp:391-398); back-face flip happens in get_hit_info
        n = jnp.stack([unpad(nx), unpad(ny), unpad(nz)], axis=-1)
        sq = jnp.sum(n * n, axis=-1, keepdims=True)
        n = n * jax.lax.rsqrt(jnp.maximum(sq, 1e-20))
        res["shade_normal"] = n
        res["shade_uv"] = jnp.stack([unpad(tu), unpad(tv)], axis=-1)
        mat_id = unpad(mat)
    if pk.meta_in_shade and not with_shade and pk.tri_shade_rows is not None:
        # ONE [R, 16] gather recovers the hit ids (meta bitcast in lane 15)
        # AND the shading record (lanes 0:15) — replaces the separate
        # slot_meta gather + the post-traversal shade-record gather
        rec = pk.tri_shade_rows.reshape(-1, TRI_F)[jnp.maximum(slot, 0)]
        meta = jax.lax.bitcast_convert_type(rec[..., 15], jnp.int32)
        found = (slot >= 0) & (meta >= 0)
        tri_idx = jnp.where(found, meta & 0xFFFFF, -1)
        obj_id = jnp.where(found, (meta >> 20) & 0x3F, -1)
        mat_id = jnp.where(found, (meta >> 26) & 0x3F, -1)
        res["shade_rec"] = rec  # n0 n1 n2 (0:9), uv0 uv1 uv2 (9:15)
    elif pk.slot_meta is not None:
        meta = pk.slot_meta[jnp.maximum(slot, 0)]
        found = (slot >= 0) & (meta >= 0)
        tri_idx = jnp.where(found, meta & 0xFFFFF, -1)
        obj_id = jnp.where(found, (meta >> 20) & 0x3F, -1)
        if not with_shade:
            mat_id = jnp.where(found, (meta >> 26) & 0x3F, -1)
    else:
        tri_idx = jnp.where(slot >= 0, pk.slot_tri[jnp.maximum(slot, 0)], -1)
        found = tri_idx >= 0
        tri_safe = jnp.maximum(tri_idx, 0)
        obj_id = jnp.where(found, tris.obj_id[tri_safe], -1)
        if not with_shade:
            mat_id = jnp.where(found, tris.mat_id[tri_safe], -1)
    res["tri_idx"] = tri_idx
    res["obj_id"] = obj_id
    res["mat_id"] = mat_id
    return res


def traverse_sorted(
    pk: PackedBVH,
    tris,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    spatial: bool = True,
    traverse_fn=None,
):
    """traverse() behind a stable octant sort of the ray batch.

    `traverse_fn` lets other packet kernels (wide_bvh) reuse the sort —
    `pk` then is whatever packed structure that kernel takes (it only needs
    `world_min`/`world_max` here).

    Bounce rays are incoherent: a mixed-octant tile visits the union of
    nodes its rays need with a single traversal order.  Sorting by
    (dead-last, direction octant) groups rays into direction-coherent tiles
    and parks terminated lanes together in tiles that exit immediately —
    free compaction.  The two argsorts are O(R log R) device sorts, far
    cheaper than the traversal they accelerate.
    """
    r = o.shape[0]
    if mask is None:
        mask = jnp.ones((r,), jnp.bool_)
    oct_ = ray_octants(d)
    if spatial:
        # (dead, origin Morton code, [direction bits], octant) sort key:
        # bounce rays are incoherent in BOTH origin and direction; packet
        # tiles built from origin-local, direction-similar rays visit far
        # smaller node unions.  Costs one 32-bit argsort (device sort),
        # repaid severalfold in traversal time on bounces >= 1.
        # CRT_SORT_DIRBITS=n (0-2) additionally quantizes |direction| to n
        # bits/axis between the position Morton and the octant — 6D binning
        # for small-block kernels where direction spread dominates unions.
        dirbits = int(_os.environ.get("CRT_SORT_DIRBITS", "0"))
        wmin = jnp.asarray(pk.world_min, jnp.float32)
        wext = jnp.asarray(pk.world_max, jnp.float32) - wmin
        q = jnp.clip(
            ((o - wmin) / jnp.maximum(wext, 1e-20)) * 127.0, 0.0, 127.0
        ).astype(jnp.int32)  # 7 bits per axis

        def spread3(v):
            # interleave 7-bit value into every 3rd bit
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        morton = spread3(q[..., 0]) | (spread3(q[..., 1]) << 1) | (spread3(q[..., 2]) << 2)
        key = (morton << 3) | oct_
        if dirbits > 0:
            lim = (1 << dirbits) - 1
            qd = jnp.clip((jnp.abs(d) * (lim + 1)), 0, lim).astype(jnp.int32)
            dm = spread3(qd[..., 0]) | (spread3(qd[..., 1]) << 1) | (spread3(qd[..., 2]) << 2)
            key = (morton << (3 + 3 * dirbits)) | (dm << 3) | oct_
        key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))  # dead rays last
        perm = jnp.argsort(key)
        pos = jnp.zeros((r,), jnp.int32).at[perm].set(jnp.arange(r, dtype=jnp.int32), unique_indices=True)
    else:
        key = jnp.where(mask, oct_, 8)  # dead rays last
        # stable counting sort over 9 buckets (cheaper than a full argsort):
        # pos[i] = bucket_start[key[i]] + rank-within-bucket — which is also
        # the inverse permutation, so only one scatter is needed.
        oh = jax.nn.one_hot(key, 9, dtype=jnp.int32)
        within = jnp.cumsum(oh, axis=0) - oh
        counts = within[-1] + oh[-1]
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        pos = jnp.sum(oh * (starts[None, :] + within), axis=1)  # [R] inverse perm
        perm = jnp.zeros((r,), jnp.int32).at[pos].set(jnp.arange(r, dtype=jnp.int32), unique_indices=True)
    if traverse_fn is None:
        traverse_fn = traverse
    res = traverse_fn(
        pk,
        tris,
        o[perm],
        d[perm],
        t0[perm],
        mask=mask[perm],
        any_hit=any_hit,
        interpret=interpret,
    )
    return {k: v[pos] for k, v in res.items()}
