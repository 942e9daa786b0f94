"""Pallas TPU wide (8-ary) packet BVH traversal.

Successor to the binary packet kernel (packet_bvh.py), attacking its measured
bottleneck: the per-node SCALAR dependency chain.  The binary kernel pays one
dynamic-sublane fetch + `pltpu.roll` + ~10 vector->scalar extracts + one link
branch per binary node (~200 ns); this kernel pays one fetch per EIGHT child
AABBs:

  * one wide node = one 128-lane row = 8 children at STATIC lane offsets —
    no roll, no dynamic-lane selects;
  * child metadata (leaf flag, tri-row/child pointers) comes from an SMEM
    int32 table — scalar loads, not vector->scalar transfers;
  * traversal is an explicit stack in SMEM scratch (near-first push order per
    ray-direction octant, precomputed at pack time), popping one wide node
    per loop step;
  * leaf hits run the same unconditional 8-triangle Möller–Trumbore rows as
    the binary kernel (`fori_loop` with a data-dependent trip count — zero
    rows for interior/missed children costs one branch).

Versus binary traversal of the same frontier: expanding a subtree 3 levels
deep tests 8 boxes here vs 14 (2+4+8) there, with 1 scalar step vs 7.

Traversal contract and leaf-row layout are shared with packet_bvh (the
reference's interchangeable-accelerator property, infra/bvh.cpp:224-258 is
the hot loop being replaced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.accel.wide import (
    CHILD_F,
    META_NROWS_SHIFT,
    META_PTR_MASK,
    WIDE,
    PackedWideBVH,
)
from cpu_ray_tracer_tpu.accel.pack import TRI_F, TRIS_PER_ROW
from cpu_ray_tracer_tpu.ops.pallas import packet_bvh

TILE = packet_bvh.TILE
TILE_SHAPE = packet_bvh.TILE_SHAPE
TRI_EPS = constants.TRI_EPS


def _kernel(
    oct_ref,  # SMEM [T] i32 per-tile octant
    meta_ref,  # SMEM [8 * W * 8] i32 child metadata
    ox_ref, oy_ref, oz_ref,  # VMEM [tile] blocks
    dx_ref, dy_ref, dz_ref,
    t0_ref, mask_ref,
    nodes_ref,  # VMEM [8, W, 128] full
    tris_ref,  # VMEM [Rt, 128] full
    t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref,  # outputs
    stack_ref,  # SMEM scratch [max_stack] i32
    *,
    num_wide: int,
    any_hit: bool,
    max_steps: int,
):
    pid = pl.program_id(0)
    o8 = oct_ref[pid]

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    rdx = 1.0 / dx
    rdy = 1.0 / dy
    rdz = 1.0 / dz
    mask = mask_ref[0] > 0.5

    def cond(c):
        sp, t, u, v, slot, trav, test, steps = c
        go = (sp > 0) & (steps < max_steps)
        if any_hit:
            go = go & (jnp.sum((mask & (slot < 0)).astype(jnp.int32)) > 0)
        return go

    def step(c):
        sp, t, u, v, slot, trav, test, steps = c
        sp = sp - 1
        cur = stack_ref[sp]
        row = nodes_ref[o8, pl.ds(cur, 1), :]  # (1, 128): 8 child AABBs
        base = (o8 * num_wide + cur) * WIDE
        trav = trav + jnp.where(mask, 1, 0)

        metas = []
        hit_any = []
        for k in range(WIDE):
            L = k * CHILD_F
            bminx, bminy, bminz = row[0, L], row[0, L + 1], row[0, L + 2]
            bmaxx, bmaxy, bmaxz = row[0, L + 3], row[0, L + 4], row[0, L + 5]
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
            lane_hit = (tmax >= tmin) & (tmin < t) & (tmax > 0.0) & mask
            if any_hit:
                lane_hit = lane_hit & (slot < 0)
            metas.append(meta_ref[base + k])
            hit_any.append(jnp.sum(lane_hit.astype(jnp.int32)) > 0)

        # leaf triangle rows, near->far (children are pre-sorted per octant)
        for k in range(WIDE):
            nrows_k = metas[k] >> META_NROWS_SHIFT  # 0 for interior/empty
            ptr_k = metas[k] & META_PTR_MASK
            eff = jnp.where(hit_any[k], nrows_k, 0)

            def row_body(i, a, ptr=ptr_k):
                t, u, v, slot, test = a
                trow = tris_ref[pl.ds(ptr + i, 1), :]  # (1, 128)
                base_slot = (ptr + i) * TRIS_PER_ROW
                for kk in range(TRIS_PER_ROW):
                    lane0 = kk * TRI_F
                    v0x, v0y, v0z = trow[0, lane0], trow[0, lane0 + 1], trow[0, lane0 + 2]
                    e1x, e1y, e1z = trow[0, lane0 + 3], trow[0, lane0 + 4], trow[0, lane0 + 5]
                    e2x, e2y, e2z = trow[0, lane0 + 6], trow[0, lane0 + 7], trow[0, lane0 + 8]
                    # Möller–Trumbore, broadcast tri vs ray tile
                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a_ = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / jnp.where(jnp.abs(a_) < 1e-30, 1e-30, a_)
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
                        (jnp.abs(a_) >= TRI_EPS)
                        & (uu >= 0.0)
                        & (uu <= 1.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > TRI_EPS)
                        & (tt < t)
                        & mask
                    )
                    t = jnp.where(ok, tt, t)
                    u = jnp.where(ok, uu, u)
                    v = jnp.where(ok, vv, v)
                    slot = jnp.where(ok, base_slot + kk, slot)
                test = test + jnp.where(mask, TRIS_PER_ROW, 0)
                return t, u, v, slot, test

            t, u, v, slot, test = jax.lax.fori_loop(0, eff, row_body, (t, u, v, slot, test))

        # push interior hits far->near so the near child pops first; the
        # write below sp's final position is garbage that either gets
        # overwritten by a later push or never read
        for k in reversed(range(WIDE)):
            # meta == 0 is the EMPTY sentinel (root is wide row 0 and never a
            # child, so real interior metas are >= 1; leaves have nrows bits)
            is_interior = ((metas[k] >> META_NROWS_SHIFT) == 0) & (metas[k] > 0)
            push = hit_any[k] & is_interior
            stack_ref[sp] = metas[k] & META_PTR_MASK
            sp = sp + push.astype(jnp.int32)

        return sp, t, u, v, slot, trav, test, steps + 1

    stack_ref[0] = jnp.int32(0)  # root wide node is row 0
    t0 = t0_ref[0]
    init = (
        jnp.int32(1),
        t0,
        jnp.zeros(TILE_SHAPE, jnp.float32),
        jnp.zeros(TILE_SHAPE, jnp.float32),
        jnp.full(TILE_SHAPE, -1, jnp.int32),
        jnp.zeros(TILE_SHAPE, jnp.int32),
        jnp.zeros(TILE_SHAPE, jnp.int32),
        jnp.int32(0),
    )
    sp, t, u, v, slot, trav, test, steps = jax.lax.while_loop(cond, step, init)
    t_ref[0] = t
    u_ref[0] = u
    v_ref[0] = v
    slot_ref[0] = slot
    trav_ref[0] = trav
    test_ref[0] = test


@functools.partial(
    jax.jit,
    static_argnames=("num_wide", "any_hit", "max_steps", "max_stack", "interpret"),
)
def _run(
    oct_per_tile,
    meta,
    comps,
    node_rows,
    tri_rows,
    num_wide: int,
    any_hit: bool,
    max_steps: int,
    max_stack: int,
    interpret: bool,
):
    n_tiles = oct_per_tile.shape[0]
    tile_spec = pl.BlockSpec((1, *TILE_SHAPE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.int32)
    out_shapes = [f32, f32, f32, i32, i32, i32]  # t u v slot traversed tested
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # octants
        pl.BlockSpec(memory_space=pltpu.SMEM),  # child metadata
        *[tile_spec] * 8,  # ox..mask
        pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes (full)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tris (full)
    ]
    kernel = functools.partial(
        _kernel, num_wide=num_wide, any_hit=any_hit, max_steps=max_steps
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=[tile_spec] * len(out_shapes),
        scratch_shapes=[pltpu.SMEM((max_stack,), jnp.int32)],
        interpret=interpret,
    )(oct_per_tile, meta, *comps, node_rows, tri_rows)


def traverse(
    pk: PackedWideBVH,
    tris,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Same contract as ops.traverse_bvh.traverse / packet_bvh.traverse."""
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

    # per-tile majority octant over live rays
    oct_ray = (
        (dx < 0).astype(jnp.int32)
        + 2 * (dy < 0).astype(jnp.int32)
        + 4 * (dz < 0).astype(jnp.int32)
    ).reshape(n_tiles, TILE)
    onehot = jax.nn.one_hot(oct_ray, 8, dtype=jnp.int32)
    counts = jnp.sum(onehot * maskp.reshape(n_tiles, TILE, 1).astype(jnp.int32), axis=1)
    oct_tile = jnp.argmax(counts, axis=-1).astype(jnp.int32)

    comps = tuple(
        x.reshape(n_tiles, *TILE_SHAPE) for x in (ox, oy, oz, dx, dy, dz, t0p, maskp)
    )
    outs = _run(
        oct_tile,
        pk.meta,
        comps,
        pk.node_rows,
        pk.tri_rows,
        num_wide=pk.num_wide,
        any_hit=any_hit,
        max_steps=pk.num_wide + 8,  # each wide node is pushed at most once
        max_stack=pk.max_stack,
        interpret=interpret,
    )
    t, u, v, slot, trav, test = outs

    def unpad(x):
        return x.reshape(-1)[:r]

    t = unpad(t)
    slot = unpad(slot)
    res = dict(
        t=t,
        bary=jnp.stack([unpad(u), unpad(v)], axis=-1),
        traversed=unpad(trav),
        tested=unpad(test),
    )
    if pk.slot_meta is not None:
        meta = pk.slot_meta[jnp.maximum(slot, 0)]
        found = (slot >= 0) & (meta >= 0)
        tri_idx = jnp.where(found, meta & 0xFFFFF, -1)
        obj_id = jnp.where(found, (meta >> 20) & 0x3F, -1)
        mat_id = jnp.where(found, (meta >> 26) & 0x3F, -1)
    else:
        tri_idx = jnp.where(slot >= 0, pk.slot_tri[jnp.maximum(slot, 0)], -1)
        found = tri_idx >= 0
        tri_safe = jnp.maximum(tri_idx, 0)
        obj_id = jnp.where(found, tris.obj_id[tri_safe], -1)
        mat_id = jnp.where(found, tris.mat_id[tri_safe], -1)
    res["tri_idx"] = tri_idx
    res["obj_id"] = obj_id
    res["mat_id"] = mat_id
    return res


def traverse_sorted(
    pk: PackedWideBVH,
    tris,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    spatial: bool = True,
):
    """traverse() behind the shared (dead-last, Morton, octant) ray sort."""
    return packet_bvh.traverse_sorted(
        pk, tris, o, d, t0,
        mask=mask, any_hit=any_hit, interpret=interpret, spatial=spatial,
        traverse_fn=traverse,
    )
