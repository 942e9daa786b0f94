"""Pallas TPU sublane-wide packet BVH traversal.

Third-generation traversal kernel (after packet_bvh and wide_bvh), built on
the measured costs of both:

* packet_bvh (binary, whole-tile): one scalar cursor serves 1024-8192 rays;
  incoherent tiles visit near-whole-tree node unions and test every leaf row
  against every lane — vector work scales with |union(tile)| x tile vregs.
* wide_bvh (8-ary, whole-tile): one fetch delivers 8 child boxes, but each
  child's slab test runs over the whole tile: 8x the vector work per step —
  measured vector-bound on v5e.

Here the 8 children ride the 8 SUBLANES and 128 rays ride the lanes:

  * a node fetch is one dynamic-sublane slice `nodes[8w : 8w+8, :]` whose
    row k holds child k's bmin/bmax at static lanes 0:6 — one (8, 128)-vreg
    op set slab-tests 8 boxes x 128 rays (the per-child cost of wide_bvh
    divided by 8);
  * leaf rows are transposed the same way (8 triangles on sublanes): one
    ~45-op vreg sequence Möller-Trumbores 8 triangles x 128 rays, with
    per-sublane running best (t, u, v, slot) merged once at the end;
  * the ray working set is a 128-ray BLOCK — after the production
    (dead, Morton, octant) sort, 128-ray unions are far smaller than
    8192-ray unions, which is where incoherent-bounce time goes;
  * B blocks per program advance round-robin in one while loop so their
    independent scalar chains (SMEM stack pop, meta decode, pushes)
    overlap each other's vector work.

Child decisions cost ONE vector->scalar transfer per step: the 8 per-child
hit bits are reduced to a single bitmask scalar (sum of 1<<k over hitting
sublanes); all per-child control (leaf row loops, far-to-near pushes) then
runs on scalar ALU against the SMEM meta table (near-first order per ray
octant, accel/wide.py pack_sublane_host).

Replaces the reference hot loop infra/bvh.cpp:224-258 like its siblings;
same find_nearest contract and slot/meta decode.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.accel.wide import (
    SUB_META_K_SHIFT,
    SUB_META_NROWS_MASK,
    SUB_META_NROWS_SHIFT,
    SUB_META_PTR_MASK,
    SUB_META_VALID,
    PackedSublaneBVH,
)
from cpu_ray_tracer_tpu.ops.pallas import packet_bvh

TRI_EPS = constants.TRI_EPS
BLOCK = 128  # rays per cursor block (one lane row)
NBLOCKS = int(_os.environ.get("CRT_SUBLANE_BLOCKS", "8"))  # blocks per program
TILE = BLOCK * NBLOCKS
# nodes popped per scalar sync: the per-step cost is the vector->scalar
# transfer latency (~1us measured end-to-end), so K nodes per sync divides
# it; K slab tests are cheap (8,128)-vreg work.  K=4 packs the 4 per-node
# 8-bit hitmasks as 4-bit nibbles into TWO 16-bit scalars (sublanes 0-3 /
# 4-7) — two back-to-back reads after one pipeline drain.
POP = int(_os.environ.get("CRT_SUBLANE_POP", "4"))
if not 1 <= POP <= 4:
    raise ValueError("CRT_SUBLANE_POP must be 1-4 (4-bit nibble packing)")


def _kernel(
    oct_ref,  # SMEM [T, B] i32 per-block octant
    meta_ref,  # SMEM [8 * W * 8] i32
    leaf_start_ref,  # SMEM [W] i32
    leaf_rows_ref,  # SMEM [W] i32
    leaf_kmask_ref,  # SMEM [W] i32
    ox_ref, oy_ref, oz_ref,  # VMEM [1, B, 128] blocks
    dx_ref, dy_ref, dz_ref,
    t0_ref, mask_ref,
    nodes_ref,  # VMEM [W*8, 128] full
    tris_ref,  # VMEM [Rt*8, 128] full
    t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref,  # outputs [1, B, 128]
    stack_ref,  # SMEM scratch [B, max_stack] i32
    *,
    num_wide: int,
    any_hit: bool,
    max_steps: int,
):
    pid = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # nibble weights: per-node 4-bit hit nibbles packed into two 16-bit
    # scalars (sublanes 0-3 -> s_lo, 4-7 -> s_hi)
    nib_lo = jnp.where(sub_iota < 4, jnp.int32(1) << (4 * sub_iota), 0)
    nib_hi = jnp.where(sub_iota >= 4, jnp.int32(1) << (4 * (sub_iota - 4)), 0)

    # blocks run SEQUENTIALLY to completion: round-robin lockstep pays
    # max(steps) x NBLOCKS (the step-count tail is heavy: p95 ~6x mean);
    # sequential pays sum(steps)
    for b in range(NBLOCKS):
        s = slice(b, b + 1)
        ox, oy, oz = ox_ref[0][s], oy_ref[0][s], oz_ref[0][s]
        dx, dy, dz = dx_ref[0][s], dy_ref[0][s], dz_ref[0][s]
        rdx, rdy, rdz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        mask = mask_ref[0][s] > 0.5
        o8 = oct_ref[pid, b]

        stack_ref[b, 0] = jnp.int32(0)  # root wide node
        n_live = jnp.sum(mask.astype(jnp.int32))
        sp0 = jnp.where(n_live > 0, 1, 0).astype(jnp.int32)
        carry0 = (
            sp0,
            jnp.int32(0),  # steps
            jnp.broadcast_to(t0_ref[0][s], (8, BLOCK)),  # per-sublane t
            jnp.zeros((8, BLOCK), jnp.float32),  # u
            jnp.zeros((8, BLOCK), jnp.float32),  # v
            jnp.full((8, BLOCK), -1, jnp.int32),  # slot
            jnp.zeros((1, BLOCK), jnp.int32),  # traversed
            jnp.zeros((1, BLOCK), jnp.int32),  # tested
        )

        def cond(c):
            sp, steps = c[0], c[1]
            return (sp > 0) & (steps < max_steps)

        def body(c, b=b, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                 rdx=rdx, rdy=rdy, rdz=rdz, mask=mask, o8=o8):
            sp, steps, t8, u8, v8, slot8, trav, test = c
            t_best = jnp.min(t8, axis=0, keepdims=True)  # (1, BLOCK)
            if any_hit:
                hit_already = jnp.max(slot8, axis=0, keepdims=True) >= 0

            # ---- vector phase: pop + slab-test up to POP nodes ----------
            curs, valids = [], []
            vec_nib = jnp.zeros((8, 1), jnp.int32)
            for k in range(POP):
                idx = sp - 1 - k
                valid = idx >= 0
                cur = jnp.where(valid, stack_ref[b, jnp.maximum(idx, 0)], 0)
                blk = nodes_ref[pl.ds(cur * 8, 8), :]  # (8,128) child boxes
                tx1 = (blk[:, 0:1] - ox) * rdx
                tx2 = (blk[:, 3:4] - ox) * rdx
                tmin = jnp.minimum(tx1, tx2)
                tmax = jnp.maximum(tx1, tx2)
                ty1 = (blk[:, 1:2] - oy) * rdy
                ty2 = (blk[:, 4:5] - oy) * rdy
                tmin = jnp.maximum(tmin, jnp.minimum(ty1, ty2))
                tmax = jnp.minimum(tmax, jnp.maximum(ty1, ty2))
                tz1 = (blk[:, 2:3] - oz) * rdz
                tz2 = (blk[:, 5:6] - oz) * rdz
                tmin = jnp.maximum(tmin, jnp.minimum(tz1, tz2))
                tmax = jnp.minimum(tmax, jnp.maximum(tz1, tz2))
                lane_hit = (tmax >= tmin) & (tmin < t_best) & (tmax > 0.0) & mask
                if any_hit:
                    lane_hit = lane_hit & (~hit_already)
                hit8 = jnp.sum(lane_hit.astype(jnp.int32), axis=1, keepdims=True) > 0
                vec_nib = vec_nib + jnp.where(
                    hit8 & valid, jnp.int32(1) << k, 0
                )
                curs.append(cur)
                valids.append(valid)
            # TWO scalar reads for POP nodes' hitmasks (one drain)
            s_lo = jnp.sum(vec_nib * nib_lo)
            s_hi = jnp.sum(vec_nib * nib_hi)
            n_pop = jnp.minimum(sp, POP)
            trav = trav + jnp.where(mask, n_pop, 0)
            sp = jnp.maximum(sp - POP, 0)

            # per-node 8-bit hitmasks decoded on scalar ALU
            hms = []
            for k in range(POP):
                hm = jnp.int32(0)
                for i in range(4):
                    hm = hm | (((s_lo >> (4 * i + k)) & 1) << i)
                    hm = hm | (((s_hi >> (4 * i + k)) & 1) << (i + 4))
                hms.append(hm)

            # ---- leaf phase: one fori per popped node's grouped rows ----
            for k in range(POP):
                lstart = leaf_start_ref[curs[k]]
                any_leaf = (hms[k] & leaf_kmask_ref[curs[k]]) != 0
                eff = jnp.where(any_leaf & valids[k], leaf_rows_ref[curs[k]], 0)

                def row_body(i, a, lstart=lstart):
                    t8, u8, v8, slot8, test = a
                    trow = tris_ref[pl.ds((lstart + i) * 8, 8), :]
                    v0x, v0y, v0z = trow[:, 0:1], trow[:, 1:2], trow[:, 2:3]
                    e1x, e1y, e1z = trow[:, 3:4], trow[:, 4:5], trow[:, 5:6]
                    e2x, e2y, e2z = trow[:, 6:7], trow[:, 7:8], trow[:, 8:9]
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
                        & (tt < t8)
                        & mask
                    )
                    t8 = jnp.where(ok, tt, t8)
                    u8 = jnp.where(ok, uu, u8)
                    v8 = jnp.where(ok, vv, v8)
                    slot8 = jnp.where(ok, (lstart + i) * 8 + sub_iota, slot8)
                    test = test + jnp.where(mask, 8, 0)
                    return t8, u8, v8, slot8, test

                t8, u8, v8, slot8, test = jax.lax.fori_loop(
                    0, eff, row_body, (t8, u8, v8, slot8, test)
                )

            # ---- push phase: farthest node first, far->near children, so
            # the nearest child of the nearest node ends on top ------------
            for k in reversed(range(POP)):
                base = (o8 * num_wide + curs[k]) * 8
                for j in reversed(range(8)):
                    m = meta_ref[base + j]
                    kk = (m >> SUB_META_K_SHIFT) & 7
                    nrows = (m >> SUB_META_NROWS_SHIFT) & SUB_META_NROWS_MASK
                    is_interior = (nrows == 0) & ((m & SUB_META_VALID) != 0)
                    push = (((hms[k] >> kk) & 1) > 0) & is_interior & valids[k]
                    stack_ref[b, sp] = m & SUB_META_PTR_MASK
                    sp = sp + push.astype(jnp.int32)

            return sp, steps + 1, t8, u8, v8, slot8, trav, test

        out = jax.lax.while_loop(cond, body, carry0)
        _, _, t8, u8, v8, slot8, trav, test = out

        # cross-sublane winner merge (once per block)
        t = t8[0:1]
        u = u8[0:1]
        v = v8[0:1]
        slot = slot8[0:1]
        for si in range(1, 8):
            better = t8[si : si + 1] < t
            t = jnp.where(better, t8[si : si + 1], t)
            u = jnp.where(better, u8[si : si + 1], u)
            v = jnp.where(better, v8[si : si + 1], v)
            slot = jnp.where(better, slot8[si : si + 1], slot)
        t_ref[0, s, :] = t
        u_ref[0, s, :] = u
        v_ref[0, s, :] = v
        slot_ref[0, s, :] = slot
        trav_ref[0, s, :] = trav
        test_ref[0, s, :] = test


@functools.partial(
    jax.jit,
    static_argnames=("num_wide", "any_hit", "max_steps", "max_stack", "interpret"),
)
def _run(
    oct_per_block,
    comps,
    num_wide: int,
    any_hit: bool,
    max_steps: int,
    max_stack: int,
    interpret: bool,
):
    n_tiles = oct_per_block.shape[0]
    shape = (NBLOCKS, BLOCK)
    tile_spec = pl.BlockSpec((1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *shape), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *shape), jnp.int32)
    kernel = functools.partial(
        _kernel, num_wide=num_wide, any_hit=any_hit, max_steps=max_steps
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=[f32, f32, f32, i32, i32, i32],
        in_specs=[smem_spec] * 5 + [*[tile_spec] * 8, full, full],
        out_specs=[tile_spec] * 6,
        scratch_shapes=[pltpu.SMEM((NBLOCKS, max_stack), jnp.int32)],
        interpret=interpret,
    )(oct_per_block, *comps)


def traverse(
    pk: PackedSublaneBVH,
    tris,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Same contract as packet_bvh.traverse."""
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

    # per-128-ray-block majority octant
    oct_ray = (
        (dx < 0).astype(jnp.int32)
        + 2 * (dy < 0).astype(jnp.int32)
        + 4 * (dz < 0).astype(jnp.int32)
    ).reshape(n_tiles, NBLOCKS, BLOCK)
    onehot = jax.nn.one_hot(oct_ray, 8, dtype=jnp.int32)
    counts = jnp.sum(
        onehot * maskp.reshape(n_tiles, NBLOCKS, BLOCK, 1).astype(jnp.int32), axis=2
    )
    oct_block = jnp.argmax(counts, axis=-1).astype(jnp.int32)  # [T, B]

    comps = tuple(
        x.reshape(n_tiles, NBLOCKS, BLOCK)
        for x in (ox, oy, oz, dx, dy, dz, t0p, maskp)
    ) + (pk.node_cols, pk.tri_cols)
    outs = _run(
        oct_block,
        (pk.meta, pk.leaf_start, pk.leaf_rows, pk.leaf_kmask) + comps,
        num_wide=pk.num_wide,
        any_hit=any_hit,
        max_steps=64 * pk.num_wide + 64,
        max_stack=pk.max_stack,
        interpret=interpret,
    )
    t, u, v, slot, trav, test = outs

    def unpad(x):
        return x.reshape(-1)[:r]

    t = unpad(t)
    u = unpad(u)
    v = unpad(v)
    slot = unpad(slot)
    res = dict(
        t=t,
        bary=jnp.stack([u, v], axis=-1),
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


def traverse_sorted(pk, tris, o, d, t0, mask=None, any_hit=False, interpret=False, spatial=True):
    return packet_bvh.traverse_sorted(
        pk, tris, o, d, t0, mask=mask, any_hit=any_hit, interpret=interpret,
        spatial=spatial, traverse_fn=traverse,
    )
