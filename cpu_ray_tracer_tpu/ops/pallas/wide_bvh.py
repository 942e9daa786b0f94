"""Pallas TPU wide (8-ary) packet BVH traversal — SMEM tables, pipelined
reduces (r4 rewrite).

The binary packet walk's measured wall is its serial vector->scalar chain:
one packed reduce decides at most two children, costing ~217 ns/node
(benchmarks/sync_probe.py variant C).  The same probe's E variants show
that EIGHT slab tests of eight different nodes decided by independent
reduces cost ~46 ns/node — reduces pipeline when none is consumed before
all are issued.  This kernel exploits that: one step pops one 8-wide node
(accel/wide.collapse_wide of the binary SAH tree, reference cost semantics
infra/bvh.cpp:63-178), slab-tests all 8 children, issues 8 independent
reduces, and only then branches:

  * node data comes from SMEM scalar tables (aabb48 [48, W], cmeta [8, W])
    exactly like the binary kernel's fast fetch path — the r1-r3 wide
    kernel fetched VMEM rows and paid 48 vector->scalar lane extracts per
    step, which is why it measured SLOWER than the binary walk;
  * the hit leaf children's triangle rows are stored CONTIGUOUSLY per wide
    node, so ONE fori_loop over [min, max) of the hit leaf ranges runs all
    Möller–Trumbore rows (vs one data-dependent loop per child);
  * interior hits push far-first through the per-octant packed permutation
    word (orderw), so the nearest child pops first — the ordered descent of
    infra/bvh.cpp:224-258 vectorised per packet.

Traversal contract matches packet_bvh.traverse (same outputs, counters,
any-hit mode, fused meta-in-shade id recovery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.accel.wide import (
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
    oct_ref,  # SMEM [1, n_tiles] i32 per-tile octant
    ox_ref, oy_ref, oz_ref,  # VMEM [tile] blocks
    dx_ref, dy_ref, dz_ref,
    t0_ref, mask_ref,
    aabb_ref,  # SMEM f32 [48, W]
    cmeta_ref,  # SMEM i32 [8, W]
    order_ref,  # SMEM i32 [8, W]
    tris_ref,  # VMEM [Rt, 128] full
    t_ref, u_ref, v_ref, slot_ref, trav_ref, test_ref,  # outputs
    stack_ref,  # SMEM scratch [max_stack] i32
    *,
    roots: tuple,
    any_hit: bool,
    max_steps: int,
):
    pid = pl.program_id(0)
    o8 = oct_ref[0, pid]

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    rdx = 1.0 / dx
    rdy = 1.0 / dy
    rdz = 1.0 / dz
    mask = mask_ref[0] > 0.5

    def cond(c):
        cur, sp, t, u, v, slot, trav, test, steps = c
        go = (cur >= 0) & (steps < max_steps)
        if any_hit:
            go = go & (jnp.sum((mask & (slot < 0)).astype(jnp.int32)) > 0)
        return go

    def nearest_in(maskbits, ow):
        """Nearest slot of `maskbits` under order word `ow` (-1 if empty)."""
        sel = jnp.int32(-1)
        for rank in range(WIDE):
            s = (ow >> (3 * rank)) & 7
            take = (sel < 0) & (((maskbits >> s) & 1) > 0)
            sel = jnp.where(take, s, sel)
        return sel

    def step(c):
        cur_in, sp, t, u, v, slot, trav, test, steps = c
        # predicated-safe when drained (cur < 0): reads stay in bounds and
        # state does not advance (the unrolled second step may execute
        # predicated on TPU)
        active = cur_in >= 0
        cur = jnp.maximum(cur_in, 0)
        ow = order_ref[o8, cur]

        # 8 slab tests, each reduced to a scalar bit IMMEDIATELY: keeping
        # the 8 lane-hit vectors live for a deferred packed consume forced
        # ~8 extra (32,128) vregs of pressure and spilled every step
        # (measured 27 us/step vs 0.6 us for this form); the 8 reduces
        # still pipeline — the or-chain is scalar work and slab k+1 never
        # waits on reduce k (sync_probe variant E8: 49 ns/node)
        metas = [cmeta_ref[k, cur] for k in range(WIDE)]
        hitbits = jnp.int32(0)
        for k in range(WIDE):
            bminx = aabb_ref[6 * k + 0, cur]
            bminy = aabb_ref[6 * k + 1, cur]
            bminz = aabb_ref[6 * k + 2, cur]
            bmaxx = aabb_ref[6 * k + 3, cur]
            bmaxy = aabb_ref[6 * k + 4, cur]
            bmaxz = aabb_ref[6 * k + 5, cur]
            # broadcast slab test (infra/bvh.cpp:181-190); NaN empty slots
            # fail every comparison
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
            hitbits = hitbits | (
                (jnp.sum(lane_hit.astype(jnp.int32)) > 0).astype(jnp.int32) << k
            )

        # combined leaf-row run: hit leaf children's rows are contiguous
        # per wide node (accel/wide.pack_wide_host), so one loop over the
        # union range covers them all; unhit leaf children BETWEEN hit ones
        # get tested harmlessly (degenerate-pad rows never win)
        lo = jnp.int32(0x7FFFFFFF)
        hi = jnp.int32(0)
        for k in range(WIDE):
            nr = metas[k] >> META_NROWS_SHIFT
            st = metas[k] & META_PTR_MASK
            do = (((hitbits >> k) & 1) > 0) & (nr > 0)
            lo = jnp.where(do, jnp.minimum(lo, st), lo)
            hi = jnp.where(do, jnp.maximum(hi, st + nr), hi)

        def leaf_tests(args):
            def row_body(i, args2):
                t, u, v, slot, test = args2
                trow = tris_ref[pl.ds(i, 1), :]  # (1, 128)
                base_slot = i * TRIS_PER_ROW
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
                test = test + TRIS_PER_ROW
                return t, u, v, slot, test

            return jax.lax.fori_loop(lo, hi, row_body, args)

        t, u, v, slot, test = jax.lax.cond(
            active & (hi > lo), leaf_tests, lambda a: a, (t, u, v, slot, test)
        )

        # --- phase 3: descend / pop with AT MOST ONE stack store ----------
        # Dynamic SMEM stores on the serial step chain measured ~3 us each
        # (the r1-r3 8-store push loop put the wide walk at ~27 us/step), so
        # the stack holds (node << 8 | pending-child-mask) words: descend
        # goes STRAIGHT to the nearest hit interior child, the siblings stay
        # behind as one pushed mask word, and a pop peels one child off the
        # top word (writing the shrunk mask back in place).
        interior = jnp.int32(0)
        for k in range(WIDE):
            is_int = (metas[k] > 0) & ((metas[k] >> META_NROWS_SHIFT) == 0)
            interior = interior | (is_int.astype(jnp.int32) << k)
        ibits = hitbits & interior
        sel = nearest_in(ibits, ow)
        has_i = sel >= 0
        sel_c = jnp.maximum(sel, 0)
        next_desc = cmeta_ref[sel_c, cur]
        rest = ibits & ~(1 << sel_c)

        # pop path (consulted when no interior child was hit); the
        # speculative top read must stay in bounds when the stack is empty
        can_pop = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        top = jnp.where(can_pop, stack_ref[spm], 0)
        p = top >> 8
        pm = top & 0xFF
        owp = order_ref[o8, p]
        selp = nearest_in(pm, owp)
        selp_c = jnp.maximum(selp, 0)
        # mask 0 marks a directly-pushed root: descend into p itself
        next_pop = jnp.where(pm == 0, p, cmeta_ref[selp_c, p])
        pm_rest = pm & ~(1 << selp_c)

        nxt = jnp.where(
            has_i, next_desc, jnp.where(can_pop, next_pop, jnp.int32(-1))
        )
        push = has_i & (rest != 0)
        writeback = (~has_i) & can_pop & (pm_rest != 0)
        addr = jnp.where(push, sp, spm)
        val = jnp.where(push, (cur << 8) | rest, (p << 8) | pm_rest)

        @pl.when(active & (push | writeback))
        def _store():
            stack_ref[addr] = val

        sp_next = jnp.where(
            push,
            sp + 1,
            jnp.where(has_i | writeback | (~can_pop), sp, spm),
        )
        sp = jnp.where(active, sp_next, sp)
        cur_out = jnp.where(active, nxt, cur_in)
        trav = trav + jnp.where(active, 1, 0)
        return cur_out, sp, t, u, v, slot, trav, test, steps + 1

    def body(c):
        # unrolled: step is a no-op when drained, so two steps per while
        # iteration just halve the cond bookkeeping
        for _ in range(1 if any_hit else packet_bvh.UNROLL):
            c = step(c)
        return c

    # first root is the starting cursor; extra forest roots sit on the stack
    # as mask-0 words (pop descends into the node itself)
    n_live = jnp.sum(mask.astype(jnp.int32))
    for i, rt in enumerate(reversed(roots[1:])):
        stack_ref[i] = jnp.int32(rt << 8)
    sp0 = jnp.int32(len(roots) - 1)
    cur0 = jnp.where(n_live > 0, roots[0], -1).astype(jnp.int32)

    t0 = t0_ref[0]
    init = (
        cur0,
        sp0,
        t0,
        jnp.zeros(TILE_SHAPE, jnp.float32),
        jnp.zeros(TILE_SHAPE, jnp.float32),
        jnp.full(TILE_SHAPE, -1, jnp.int32),
        jnp.int32(0),  # trav: scalar wide-node step counter
        jnp.int32(0),  # test: scalar tri-test counter
        jnp.int32(0),
    )
    _, sp, t, u, v, slot, trav, test, steps = jax.lax.while_loop(cond, body, init)
    t_ref[0] = t
    u_ref[0] = u
    v_ref[0] = v
    slot_ref[0] = slot
    trav_ref[0, pid] = trav
    test_ref[0, pid] = test


@functools.partial(
    jax.jit,
    static_argnames=("roots", "any_hit", "max_steps", "max_stack", "interpret"),
)
def _run(
    oct_per_tile,
    comps,
    aabb48,
    cmeta,
    orderw,
    tri_rows,
    roots: tuple,
    any_hit: bool,
    max_steps: int,
    max_stack: int,
    interpret: bool,
):
    n_tiles = oct_per_tile.shape[1]
    tile_spec = pl.BlockSpec((1, *TILE_SHAPE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.int32)
    stat = jax.ShapeDtypeStruct((1, n_tiles), jnp.int32)
    out_shapes = [f32, f32, f32, i32, stat, stat]  # t u v slot traversed tested
    in_specs = [
        smem_spec,  # octants [1, n_tiles]
        *[tile_spec] * 8,  # ox..mask
        smem_spec,  # aabb48
        smem_spec,  # cmeta
        smem_spec,  # orderw
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tris (full)
    ]
    kernel = functools.partial(
        _kernel, roots=roots, any_hit=any_hit, max_steps=max_steps
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=[tile_spec] * 4 + [smem_spec] * 2,
        scratch_shapes=[pltpu.SMEM((max_stack,), jnp.int32)],
        interpret=interpret,
    )(oct_per_tile, *comps, aabb48, cmeta, orderw, tri_rows)


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
    oct_tile = jnp.argmax(counts, axis=-1).astype(jnp.int32)  # [T]

    comps = tuple(
        x.reshape(n_tiles, *TILE_SHAPE) for x in (ox, oy, oz, dx, dy, dz, t0p, maskp)
    )
    outs = _run(
        oct_tile[None, :],
        comps,
        pk.aabb48,
        pk.cmeta,
        pk.orderw,
        pk.tri_rows,
        roots=pk.stack_roots,
        any_hit=any_hit,
        max_steps=4 * pk.num_wide + 64,
        max_stack=pk.max_stack,
        interpret=interpret,
    )
    t, u, v, slot, trav, test = outs

    def unpad(x):
        return x.reshape(-1)[:r]

    def bstat(x):
        per_ray = jnp.repeat(x.reshape(-1), TILE)
        return jnp.where(maskp > 0.5, per_ray, 0).reshape(-1)[:r]

    t = unpad(t)
    slot = unpad(slot)
    res = dict(
        t=t,
        bary=jnp.stack([unpad(u), unpad(v)], axis=-1),
        traversed=bstat(trav),
        tested=bstat(test),
    )
    if any_hit:
        # pad triangles are degenerate and never win: slot >= 0 IS the hit flag
        res["tri_idx"] = jnp.where(slot >= 0, 0, -1)
        res["obj_id"] = jnp.full_like(slot, -1)
        res["mat_id"] = jnp.full_like(slot, -1)
        return res
    if pk.meta_in_shade and pk.tri_shade_rows is not None:
        # ONE [R, 16] gather recovers the hit ids (meta bitcast in lane 15)
        # AND the shading record — same contract as packet_bvh.traverse
        rec = pk.tri_shade_rows.reshape(-1, TRI_F)[jnp.maximum(slot, 0)]
        meta = jax.lax.bitcast_convert_type(rec[..., 15], jnp.int32)
        found = (slot >= 0) & (meta >= 0)
        tri_idx = jnp.where(found, meta & 0xFFFFF, -1)
        obj_id = jnp.where(found, (meta >> 20) & 0x3F, -1)
        mat_id = jnp.where(found, (meta >> 26) & 0x3F, -1)
        res["shade_rec"] = rec
    elif pk.slot_meta is not None:
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
