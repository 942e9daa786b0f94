"""Lockstep KD-tree traversal with a per-ray short stack.

Device replacement for KDTree::IntersectKDTree (infra/kdtree.cpp:144-204):
front-to-back ordered descent with early termination when the current best t
is closer than the entry of the next subtree.  Unlike the threaded BVH, a KD
walk needs (node, tmin, tmax) re-entry state, so each ray carries a small
stack of [D] entries as SoA arrays; pushes/pops are masked one-hot writes —
no per-lane pointers, so the whole batch stays lockstep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.accel.types import KDTreeArrays, TrianglePool
from cpu_ray_tracer_tpu.ops import intersect

CHUNK = 2  # leaf triangles tested per loop step


def traverse(
    kd: KDTreeArrays,
    tris: TrianglePool,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    any_hit: bool = False,
    max_steps: int | None = None,
):
    r = o.shape[0]
    depth_cap = kd.max_depth + 2
    rd = 1.0 / d

    # clip to root bounds
    t1 = (kd.bounds_min - o) * rd
    t2 = (kd.bounds_max - o) * rd
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    enters = (tf >= tn) & (tf > 0.0) & (tn < t0)
    tmin0 = jnp.maximum(tn, 0.0)
    tmax0 = jnp.minimum(tf, t0)

    if max_steps is None:
        max_steps = 8 * kd.split_axis.shape[0] + 16

    state = dict(
        node=jnp.zeros((r,), jnp.int32),
        tmin=tmin0,
        tmax=tmax0,
        k=jnp.zeros((r,), jnp.int32),
        sp=jnp.zeros((r,), jnp.int32),  # stack pointer
        stack_node=jnp.zeros((r, depth_cap), jnp.int32),
        stack_tmin=jnp.zeros((r, depth_cap), jnp.float32),
        stack_tmax=jnp.zeros((r, depth_cap), jnp.float32),
        active=enters,
        t=t0.astype(jnp.float32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        tri=jnp.full((r,), -1, jnp.int32),
        traversed=jnp.zeros((r,), jnp.int32),
        tested=jnp.zeros((r,), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )
    slot_ids = jnp.arange(depth_cap, dtype=jnp.int32)[None, :]  # [1, D]

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < max_steps)

    def body(s):
        node = jnp.maximum(s["node"], 0)
        active = s["active"]
        axis = kd.split_axis[node]
        is_leaf = axis < 0

        # ---- interior descent -------------------------------------------
        descend = active & (~is_leaf)
        ax = jnp.maximum(axis, 0)
        o_ax = jnp.take_along_axis(o, ax[..., None], axis=-1)[..., 0]
        rd_ax = jnp.take_along_axis(rd, ax[..., None], axis=-1)[..., 0]
        t_split = (kd.split_dist[node] - o_ax) * rd_ax
        near_is_left = (o_ax < kd.split_dist[node]) | (
            (o_ax == kd.split_dist[node]) & (jnp.take_along_axis(d, ax[..., None], -1)[..., 0] <= 0)
        )
        near = jnp.where(near_is_left, kd.left[node], kd.right[node])
        far = jnp.where(near_is_left, kd.right[node], kd.left[node])

        only_near = (t_split > s["tmax"]) | (t_split <= 0.0)
        only_far = (t_split > 0.0) & (t_split < s["tmin"])
        both = descend & (~only_near) & (~only_far)

        # push far on stack where both children are crossed
        sp = s["sp"]
        push_mask = both[..., None] & (slot_ids == sp[..., None])
        stack_node = jnp.where(push_mask, far[..., None], s["stack_node"])
        stack_tmin = jnp.where(push_mask, t_split[..., None], s["stack_tmin"])
        stack_tmax = jnp.where(push_mask, s["tmax"][..., None], s["stack_tmax"])
        sp = sp + (both & (sp < depth_cap - 1)).astype(jnp.int32)

        node_new = jnp.where(
            descend,
            jnp.where(only_far, far, near),
            s["node"],
        )
        tmax_new = jnp.where(both, jnp.minimum(s["tmax"], t_split), s["tmax"])
        tmin_new = jnp.where(descend & only_far, jnp.maximum(s["tmin"], t_split), s["tmin"])

        # ---- leaf triangle tests ----------------------------------------
        first = kd.first[node]
        cnt = kd.count[node]
        k = s["k"]
        leafing = active & is_leaf
        t = s["t"]
        u = s["u"]
        v = s["v"]
        tri = s["tri"]
        tested = s["tested"]
        for c in range(CHUNK):
            ok = leafing & ((k + c) < cnt)
            slot = jnp.clip(first + k + c, 0, jnp.maximum(kd.tri_ids.shape[0] - 1, 0))
            tid = kd.tri_ids[slot]
            tk, uk, vk, hk = intersect.moller_trumbore(
                o, d, tris.v0[tid], tris.e1[tid], tris.e2[tid], t
            )
            hk = hk & ok
            t = jnp.where(hk, tk, t)
            u = jnp.where(hk, uk, u)
            v = jnp.where(hk, vk, v)
            tri = jnp.where(hk, tid, tri)
            tested = tested + ok.astype(jnp.int32)
        leaf_done = leafing & ((k + CHUNK) >= cnt)
        k_new = jnp.where(leafing, k + CHUNK, jnp.where(descend, 0, k))

        # ---- pop on leaf completion (with early termination) -------------
        # early termination (kdtree.cpp:181): stop if best t <= subtree exit
        want_pop = leaf_done
        has_stack = sp > 0
        sp_pop = sp - (want_pop & has_stack).astype(jnp.int32)
        pop_sel = (slot_ids == sp_pop[..., None]) & want_pop[..., None] & has_stack[..., None]
        popped_node = jnp.sum(jnp.where(pop_sel, stack_node, 0), axis=-1)
        popped_tmin = jnp.sum(jnp.where(pop_sel, stack_tmin, 0.0), axis=-1)
        popped_tmax = jnp.sum(jnp.where(pop_sel, stack_tmax, 0.0), axis=-1)

        # Entries whose tmin lies beyond the current best hit are NOT worth
        # visiting, but sibling/ancestor entries may still be (LIFO pops are
        # not globally front-to-back), so a pruned entry is popped and its
        # subtree collapses immediately via tmax=min(tmax, t): the clipped
        # interval is empty and its leaf tests can't beat t.
        pop_ok = want_pop & has_stack
        node_new = jnp.where(pop_ok, popped_node, node_new)
        tmin_new = jnp.where(pop_ok, popped_tmin, tmin_new)
        tmax_new = jnp.where(pop_ok, jnp.minimum(popped_tmax, t), tmax_new)
        k_new = jnp.where(pop_ok, 0, k_new)
        sp = jnp.where(pop_ok, sp_pop, sp)
        dead = want_pop & (~has_stack)

        active_new = active & (~dead)
        if any_hit:
            active_new = active_new & (tri < 0)

        return dict(
            node=node_new,
            tmin=tmin_new,
            tmax=tmax_new,
            k=k_new,
            sp=sp,
            stack_node=stack_node,
            stack_tmin=stack_tmin,
            stack_tmax=stack_tmax,
            active=active_new,
            t=t,
            u=u,
            v=v,
            tri=tri,
            traversed=s["traversed"] + descend.astype(jnp.int32),
            tested=tested,
            steps=s["steps"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    tri = s["tri"]
    found = tri >= 0
    tri_safe = jnp.maximum(tri, 0)
    return dict(
        t=s["t"],
        bary=jnp.stack([s["u"], s["v"]], axis=-1),
        tri_idx=tri,
        obj_id=jnp.where(found, tris.obj_id[tri_safe], -1),
        mat_id=jnp.where(found, tris.mat_id[tri_safe], -1),
        traversed=s["traversed"],
        tested=s["tested"],
    )
