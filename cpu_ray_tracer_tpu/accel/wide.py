"""Wide (8-ary) BVH collapse + packing for the wide Pallas traversal kernel.

Round-1 profiling showed the binary packet kernel is bound by the per-node
SCALAR chain (row fetch + `pltpu.roll` + field extracts + link branch):
~200 ns per node step regardless of unrolling, because each step advances
ONE cursor by ONE binary node.  The fix is architectural, not micro: collapse
the binary SAH tree into 8-wide nodes so ONE row fetch delivers EIGHT child
AABBs at static lane offsets — the scalar overhead is amortized 8x, the roll
disappears entirely (children live at static lanes), and a subtree expansion
tests 8 boxes instead of binary's 14 (2+4+8) for the same frontier.

Layout (per wide node, one 128-lane f32 row, replicated per ray octant with
children pre-sorted near-first for that octant):

    child k at lanes [16k, 16k+16): bmin(3) bmax(3) pad(10)

Child metadata (leaf/interior flag, pointers) lives in an SMEM int32 table —
scalar loads from SMEM are cheap, while extracting integers from a VMEM
vector register costs a vector->scalar transfer each:

    meta[o, w, k] = tri_row_ptr | nrows << 22          (leaf, nrows >= 1)
                  = child_wide_row                     (interior, bits 22+ zero)
                  = 0 with an inverted AABB            (empty slot: never hits)

The binary tree's SAH topology (reference cost semantics, infra/bvh.cpp
:63-178) is preserved below the collapse points; leaf triangle rows are the
same `pack.pack_tri_rows` layout the binary kernel uses, so slot decoding is
shared.
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax.numpy as jnp

from cpu_ray_tracer_tpu.accel.pack import (
    TRI_F,
    TRIS_PER_ROW,
    make_slot_meta,
    pack_tri_rows,
)

WIDE = 8  # children per wide node
CHILD_F = 16  # lanes per child record (bmin 0-2, bmax 3-5)
META_NROWS_SHIFT = 22  # meta = ptr | nrows << 22
META_PTR_MASK = (1 << META_NROWS_SHIFT) - 1


@struct.dataclass
class PackedWideBVH:
    """SMEM-scalar-table layout for the wide packet kernel (r4).

    The r1-r3 wide kernel fetched each node as a 128-lane VMEM row and paid
    48 vector->scalar lane extracts per step — measured SLOWER than the
    binary walk.  The r4 sync-probe E variants showed the real budget: 8
    slab tests of 8 DIFFERENT nodes decided by independent vector->scalar
    reduces cost ~46 ns/node (they pipeline), vs 217 ns/node for the
    production one-reduce-per-step chain.  So nodes now live in SMEM scalar
    tables like the binary kernel's, one step covers all 8 children of one
    wide node, and the 8 reduces are issued back-to-back before any is
    consumed."""

    # SMEM scalar tables (octant-independent; traversal ORDER is the only
    # octant-dependent part and rides the packed permutation word):
    aabb48: jnp.ndarray = None  # f32 [48, W]: child k bmin xyz / bmax xyz at rows 6k..6k+5 (NaN = empty slot)
    cmeta: jnp.ndarray = None  # i32 [8, W]: 0 empty | wide child id (interior) | tri_row_start | nrows << 22 (leaf)
    orderw: jnp.ndarray = None  # i32 [8, W]: per-octant near-first slot permutation, rank r at bits 3r..3r+2
    tri_rows: jnp.ndarray = None  # [R_t, 128] f32 — leaf triangle rows, grouped per wide node
    slot_tri: jnp.ndarray = None  # [R_t * 8] i32
    # [R_t, 128] f32 per-slot shading records (n0 n1 n2, uv0 uv1 uv2, lane
    # 15 = bitcast meta when meta_in_shade) — same contract as PackedBVH
    tri_shade_rows: jnp.ndarray = None
    slot_meta: jnp.ndarray = None  # fused (tri, obj, mat) decode table
    meta_in_shade: bool = struct.field(pytree_node=False, default=False)
    num_wide: int = struct.field(pytree_node=False, default=0)
    max_stack: int = struct.field(pytree_node=False, default=64)
    stack_roots: tuple = struct.field(pytree_node=False, default=(0,))
    world_min: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))
    world_max: tuple = struct.field(pytree_node=False, default=(1.0, 1.0, 1.0))


def collapse_wide(
    left: np.ndarray,
    right: np.ndarray,
    tri_count: np.ndarray,
    node_min: np.ndarray,
    node_max: np.ndarray,
    root: int,
    width: int = WIDE,
):
    """Collapse a binary BVH into wide nodes.

    Greedy: a wide node starts from one binary interior node's two children
    and repeatedly expands the largest-surface-area interior child in place
    until `width` slots are used (the standard BVH8 collapse heuristic —
    large boxes are the ones worth culling early).

    Returns (children, depth): `children` is a list over wide nodes of lists
    of (binary_node_id, wide_child_idx_or_-1); wide node 0 is the root.
    `depth` is the max wide-tree depth (root = 1).
    """
    ext = np.maximum(node_max - node_min, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    is_leaf = tri_count > 0

    children: list[list] = []
    depth_of: list[int] = []

    def new_wide(binary_node: int, depth: int) -> int:
        idx = len(children)
        children.append(binary_node)  # placeholder (binary id)
        depth_of.append(depth)
        return idx

    if is_leaf[root]:
        # degenerate single-leaf tree: one wide node with one leaf child
        return [[(root, -1)]], 1

    new_wide(root, 1)
    i = 0
    while i < len(children):
        if isinstance(children[i], int):
            n = children[i]
            kids = [int(left[n]), int(right[n])]
            while len(kids) < width:
                best, best_a = -1, -1.0
                for j, c in enumerate(kids):
                    if not is_leaf[c] and area[c] > best_a:
                        best, best_a = j, float(area[c])
                if best < 0:
                    break
                c = kids.pop(best)
                kids.extend([int(left[c]), int(right[c])])
            out = []
            for c in kids:
                if is_leaf[c]:
                    out.append((c, -1))
                else:
                    out.append((c, new_wide(c, depth_of[i] + 1)))
            children[i] = out
        i += 1
    return children, max(depth_of)


def _octant_order(centers: np.ndarray, octant: int) -> np.ndarray:
    """Near-first child order for rays in `octant` (bit a set = direction
    negative along axis a): ascending projection of the child box center onto
    the octant's sign vector — the static analog of the reference's
    distance-ordered descent (infra/bvh.cpp:245-249)."""
    sign = np.array(
        [-1.0 if (octant >> a) & 1 else 1.0 for a in range(3)], np.float32
    )
    key = centers @ sign
    return np.argsort(key, kind="stable")


def pack_wide_host(
    node_min: np.ndarray,
    node_max: np.ndarray,
    left: np.ndarray,
    right: np.ndarray,
    left_first: np.ndarray,
    tri_count: np.ndarray,
    tri_indices: np.ndarray,
    tri_v0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    root: int,
    obj_id: np.ndarray | None = None,
    mat_id: np.ndarray | None = None,
    shade16: np.ndarray | None = None,
) -> PackedWideBVH:
    """Collapse + pack a binary host BVH (possibly a fused TLAS forest with a
    single root) into the SMEM-scalar-table wide layout.  All numpy — never
    touches the device until the final `jnp.asarray` uploads (host->device
    is the fast direction on tunneled TPUs).

    Leaf triangle rows are grouped CONTIGUOUSLY per owning wide node so the
    kernel can run one combined row loop over [min, max) of the hit leaf
    children instead of one data-dependent loop per child."""
    wide, depth = collapse_wide(left, right, tri_count, node_min, node_max, root)
    w = len(wide)
    if w >= (1 << META_NROWS_SHIFT):
        raise ValueError(f"{w} wide nodes >= 2^{META_NROWS_SHIFT}")

    # --- per-wide-node grouped leaf rows ---------------------------------
    rows_chunks, shade_chunks, slot_chunks = [], [], []
    leaf_pos = {}  # (wi, slot) -> (start_row, nrows)
    row = 0
    for wi, kids in enumerate(wide):
        for slot, (bin_id, wide_child) in enumerate(kids):
            if wide_child >= 0 or tri_count[bin_id] == 0:
                continue
            f = int(left_first[bin_id])
            c = int(tri_count[bin_id])
            nrows = (c + TRIS_PER_ROW - 1) // TRIS_PER_ROW
            if nrows >= (1 << (31 - META_NROWS_SHIFT)):
                raise ValueError(f"leaf with {c} tris exceeds wide nrows field")
            rr = np.zeros((nrows, 128), np.float32)
            sh = np.zeros((nrows, 128), np.float32) if shade16 is not None else None
            st = np.full(nrows * TRIS_PER_ROW, -1, np.int32)
            for k in range(c):
                tid = int(tri_indices[f + k])
                r_, lane = k // TRIS_PER_ROW, (k % TRIS_PER_ROW) * TRI_F
                rr[r_, lane : lane + 3] = tri_v0[tid]
                rr[r_, lane + 3 : lane + 6] = tri_e1[tid]
                rr[r_, lane + 6 : lane + 9] = tri_e2[tid]
                if sh is not None:
                    sh[r_, lane : lane + 16] = shade16[tid]
                st[k] = tid
            rows_chunks.append(rr)
            if sh is not None:
                shade_chunks.append(sh)
            slot_chunks.append(st)
            leaf_pos[(wi, slot)] = (row, nrows)
            row += nrows
    if not rows_chunks:
        rows_chunks.append(np.zeros((1, 128), np.float32))
        slot_chunks.append(np.full(TRIS_PER_ROW, -1, np.int32))
        if shade16 is not None:
            shade_chunks.append(np.zeros((1, 128), np.float32))
    tri_rows = np.concatenate(rows_chunks, axis=0)
    tri_shade_rows = (
        np.concatenate(shade_chunks, axis=0) if shade16 is not None else None
    )
    slot_tri = np.concatenate(slot_chunks)
    if tri_rows.shape[0] >= (1 << META_NROWS_SHIFT):
        raise ValueError(f"{tri_rows.shape[0]} tri rows >= 2^{META_NROWS_SHIFT}")

    # --- SMEM node tables -------------------------------------------------
    # Empty slots: NaN AABB (every slab comparison false — an inverted box
    # would PASS the min/max slab test like a huge box); cmeta 0.
    aabb48 = np.full((6 * WIDE, w), np.nan, np.float32)
    cmeta = np.zeros((WIDE, w), np.int32)
    orderw = np.zeros((8, w), np.int32)
    for wi, kids in enumerate(wide):
        ids = np.array([c[0] for c in kids], np.int64)
        centers = (node_min[ids] + node_max[ids]) * 0.5
        for slot, (bin_id, wide_child) in enumerate(kids):
            aabb48[6 * slot : 6 * slot + 3, wi] = node_min[bin_id]
            aabb48[6 * slot + 3 : 6 * slot + 6, wi] = node_max[bin_id]
            if wide_child >= 0:
                cmeta[slot, wi] = wide_child
            else:
                st, nr = leaf_pos[(wi, slot)]
                cmeta[slot, wi] = st | (nr << META_NROWS_SHIFT)
        for o in range(8):
            order = _octant_order(centers, o)
            word = 0
            for rank, slot in enumerate(order):
                word |= int(slot) << (3 * rank)
            # unfilled ranks (fewer than 8 children) point at slot 0 —
            # harmless: its hit bit gates the push and empties never hit
            orderw[o, wi] = word

    pk = PackedWideBVH(
        aabb48=jnp.asarray(aabb48),
        cmeta=jnp.asarray(cmeta),
        orderw=jnp.asarray(orderw),
        tri_rows=jnp.asarray(tri_rows),
        slot_tri=jnp.asarray(slot_tri),
        tri_shade_rows=(
            jnp.asarray(tri_shade_rows) if tri_shade_rows is not None else None
        ),
        num_wide=w,
        # worst case one wide node pushes width-1 extra entries per level
        max_stack=max(8 * (depth + 2), 64),
        world_min=tuple(float(x) for x in node_min[root]),
        world_max=tuple(float(x) for x in node_max[root]),
    )
    if obj_id is not None and mat_id is not None:
        pk = pk.replace(slot_meta=make_slot_meta(np.asarray(slot_tri), obj_id, mat_id))
    return pk
