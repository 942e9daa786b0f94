"""Packing a threaded BVH + triangle pool into the Pallas packet-traversal
kernel's VMEM-friendly row layout.

Why this layout (see ops/pallas/packet_bvh.py for the kernel):

* TPU VMEM is tiled (8, 128); an [M, 16] array physically pads its lane
  dimension to 128 — 8x waste.  Packing 8 records of 16 f32 into one
  128-lane row wastes nothing, and a record is selected from a loaded row
  with a one-hot multiply + sum — pure vector ops, no per-lane gather.
* The node table is replicated once per ray-direction octant with THAT
  octant's hit/miss skip links baked into each record, so the kernel's
  per-tile traversal order is a single scalar cursor chase.
* Leaf triangles are re-stored contiguously, 8 per 128-lane row, padded
  with degenerate triangles (zero edges -> Möller–Trumbore determinant 0,
  never hits), so a leaf visit tests whole rows unconditionally — uniform
  SIMD work, no masking on counts.

Integer fields ride in the f32 rows as exact small floats (< 2^24).
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax.numpy as jnp

NODE_F = 16  # floats per node record
NODES_PER_ROW = 128 // NODE_F  # 8
TRI_F = 16  # floats per triangle record (v0, e1, e2, 7 pad)
TRIS_PER_ROW = 128 // TRI_F  # 8

# record field offsets
F_BMIN = 0
F_BMAX = 3
F_LF = 6  # interior: unused; leaf: first triangle ROW index
F_CNT = 7  # 0 = interior, else triangle count
F_HIT = 8  # hit link (this octant's near-first DFS)
F_MISS = 9
F_NROWS = 10  # leaf: number of triangle rows


@struct.dataclass
class PackedBVH:
    node_rows: jnp.ndarray  # [8, R_n, 128] f32 — per-octant node records
    tri_rows: jnp.ndarray  # [R_t, 128] f32 — leaf triangle records
    slot_tri: jnp.ndarray  # [R_t * 8] i32 — slot -> pool triangle id (-1 pad)
    # [R_t, 128] f32 — per-slot shading records (n0 n1 n2, uv0 uv1 uv2, mat):
    # lets the kernel emit interpolated normal/uv/mat directly, removing the
    # post-traversal shade gather entirely
    tri_shade_rows: jnp.ndarray = None
    # [R_t * 8] i32: tri(20 bits) | obj(6) << 20 | mat(6) << 26, -1 pad —
    # ONE gather recovers all three hit ids (gathers cost ~per-index on TPU)
    slot_meta: jnp.ndarray = None
    # True when tri_shade_rows lane 15 holds the slot_meta word BITCAST to
    # f32 (instead of mat as a float): traverse() then recovers ids AND the
    # shading record with a single [R, 16] gather per call instead of two
    meta_in_shade: bool = struct.field(pytree_node=False, default=False)
    # SMEM scalar node tables (the fast fetch path): a node step becomes ~10
    # native scalar loads broadcast straight into the slab test — no VMEM row
    # fetch, no lane rotate, no scalar extracts.  96 B/node total, so they
    # fit the ~512 KB SMEM budget up to ~5k nodes; traverse() falls back to
    # the VMEM row path beyond that.
    node_aabb: jnp.ndarray = None  # f32 [6, M]: bmin xyz, bmax xyz
    node_meta2: jnp.ndarray = None  # i32 [2, M]: leaf first tri ROW, nrows (0 = interior)
    node_links: jnp.ndarray = None  # i32 [8, 2, M]: per-octant hit/miss links
    # i32 [8, 2, M]: per-octant (near child, far child) for the SMEM-stack
    # ordered two-child descent kernel (CRT_STACK=1); -1 on leaves.  Only
    # attached for single-root trees (scene/build.py bvh path).
    node_nearfar: jnp.ndarray = None
    root: int = struct.field(pytree_node=False, default=0)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    # tree depth (root level = 1); gates the SMEM stack-descent kernel
    # against its fixed per-group stack capacity.  0 = unknown.
    stack_depth: int = struct.field(pytree_node=False, default=0)
    # forest roots for the stack walk (the link walk chains roots through
    # the threaded miss links; the stack walk seeds its stack with them
    # instead).  () = single tree at `root`.
    stack_roots: tuple = struct.field(pytree_node=False, default=())
    # per-structure default when CRT_STACK is unset: True for SAH BVHs
    # (stack wins), False for grid/KD cell forests (tight sibling
    # partitions -> both children hit nearly every step, heavier step
    # loses; see docs/ROOFLINE.md + interchange_r2.json)
    stack_default: bool = struct.field(pytree_node=False, default=True)
    # world bounds (host floats) for spatial ray-sort quantization
    world_min: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))
    world_max: tuple = struct.field(pytree_node=False, default=(1.0, 1.0, 1.0))


def pack_tri_rows(
    left_first: np.ndarray,
    tri_count: np.ndarray,
    tri_indices: np.ndarray,
    tri_v0,
    tri_e1,
    tri_e2,
    shade16: np.ndarray | None = None,
):
    """Re-store leaf triangles contiguously, 8 per 128-lane row, padded with
    degenerate triangles.  Shared by the binary (packet_bvh) and wide
    (wide_bvh) kernel packers — both traverse the SAME leaf rows.

    Returns (tri_rows, tri_shade_rows | None, slot_tri, leaf_row_start [M],
    leaf_nrows [M])."""
    m = tri_count.shape[0]
    is_leaf = tri_count > 0
    leaf_ids = np.where(is_leaf)[0]
    total_rows = int(
        sum((int(tri_count[n]) + TRIS_PER_ROW - 1) // TRIS_PER_ROW for n in leaf_ids)
    )
    total_rows = max(total_rows, 1)
    tri_rows = np.zeros((total_rows, 128), np.float32)
    tri_shade_rows = np.zeros((total_rows, 128), np.float32) if shade16 is not None else None
    slot_tri = np.full(total_rows * TRIS_PER_ROW, -1, np.int32)
    leaf_row_start = np.zeros(m, np.int64)
    leaf_nrows = np.zeros(m, np.int64)
    row = 0
    for n in leaf_ids:
        f = int(left_first[n])
        c = int(tri_count[n])
        leaf_row_start[n] = row
        nrows = (c + TRIS_PER_ROW - 1) // TRIS_PER_ROW
        leaf_nrows[n] = nrows
        for k in range(c):
            tid = int(tri_indices[f + k])
            rr = row + k // TRIS_PER_ROW
            lane = (k % TRIS_PER_ROW) * TRI_F
            tri_rows[rr, lane + 0 : lane + 3] = tri_v0[tid]
            tri_rows[rr, lane + 3 : lane + 6] = tri_e1[tid]
            tri_rows[rr, lane + 6 : lane + 9] = tri_e2[tid]
            if tri_shade_rows is not None:
                tri_shade_rows[rr, lane : lane + 16] = shade16[tid]
            slot_tri[rr * TRIS_PER_ROW + (k % TRIS_PER_ROW)] = tid
        row += nrows
    return tri_rows, tri_shade_rows, slot_tri, leaf_row_start, leaf_nrows


def pack_bvh(
    host_bvh, tri_indices: np.ndarray, tri_v0, tri_e1, tri_e2, hit, miss,
    shade16: np.ndarray | None = None,
) -> PackedBVH:
    """host_bvh: accel.bvh_builder._HostBVH (trimmed); hit/miss: [8, M].
    `shade16` [N, 16]: per-tri n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) mat(1)
    for in-kernel attribute interpolation (optional)."""
    m = host_bvh.nodes_used
    is_leaf = host_bvh.tri_count > 0

    tri_rows, tri_shade_rows, slot_tri, leaf_row_start, leaf_nrows = pack_tri_rows(
        host_bvh.left_first, host_bvh.tri_count, tri_indices,
        tri_v0, tri_e1, tri_e2, shade16=shade16,
    )

    # --- octant-replicated node rows ------------------------------------
    n_node_rows = (m + NODES_PER_ROW - 1) // NODES_PER_ROW
    node_rows = np.zeros((8, n_node_rows, 128), np.float32)
    for o in range(8):
        for n in range(m):
            r = n // NODES_PER_ROW
            lane = (n % NODES_PER_ROW) * NODE_F
            rec = node_rows[o, r]
            rec[lane + F_BMIN : lane + F_BMIN + 3] = host_bvh.node_min[n]
            rec[lane + F_BMAX : lane + F_BMAX + 3] = host_bvh.node_max[n]
            if is_leaf[n]:
                rec[lane + F_LF] = float(leaf_row_start[n])
                rec[lane + F_CNT] = float(host_bvh.tri_count[n])
                rec[lane + F_NROWS] = float(leaf_nrows[n])
            rec[lane + F_HIT] = float(hit[o, n])
            rec[lane + F_MISS] = float(miss[o, n])
    node_aabb = np.concatenate(
        [host_bvh.node_min[:m].T, host_bvh.node_max[:m].T], axis=0
    ).astype(np.float32)  # [6, M]
    node_meta2 = np.stack(
        [leaf_row_start[:m], np.where(is_leaf[:m], leaf_nrows[:m], 0)]
    ).astype(np.int32)  # [2, M]
    node_links = np.stack([hit[:, :m], miss[:, :m]], axis=1).astype(np.int32)  # [8, 2, M]
    return PackedBVH(
        node_rows=jnp.asarray(node_rows),
        tri_rows=jnp.asarray(tri_rows),
        slot_tri=jnp.asarray(slot_tri),
        tri_shade_rows=jnp.asarray(tri_shade_rows) if tri_shade_rows is not None else None,
        node_aabb=jnp.asarray(node_aabb),
        node_meta2=jnp.asarray(node_meta2),
        node_links=jnp.asarray(node_links),
        root=0,
        num_nodes=m,
        world_min=tuple(float(x) for x in host_bvh.node_min[0]),
        world_max=tuple(float(x) for x in host_bvh.node_max[0]),
    )


def nearfar_from_children(left: np.ndarray, right: np.ndarray, axis: np.ndarray):
    """Per-octant (near, far) child table for the stack-descent kernel.

    Near child on a split axis `a` is the LEFT (lower-coordinate) child when
    the ray direction's component a is non-negative — the reference's
    ordered traversal decision (infra/bvh.cpp:224-258) made octant-static.
    Returns np.int32 [8, 2, M]; leaves carry -1."""
    m = left.shape[0]
    out = np.full((8, 2, m), -1, np.int32)
    interior = left >= 0
    for o in range(8):
        neg = ((o >> axis) & 1) > 0  # [M] direction negative on split axis
        near = np.where(neg, right, left)
        far = np.where(neg, left, right)
        out[o, 0] = np.where(interior, near, -1)
        out[o, 1] = np.where(interior, far, -1)
    return out


def tree_depth(left: np.ndarray, right: np.ndarray, root: int) -> int:
    """Depth of the tree rooted at `root` (root level = 1), level-order."""
    depth = 0
    frontier = np.array([root], np.int64)
    while frontier.size:
        depth += 1
        kids = np.concatenate([left[frontier], right[frontier]])
        frontier = kids[kids >= 0]
    return depth


def attach_stack_tables(
    pk: PackedBVH, left, right, axis, roots=None, default=True
) -> PackedBVH:
    """Equip a packed BVH/forest with the stack-descent tables: the
    per-octant (near, far) child table, the tree depth, and (for forests)
    the root list the walk seeds its stack with.  Returns `pk` unchanged
    (stack_depth 0 = ineligible) when any root is a leaf — the walk only
    steps on interior nodes.  `default` sets whether the walk engages when
    CRT_STACK is unset (False for grid/KD cell forests, measured loss)."""
    if roots is None or len(roots) == 0:
        roots = [pk.root]
    if any(left[r] < 0 for r in roots):
        return pk
    depth = max(tree_depth(left, right, r) for r in roots) + len(roots) - 1
    return pk.replace(
        node_nearfar=jnp.asarray(nearfar_from_children(left, right, axis)),
        stack_depth=depth,
        stack_roots=tuple(int(r) for r in roots),
        stack_default=bool(default),
    )


class HostBVHView:
    """Duck-typed host view for pack_bvh (matches _HostBVH attributes)."""

    def __init__(self, nodes_used, node_min, node_max, left_first, tri_count):
        self.nodes_used = nodes_used
        self.node_min = node_min
        self.node_max = node_max
        self.left_first = left_first
        self.tri_count = tri_count


def pack_host(
    node_min, node_max, left_first, tri_count,
    tri_indices, tri_v0, tri_e1, tri_e2, hit, miss, root: int,
    obj_id=None, mat_id=None, shade16=None,
) -> PackedBVH:
    """Pack from HOST numpy arrays — the path the scene compiler uses.
    (Never pull device arrays back: device->host transfers can be orders of
    magnitude slower than host->device on tunneled TPU runtimes.)"""
    view = HostBVHView(node_min.shape[0], node_min, node_max, left_first, tri_count)
    # when the hit ids fit the packed meta word AND shading records are
    # present, bitcast the per-tri meta into shade lane 15 (replacing the
    # float mat id) so ONE [R, 16] gather recovers ids + shading attributes
    meta_in_shade = False
    n_tris = tri_v0.shape[0]
    ids_packable = (
        obj_id is not None
        and mat_id is not None
        and n_tris < (1 << 20)
        and obj_id.max(initial=0) < (1 << 6)
        and mat_id.max(initial=0) < (1 << 5)
    )
    if ids_packable and shade16 is not None:
        tri_meta = (
            np.arange(n_tris, dtype=np.int32)
            | (obj_id.astype(np.int32) << 20)
            | (mat_id.astype(np.int32) << 26)
        )
        shade16 = np.ascontiguousarray(shade16, dtype=np.float32).copy()
        shade16.view(np.int32)[:, 15] = tri_meta  # bit-level, NaN-safe
        meta_in_shade = True
    pk = pack_bvh(view, tri_indices, tri_v0, tri_e1, tri_e2, hit, miss, shade16=shade16)
    pk = pk.replace(
        root=root,
        meta_in_shade=meta_in_shade,
        world_min=tuple(float(x) for x in node_min[root]),
        world_max=tuple(float(x) for x in node_max[root]),
    )
    if obj_id is not None and mat_id is not None:
        pk = pk.replace(slot_meta=make_slot_meta(np.asarray(pk.slot_tri), obj_id, mat_id))
    return pk


def make_slot_meta(slot_tri: np.ndarray, obj_id: np.ndarray, mat_id: np.ndarray):
    """Fused slot -> (tri, obj, mat) table; falls back to None when ids
    exceed the packed field widths (tri 20 / obj 6 / mat 5 bits).

    mat_id rides in bits 26-31 of a SIGNED int32 whose sign bit doubles as
    the -1 pad sentinel (packet_bvh.py tests `meta >= 0`), so mat_id must fit
    in FIVE bits — a 6-bit value >= 32 would set bit 31 and make real hits
    read as misses."""
    n = obj_id.shape[0]
    if n >= (1 << 20) or obj_id.max(initial=0) >= (1 << 6) or mat_id.max(initial=0) >= (1 << 5):
        return None
    meta = np.full(slot_tri.shape, -1, np.int32)
    valid = slot_tri >= 0
    t = slot_tri[valid]
    meta[valid] = t | (obj_id[t].astype(np.int32) << 20) | (mat_id[t].astype(np.int32) << 26)
    return jnp.asarray(meta)


def pack_from_arrays(bvh, tris) -> PackedBVH:
    """Pack device BVHArrays + TrianglePool (pulls to host once).  Only for
    tests/CPU: on tunneled TPUs device->host reads are very slow — use
    pack_host with the compiler's numpy arrays instead."""

    class _H:
        pass

    h = _H()
    h.nodes_used = bvh.num_nodes
    h.node_min = np.asarray(bvh.node_min)
    h.node_max = np.asarray(bvh.node_max)
    h.left_first = np.asarray(bvh.left_first)
    h.tri_count = np.asarray(bvh.tri_count)
    pk = pack_bvh(
        h,
        np.asarray(bvh.tri_indices),
        np.asarray(tris.v0),
        np.asarray(tris.e1),
        np.asarray(tris.e2),
        np.asarray(bvh.hit_link),
        np.asarray(bvh.miss_link),
    )
    return pk.replace(root=bvh.root)
