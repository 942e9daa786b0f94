"""Host -> device scene compilation helpers: numpy build outputs to flat
device arrays (TrianglePool + accelerator arrays)."""

from __future__ import annotations

import numpy as np

from cpu_ray_tracer_tpu.accel import bvh_builder
from cpu_ray_tracer_tpu.accel.types import (
    BVHArrays,
    BuildStats,
    TrianglePool,
    to_device_f32,
    to_device_i32,
)


def make_triangle_pool(
    tri_v: np.ndarray,
    tri_n: np.ndarray | None = None,
    tri_uv: np.ndarray | None = None,
    obj_id: np.ndarray | None = None,
    mat_id: np.ndarray | None = None,
) -> TrianglePool:
    """tri_v [N, 3, 3] vertices; tri_n [N, 3, 3] vertex normals; tri_uv
    [N, 3, 2].  Missing normals are filled with geometric normals."""
    n = tri_v.shape[0]
    v0, v1, v2 = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
    if tri_n is None or not np.any(tri_n):
        gn = np.cross(v1 - v0, v2 - v0)
        gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        tri_n = np.stack([gn, gn, gn], axis=1)
    else:
        # fill any zero-length vertex normal with the geometric normal
        gn = np.cross(v1 - v0, v2 - v0)
        gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        bad = np.linalg.norm(tri_n, axis=-1) < 1e-8  # [N, 3]
        tri_n = np.where(bad[..., None], gn[:, None, :], tri_n)
    if tri_uv is None:
        tri_uv = np.zeros((n, 3, 2), np.float32)
    if obj_id is None:
        obj_id = np.full((n,), 2, np.int32)
    if mat_id is None:
        mat_id = np.zeros((n,), np.int32)
    shade = np.zeros((n, 16), np.float32)
    shade[:, 0:3] = tri_n[:, 0]
    shade[:, 3:6] = tri_n[:, 1]
    shade[:, 6:9] = tri_n[:, 2]
    shade[:, 9:11] = tri_uv[:, 0]
    shade[:, 11:13] = tri_uv[:, 1]
    shade[:, 13:15] = tri_uv[:, 2]
    shade[:, 15] = obj_id.astype(np.float32)
    return TrianglePool(
        v0=to_device_f32(v0),
        e1=to_device_f32(v1 - v0),
        e2=to_device_f32(v2 - v0),
        n0=to_device_f32(tri_n[:, 0]),
        n1=to_device_f32(tri_n[:, 1]),
        n2=to_device_f32(tri_n[:, 2]),
        uv0=to_device_f32(tri_uv[:, 0]),
        uv1=to_device_f32(tri_uv[:, 1]),
        uv2=to_device_f32(tri_uv[:, 2]),
        obj_id=to_device_i32(obj_id),
        mat_id=to_device_i32(mat_id),
        shade=to_device_f32(shade),
    )


def compile_bvh(
    tri_v: np.ndarray,
    sah: bool = True,
    bins: int = 8,
    force_split_cap: int | None = 4,
) -> tuple[BVHArrays, BuildStats]:
    """Build + thread a BVH over [N, 3, 3] triangle vertices."""
    host, idx, stats = bvh_builder.build_bvh(
        tri_v, sah=sah, bins=bins, force_split_cap=force_split_cap
    )
    hit, miss = bvh_builder.thread_links(host.left, host.right, host.tri_count, host.axis)
    return (
        BVHArrays(
            node_min=to_device_f32(host.node_min),
            node_max=to_device_f32(host.node_max),
            left_first=to_device_i32(host.left_first),
            tri_count=to_device_i32(host.tri_count),
            hit_link=to_device_i32(hit),
            miss_link=to_device_i32(miss),
            tri_indices=to_device_i32(idx),
            max_leaf=stats.max_leaf,
            max_depth=stats.max_depth,
        ),
        stats,
    )
