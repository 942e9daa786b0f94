"""Lockstep 3D-DDA uniform-grid traversal (Amanatides–Woo) over ray batches.

Device replacement for Grid::IntersectGrid (infra/grid.cpp:94-153): per ray
the state is the integer cell coordinate + the three next-crossing
distances; one loop iteration tests a fixed-size chunk of the current cell's
CSR triangle list (masked) or, when the cell is exhausted, steps the DDA to
the next cell.  The reference's branchless 3-bit LUT axis pick
(grid.cpp:140-144) is kept verbatim — it vectorizes as-is.

Deviation (documented): rays starting OUTSIDE the grid are first advanced to
their entry point; the reference clamps the origin cell instead
(grid.cpp:98-100), which is only correct for origins inside the bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.accel.types import GridArrays, TrianglePool
from cpu_ray_tracer_tpu.ops import intersect

# grid.cpp:143: map[k] for k = (x<y)<<2 | (x<z)<<1 | (y<z)
_AXIS_LUT = np.array([2, 1, 2, 1, 2, 2, 0, 0], np.int32)

CHUNK = 4  # triangles tested per loop step while inside a cell


def traverse(
    grid: GridArrays,
    tris: TrianglePool,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t0: jnp.ndarray,
    any_hit: bool = False,
    max_steps: int | None = None,
):
    r = o.shape[0]
    rx, ry, rz = grid.resolution
    res = jnp.array([rx, ry, rz], jnp.int32)
    rd = 1.0 / d
    bmin = grid.bounds_min
    bmax = grid.bounds_max
    cell_size = (bmax - bmin) / res.astype(jnp.float32)

    # slab test to find the entry point (and cull rays missing the grid)
    t1 = (bmin - o) * rd
    t2 = (bmax - o) * rd
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hits_grid = (tf >= tn) & (tf > 0.0) & (tn < t0)
    t_enter = jnp.maximum(tn, 0.0)
    # nudge inside to land in a valid cell
    p_enter = o + (t_enter + 1e-5)[..., None] * d

    cell = jnp.clip(
        jnp.floor((p_enter - bmin) / cell_size).astype(jnp.int32), 0, res - 1
    )
    dpos = d >= 0
    step = jnp.where(dpos, 1, -1).astype(jnp.int32)
    exit_ = jnp.where(dpos, res, -1).astype(jnp.int32)
    delta = jnp.where(dpos, cell_size * rd, -cell_size * rd)
    next_bound = jnp.where(dpos, (cell + 1).astype(jnp.float32), cell.astype(jnp.float32))
    next_t = (next_bound * cell_size + bmin - o) * rd

    if max_steps is None:
        max_steps = int(rx + ry + rz + 3) * (max(grid.max_cell_len, 1) // CHUNK + 2)

    state = dict(
        cell=cell,
        next_t=next_t,
        k=jnp.zeros((r,), jnp.int32),  # cursor within the current cell's list
        active=hits_grid,
        t=t0.astype(jnp.float32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        tri=jnp.full((r,), -1, jnp.int32),
        traversed=jnp.zeros((r,), jnp.int32),
        tested=jnp.zeros((r,), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )
    lut = jnp.asarray(_AXIS_LUT)

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < max_steps)

    def body(s):
        cell = s["cell"]
        active = s["active"]
        cell_id = cell[..., 0] + cell[..., 1] * rx + cell[..., 2] * (rx * ry)
        cell_id = jnp.clip(cell_id, 0, rx * ry * rz - 1)
        start = grid.cell_start[cell_id]
        end = grid.cell_start[cell_id + 1]
        k = s["k"]
        in_cell = (start + k) < end
        testing = active & in_cell

        t = s["t"]
        u = s["u"]
        v = s["v"]
        tri = s["tri"]
        tested = s["tested"]
        for c in range(CHUNK):
            slot = start + k + c
            ok = testing & (slot < end)
            tid = grid.cell_tris[jnp.clip(slot, 0, grid.cell_tris.shape[0] - 1)]
            tk, uk, vk, hk = intersect.moller_trumbore(
                o, d, tris.v0[tid], tris.e1[tid], tris.e2[tid], t
            )
            hk = hk & ok
            t = jnp.where(hk, tk, t)
            u = jnp.where(hk, uk, u)
            v = jnp.where(hk, vk, v)
            tri = jnp.where(hk, tid, tri)
            tested = tested + ok.astype(jnp.int32)

        # advance: rays done with their cell step the DDA
        stepping = active & (~in_cell)
        nt = s["next_t"]
        kxy = (nt[..., 0] < nt[..., 1]).astype(jnp.int32)
        kxz = (nt[..., 0] < nt[..., 2]).astype(jnp.int32)
        kyz = (nt[..., 1] < nt[..., 2]).astype(jnp.int32)
        axis = lut[(kxy << 2) + (kxz << 1) + kyz]
        axis_t = jnp.take_along_axis(nt, axis[..., None], axis=-1)[..., 0]
        # early out: current best t closer than next crossing (grid.cpp:146)
        done_by_t = stepping & (t < axis_t)
        new_cell_ax = (
            jnp.take_along_axis(cell, axis[..., None], axis=-1)[..., 0]
            + jnp.take_along_axis(step, axis[..., None], axis=-1)[..., 0]
        )
        out_of_grid = stepping & (
            new_cell_ax == jnp.take_along_axis(exit_, axis[..., None], axis=-1)[..., 0]
        )
        ax_onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_new = cell + ax_onehot * step * stepping[..., None].astype(jnp.int32)
        nt_new = nt + ax_onehot.astype(jnp.float32) * delta * stepping[..., None].astype(jnp.float32)

        k_new = jnp.where(testing, k + CHUNK, jnp.where(stepping, 0, k))
        active_new = active & ~(done_by_t | out_of_grid)
        if any_hit:
            active_new = active_new & (tri < 0)

        return dict(
            cell=cell_new,
            next_t=nt_new,
            k=k_new,
            active=active_new,
            t=t,
            u=u,
            v=v,
            tri=tri,
            traversed=s["traversed"] + stepping.astype(jnp.int32),
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
