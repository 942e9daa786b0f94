"""Fused Whitted level-0 kernel: primary traverse + hit-info interpolation
+ point-light SHADOW walk + dielectric/mirror child setup in ONE Pallas
program per ray tile.

Why (r5 probe_whitted_glue): the host Whitted level pays, per frame, a
primary traversal launch, a [R,16] shade-record gather, a SECOND any-hit
kernel launch for the shadow rays, and the glue between them — on the
12-triangle config-1 scene that framework overhead alone capped the frame
at ~12 ms (19 Mrays/s) while the actual intersection work is microseconds.
Fusing the whole level into the kernel leaves the host only vector math,
the (chunked, skippable) sky/texel gathers, and the film.

Replicates 2. WhittedStyle/renderer.cpp:21-126 semantics exactly as
render/whitted._shade_level does:
* FindNearest = light quad -> floor plane -> triangle accel
  (file_scene.cpp:170-175), back-face normal flip;
* diffuse: point-light direct illumination with shadow max distance
  dist - 2*EPSILON and the reference's shadow quirk — triangles occlude
  regardless of distance (t reset to RAY_FAR; file_scene.cpp:177-187,
  scene/query.is_occluded) — via the shared traverser's any_hit mode;
* dielectric: Schlick Fresnel, BOTH branches emitted (the kernel returns
  fr + both directions; the host computes the child weights);
* textures: nearest-texel INDEX record (texture.h:61-96 truncation),
  gathered host-side in a chunk-skipped epilogue — albedo only scales
  contributions/weights, so the deferral is exact.

Outputs per ray (pixel order): t, flags (miss|lit|surf|vis|emit1|emit2),
mat id, texel index, irradiance scale (N·L/dist², shadow-masked), the
reflected and transmitted directions, Fresnel, and the primary walk's
step/test counters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.ops.pallas import ptraverse
from cpu_ray_tracer_tpu.ops.pallas import wavefront_pt as _wf
from cpu_ray_tracer_tpu.ops.pallas.packet_bvh import STACK_CAP
from cpu_ray_tracer_tpu.ops.pallas.wavefront_pt import (
    _MAT_F,
    _P_FLOOR_INV_TO,
    _P_IOR,
    _P_LIGHT_INV_T,
    _P_LIGHT_N,
    _P_LIGHT_POS,
    _P_LIGHT_SIZE,
    _mat_select,
    pack_params,
)

EPS = constants.SHADE_EPS
RAY_FAR = constants.RAY_FAR

F_MISS = 1
F_LIT = 2
F_SURF = 4
F_VIS = 8
F_EMIT1 = 16
F_EMIT2 = 32


def _kernel(
    params_ref,
    aabb_ref, meta2_ref, links_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, iflags_ref,
    tris_ref, shade_ref,
    # outputs
    t_ref, flags_ref, mat_ref, tex_ref, irr_ref,
    rdx_ref, rdy_ref, rdz_ref, tdx_ref, tdy_ref, tdz_ref, fr_ref,
    trav_ref, test_ref,
    stack_ref,
    *,
    n_mats: int,
    root: int,
    max_steps: int,
    meta_shade: bool,
    use_stack: bool,
    roots: tuple = (),
):
    shape = _wf.TILE_SHAPE

    traverse = ptraverse.make_traverser(
        aabb_ref, meta2_ref, links_ref, tris_ref, shade_ref, stack_ref,
        shape=shape, root=root, roots=roots, max_steps=max_steps,
        meta_shade=meta_shade, use_stack=use_stack,
    )
    traverse_any = ptraverse.make_traverser(
        aabb_ref, meta2_ref, links_ref, tris_ref, shade_ref, stack_ref,
        shape=shape, root=root, roots=roots, max_steps=max_steps,
        meta_shade=meta_shade, use_stack=use_stack, any_hit=True,
    )

    p = params_ref
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    iflags = iflags_ref[0]
    alive = iflags & 1
    ins = (iflags & 2) > 0

    def majority_octant(ddx, ddy, ddz, live):
        oct_ = (
            (ddx < 0).astype(jnp.int32)
            + 2 * (ddy < 0).astype(jnp.int32)
            + 4 * (ddz < 0).astype(jnp.int32)
        )
        best_o8 = jnp.int32(0)
        best_cnt = jnp.int32(-1)
        for cand in range(8):
            cnt = jnp.sum(((oct_ == cand) & (live > 0)).astype(jnp.int32))
            take = cnt > best_cnt
            best_o8 = jnp.where(take, jnp.int32(cand), best_o8)
            best_cnt = jnp.maximum(cnt, best_cnt)
        return best_o8

    best_o8 = majority_octant(dx, dy, dz, alive)

    # light quad then floor plane, reducing t (find_nearest order)
    it = [p[_P_LIGHT_INV_T + i] for i in range(16)]
    t = jnp.full(shape, RAY_FAR, jnp.float32)
    oyq = ox * it[4] + oy * it[5] + oz * it[6] + it[7]
    dyq = dx * it[4] + dy * it[5] + dz * it[6]
    dyq = jnp.where(jnp.abs(dyq) < 1e-20, 1e-20, dyq)
    t_q = oyq / -dyq
    oxq = ox * it[0] + oy * it[1] + oz * it[2] + it[3]
    ozq = ox * it[8] + oy * it[9] + oz * it[10] + it[11]
    dxq = dx * it[0] + dy * it[1] + dz * it[2]
    dzq = dx * it[8] + dy * it[9] + dz * it[10]
    ixq = oxq + t_q * dxq
    izq = ozq + t_q * dzq
    size = p[_P_LIGHT_SIZE]
    hit_q = (
        (t_q < t) & (t_q > 0.0)
        & (ixq > -size) & (ixq < size) & (izq > -size) & (izq < size)
    )
    t = jnp.where(hit_q, t_q, t)
    dyf = jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    t_f = -(oy + 1.0) / dyf
    hit_f = (t_f < t) & (t_f > 0.0)
    t = jnp.where(hit_f, t_f, t)

    t, slot, nx, ny, nz, tu, tv, mat, steps, tests = traverse(
        ox, oy, oz, dx, dy, dz, t, alive, best_o8
    )
    live_mask = alive > 0
    trav_ref[0] = jnp.where(live_mask, steps, 0)
    test_ref[0] = jnp.where(live_mask, tests, 0)

    tri_hit = slot >= 0
    obj = jnp.where(tri_hit, 2, jnp.where(hit_f, 1, jnp.where(hit_q, 0, -1)))
    hit = (obj >= 0) & live_mask
    miss = (~(obj >= 0)) & live_mask

    # hit info (scene/query.get_hit_info)
    point_x = ox + t * dx
    point_y = oy + t * dy
    point_z = oz + t * dz
    sq = nx * nx + ny * ny + nz * nz
    rn = jax.lax.rsqrt(jnp.maximum(sq, 1e-20))
    is_floor = obj == 1
    is_lightq = obj == 0
    nrm_x = jnp.where(tri_hit, nx * rn, jnp.where(is_lightq, p[_P_LIGHT_N], 0.0))
    nrm_y = jnp.where(tri_hit, ny * rn, jnp.where(is_lightq, p[_P_LIGHT_N + 1], 1.0))
    nrm_z = jnp.where(tri_hit, nz * rn, jnp.where(is_lightq, p[_P_LIGHT_N + 2], 0.0))
    fito = p[_P_FLOOR_INV_TO]
    fu = point_x * fito
    fv = point_z * fito
    fu = fu - jnp.floor(fu)
    fv = fv - jnp.floor(fv)
    uvx = jnp.where(tri_hit, tu, jnp.where(is_floor, fu, 0.0))
    uvy = jnp.where(tri_hit, tv, jnp.where(is_floor, fv, 0.0))
    mat_id = jnp.where(tri_hit, mat, jnp.where(is_lightq, 0, 1))
    mat_id = jnp.where(obj < 0, n_mats - 1, mat_id)
    flip = (nrm_x * dx + nrm_y * dy + nrm_z * dz) > 0
    nrm_x = jnp.where(flip, -nrm_x, nrm_x)
    nrm_y = jnp.where(flip, -nrm_y, nrm_y)
    nrm_z = jnp.where(flip, -nrm_z, nrm_z)

    refl = _mat_select(p, mat_id, 3, n_mats)
    refr = _mat_select(p, mat_id, 4, n_mats)
    is_light_m = _mat_select(p, mat_id, 8, n_mats) > 0.5
    has_tex = _mat_select(p, mat_id, 9, n_mats) > 0.5
    tex_off_i = (
        _mat_select(p, mat_id, 10, n_mats).astype(jnp.int32) * 4096
        + _mat_select(p, mat_id, 11, n_mats).astype(jnp.int32)
    )
    tex_w = _mat_select(p, mat_id, 12, n_mats)
    tex_h = _mat_select(p, mat_id, 13, n_mats)

    is_light = is_light_m & hit
    surf = hit & (~is_light)

    # nearest-texel record for ANY textured hit surface (whitted uses
    # albedo on every branch: diffuse local term AND child weights)
    uu_c = jnp.clip(uvx, 0.0, 1.0)
    vv_c = 1.0 - jnp.clip(uvy, 0.0, 1.0)
    tx = jnp.clip((uu_c * tex_w).astype(jnp.int32), 0, tex_w.astype(jnp.int32) - 1)
    ty = jnp.clip((vv_c * tex_h).astype(jnp.int32), 0, tex_h.astype(jnp.int32) - 1)
    texel_idx = tex_off_i + tx + ty * tex_w.astype(jnp.int32)
    record = surf & has_tex
    tex_ref[0] = jnp.where(record, texel_idx, -1)

    # diffuse: point-light shadow ray (render/common.direct_illumination)
    diff = 1.0 - (refl + refr)
    do_diffuse = surf & (diff > 0.0)
    lx = p[_P_LIGHT_POS] - point_x
    ly = p[_P_LIGHT_POS + 1] - point_y
    lz = p[_P_LIGHT_POS + 2] - point_z
    dist = jnp.sqrt(lx * lx + ly * ly + lz * lz)
    inv_d = 1.0 / jnp.maximum(dist, 1e-20)
    ldx = lx * inv_d
    ldy = ly * inv_d
    ldz = lz * inv_d
    ndotl = nrm_x * ldx + nrm_y * ldy + nrm_z * ldz
    facing = ndotl >= EPS
    sox = point_x + ldx * EPS
    soy = point_y + ldy * EPS
    soz = point_z + ldz * EPS
    dmax = jnp.maximum(dist - 2 * EPS, 1e-6)
    # light quad occludes up to dmax (is_occluded's quad test)
    soyq = sox * it[4] + soy * it[5] + soz * it[6] + it[7]
    sdyq = ldx * it[4] + ldy * it[5] + ldz * it[6]
    sdyq = jnp.where(jnp.abs(sdyq) < 1e-20, 1e-20, sdyq)
    st_q = soyq / -sdyq
    soxq = sox * it[0] + soy * it[1] + soz * it[2] + it[3]
    sozq = sox * it[8] + soy * it[9] + soz * it[10] + it[11]
    sdxq = ldx * it[0] + ldy * it[1] + ldz * it[2]
    sdzq = ldx * it[8] + ldy * it[9] + ldz * it[10]
    sixq = soxq + st_q * sdxq
    sizq = sozq + st_q * sdzq
    occ_q = (
        (st_q < dmax) & (st_q > 0.0)
        & (sixq > -size) & (sixq < size) & (sizq > -size) & (sizq < size)
    )
    # triangles occlude regardless of distance (the shadow quirk):
    # any-hit walk with t0 = RAY_FAR over the diffuse lanes only
    sh_alive = do_diffuse.astype(jnp.int32)
    sh_o8 = majority_octant(ldx, ldy, ldz, sh_alive)
    sh_t0 = jnp.full(shape, RAY_FAR, jnp.float32)
    sh_out = traverse_any(sox, soy, soz, ldx, ldy, ldz, sh_t0, sh_alive, sh_o8)
    occ_tri = sh_out[1] >= 0
    vis = facing & (~(occ_q | occ_tri)) & do_diffuse
    att = 1.0 / jnp.maximum(dist * dist, 1e-20)
    irr_ref[0] = jnp.where(vis, att * ndotl, 0.0)

    # dielectric terms (render/common.dielectric_terms)
    ior = p[_P_IOR]
    n1 = jnp.where(ins, ior, 1.0)
    n2 = jnp.where(ins, 1.0, ior)
    eta = n1 / n2
    cosi = -(dx * nrm_x + dy * nrm_y + dz * nrm_z)
    cost2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    can = cost2 > 0.0
    tscale = eta * cosi - jnp.sqrt(jnp.abs(cost2))
    td_x = eta * dx + tscale * nrm_x
    td_y = eta * dy + tscale * nrm_y
    td_z = eta * dz + tscale * nrm_z
    a_f = n1 - n2
    b_f = n1 + n2
    r0 = (a_f * a_f) / (b_f * b_f)
    cc = 1.0 - cosi
    fr = jnp.where(can, r0 + (1.0 - r0) * cc * cc * cc * cc * cc, 1.0)
    ddn = dx * nrm_x + dy * nrm_y + dz * nrm_z
    rd_x = dx - 2.0 * nrm_x * ddn
    rd_y = dy - 2.0 * nrm_y * ddn
    rd_z = dz - 2.0 * nrm_z * ddn

    is_mirror = surf & (refl > 0.0)
    is_diel = surf & (~(refl > 0.0)) & (refr > 0.0)
    emit1 = is_mirror | is_diel
    emit2 = is_diel & can

    t_ref[0] = t
    mat_ref[0] = mat_id
    rdx_ref[0] = rd_x
    rdy_ref[0] = rd_y
    rdz_ref[0] = rd_z
    tdx_ref[0] = td_x
    tdy_ref[0] = td_y
    tdz_ref[0] = td_z
    fr_ref[0] = fr
    flags_ref[0] = (
        miss.astype(jnp.int32) * F_MISS
        + is_light.astype(jnp.int32) * F_LIT
        + surf.astype(jnp.int32) * F_SURF
        + vis.astype(jnp.int32) * F_VIS
        + emit1.astype(jnp.int32) * F_EMIT1
        + emit2.astype(jnp.int32) * F_EMIT2
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mats", "root", "max_steps", "meta_shade", "interpret",
        "use_stack", "roots",
    ),
)
def _run(
    params, node_tables, tri_rows, shade_rows, comps,
    *, n_mats: int, root: int, max_steps: int, meta_shade: bool,
    interpret: bool, use_stack: bool, roots: tuple,
):
    n_tiles = comps[0].shape[0]
    TILE_SHAPE = _wf.TILE_SHAPE
    tile_spec = pl.BlockSpec(
        (1, *TILE_SHAPE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem = lambda x: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.int32)
    out_shapes = (
        f32, i32, i32, i32, f32,  # t, flags, mat, tex, irr
        f32, f32, f32, f32, f32, f32, f32,  # rdir3, tdir3, fr
        i32, i32,  # trav, test
    )
    kernel = functools.partial(
        _kernel,
        n_mats=n_mats, root=root, max_steps=max_steps,
        meta_shade=meta_shade, use_stack=use_stack, roots=roots,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            smem(None),  # params
            smem(None), smem(None), smem(None),  # node tables
            *([tile_spec] * 7),  # o3, d3, iflags
            vmem_full, vmem_full,  # tri rows, shade rows
        ],
        out_specs=tuple([tile_spec] * len(out_shapes)),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        interpret=interpret,
    )(params, *node_tables, *comps, tri_rows, shade_rows)


def trace_level0(scene, o, d, inside, interpret: bool = False, alive=None):
    """Run one fused Whitted level on rays (o, d) [R, 3] with per-ray
    `inside` [R] bool and optional `alive` [R] bool (None = all live —
    level 0).  Returns a dict of [R] arrays in input order (see module
    docstring)."""
    pk = scene.packed
    assert pk.node_aabb is not None, "whitted kernel needs SMEM node tables"
    r = o.shape[0]
    TILE = _wf.TILE
    n_tiles = max((r + TILE - 1) // TILE, 1)
    pad = n_tiles * TILE - r

    def pad1(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    if alive is None:
        iflags = jnp.ones((r,), jnp.int32)
    else:
        iflags = alive.astype(jnp.int32)
    if inside is not None:
        iflags = iflags | (inside.astype(jnp.int32) << 1)
    comps = (
        _wf._tile(pad1(o[:, 0], 0.0)), _wf._tile(pad1(o[:, 1], 0.0)), _wf._tile(pad1(o[:, 2], 0.0)),
        _wf._tile(pad1(d[:, 0], 1.0)), _wf._tile(pad1(d[:, 1], 1.0)), _wf._tile(pad1(d[:, 2], 1.0)),
        _wf._tile(pad1(iflags, 0)),
    )
    params = pack_params(scene)
    n_mats = int(scene.materials.albedo.shape[0])
    from cpu_ray_tracer_tpu.ops.pallas import packet_bvh as _pb

    use_stack = (
        _pb._want_stack(pk)
        and pk.node_nearfar is not None
        and pk.num_nodes >= 3
        and 0 < pk.stack_depth <= STACK_CAP
    )
    outs = _run(
        params,
        (pk.node_aabb, pk.node_meta2,
         pk.node_nearfar if use_stack else pk.node_links),
        pk.tri_rows,
        pk.tri_shade_rows,
        comps,
        n_mats=n_mats,
        root=pk.root,
        max_steps=4 * pk.num_nodes + 16,
        meta_shade=pk.meta_in_shade,
        interpret=interpret,
        use_stack=use_stack,
        roots=pk.stack_roots if use_stack else (),
    )
    (t, flags, mat, tex, irr, rdx, rdy, rdz, tdx, tdy, tdz, fr,
     trav, test) = outs

    def unpad(x):
        return x.reshape(-1)[:r]

    fl = unpad(flags)
    return dict(
        t=unpad(t),
        miss=(fl & F_MISS) > 0,
        lit=(fl & F_LIT) > 0,
        surf=(fl & F_SURF) > 0,
        vis=(fl & F_VIS) > 0,
        emit1=(fl & F_EMIT1) > 0,
        emit2=(fl & F_EMIT2) > 0,
        mat=unpad(mat),
        tex_idx=unpad(tex),
        irr_scale=unpad(irr),
        r_dir=jnp.stack([unpad(rdx), unpad(rdy), unpad(rdz)], axis=-1),
        t_dir=jnp.stack([unpad(tdx), unpad(tdy), unpad(tdz)], axis=-1),
        fr=unpad(fr),
        traversed=unpad(trav),
        tested=unpad(test),
    )
