"""In-kernel bounce wavefront: the whole traverse -> shade -> bounce loop of
the path tracer runs inside ONE Pallas program per ray tile, with ray state
(origin, direction, throughput, RNG seed, flags) resident in vector
registers/VMEM across bounces.

Why (docs/ROOFLINE.md): the per-depth pipeline spends ~48 ms of a 127 ms
pass on the HBM round-trip between bounces — compaction resort (~25 ms),
final un-permute (~13 ms), ray-gen/film glue (~10 ms) — plus per-depth
kernel relaunches.  Keeping the state in-register across depths removes all
of it; rays never leave pixel order, so there is nothing to un-permute.
This is the TPU answer to the zero-overhead tail recursion of the
reference's `Sample` (3. PathTracer/renderer.cpp:50-101).

What stays OUTSIDE the kernel (Mosaic has no per-lane dynamic gather):
texture taps and the equirect sky fetch.  Both defer EXACTLY:

* In this integrator a path contributes radiance exactly once, at
  termination (light hit -> throughput * lightColor, sky miss ->
  throughput * sky(d); a depth-limited death contributes nothing) — see
  3. PathTracer/renderer.cpp:52-69: every return path either terminates or
  multiplies the recursive call.
* Albedo only ever MULTIPLIES throughput and never influences the path
  geometry or the RNG stream, so a textured hit's texel factor commutes to
  the end of the product.  The kernel computes the NEAREST-TEXEL INDEX
  (exact integer math, texture.h:61-96 truncation semantics) per bounce and
  accumulates throughput with albedo=1 for textured hits; a chunked XLA
  epilogue gathers the texels and multiplies the per-ray factor product.

Material constants (reflectivity/refractivity/absorption/albedo/texture
geometry) live in an SMEM table; per-lane fields come from an unrolled
select over the (tiny, <= MAX_MATS) material id — no gathers.

The traversal step reuses the packet kernel's proven recipe
(ops/pallas/packet_bvh.py): SMEM scalar node tables, the ordered
two-child SMEM-stack walk by default (threaded links with successor
prefetch for cell forests), whole-row Möller–Trumbore leaves — plus the
in-kernel shading-attribute interpolation (normal/uv/mat ride the while
carry) that is required here because the winning attributes must feed the
bounce math without leaving the kernel.

The kernel runs the first `k_depths` bounce depths; survivors spill ONCE to
the host pipeline's sorted liveness-cascade tail (render/pathtracer.py),
which is already efficient at the few-percent live fractions that remain.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.ops.pallas import packet_bvh as _pb
from cpu_ray_tracer_tpu.ops.pallas.packet_bvh import STACK_CAP

TILE = int(_os.environ.get("CRT_WF_TILE", "4096"))
TILE_SHAPE = (TILE // 128, 128)
MAX_MATS = 16  # unrolled material-select bound (bench scenes have <= 6)
TRI_EPS = constants.TRI_EPS
EPS = constants.SHADE_EPS
RAY_FAR = constants.RAY_FAR
INV2PI_W = np.float32(constants.INVPI * 2.0 * np.pi)  # diffuse estimator weight
UINT_TO_FLOAT = np.float32(2.3283064365387e-10)  # tmplmath.cpp:25

# params layout (f32 SMEM vector)
_P_LIGHT_INV_T = 0  # 16: row-major 4x4
_P_LIGHT_N = 16  # 3: quad normal -light_t[:3,1] (primitives.h:365-369)
_P_LIGHT_SIZE = 19
_P_FLOOR_INV_TO = 20
_P_IOR = 21
_P_LIGHT_POS = 22  # 3: point-light position (query.get_light_pos) — used
#                       by the fused Whitted kernel's in-kernel shadow rays
_P_LIGHT_COLOR = 25  # 3
_P_MATS = 28  # + m*14: albedo3, refl, refr, absorption3, is_light, has_tex,
_MAT_F = 14  #           tex_off_hi, tex_off_lo, tex_w, tex_h
# tex_off rides as TWO f32 fields (hi = off >> 12, lo = off & 0xFFF,
# recombined exactly in i32 inside the kernel): a single f32 field holds
# integers exactly only below 2^24, which gated the kernel off for scenes
# with 4k-HDR skydomes (inside_scene: 23.6M texels).  The split is exact
# for offsets up to 2^31 (i32 range).


def pack_params(scene) -> jnp.ndarray:
    """Flatten the scene scalars + material table for the SMEM params input.

    Texture-table columns are joined per material exactly like
    query.material_fields does (offset/width/height ride the table)."""
    m = scene.materials
    n_mats = int(m.albedo.shape[0])
    tid = m.tex_id
    ts = jnp.maximum(tid, 0)
    atlas = scene.atlas
    has_tex = (tid >= 0).astype(jnp.float32)
    mat_cols = jnp.concatenate(
        [
            m.albedo,
            m.reflectivity[:, None],
            m.refractivity[:, None],
            m.absorption,
            m.is_light[:, None].astype(jnp.float32),
            has_tex[:, None],
            (jnp.where(tid >= 0, atlas.offset[ts], 0) >> 12).astype(jnp.float32)[:, None],
            (jnp.where(tid >= 0, atlas.offset[ts], 0) & 0xFFF).astype(jnp.float32)[:, None],
            jnp.where(tid >= 0, atlas.width[ts], 1).astype(jnp.float32)[:, None],
            jnp.where(tid >= 0, atlas.height[ts], 1).astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [M, _MAT_F]
    # point-light position: middle of the quad minus the small y offset
    # (query.get_light_pos / tlas_file_scene.cpp:191-196)
    lt = scene.light_t
    c1 = jnp.array([-0.5, 0.0, -0.5, 1.0], jnp.float32) @ lt.T
    c2 = jnp.array([0.5, 0.0, 0.5, 1.0], jnp.float32) @ lt.T
    lpos = (c1[:3] + c2[:3]) * 0.5 - jnp.array([0.0, 0.01, 0.0], jnp.float32)
    head = jnp.concatenate(
        [
            scene.light_inv_t.reshape(16),
            -scene.light_t[:3, 1],
            scene.light_size.reshape(1),
            scene.floor_inv_to.reshape(1),
            jnp.array([constants.IOR], jnp.float32),
            lpos,
            scene.light_color.reshape(3),
        ]
    )  # [_P_MATS]
    return jnp.concatenate([head, mat_cols.reshape(n_mats * _MAT_F)])


def _mat_select(params_ref, mat_id, field, n_mats: int):
    """Per-lane material scalar via an unrolled select over the SMEM table
    (the in-kernel analog of query.material_fields' one-hot matmul)."""
    out = jnp.full(mat_id.shape, params_ref[_P_MATS + field], jnp.float32)
    for mm in range(1, n_mats):
        out = jnp.where(
            mat_id == mm, params_ref[_P_MATS + mm * _MAT_F + field], out
        )
    return out


def _xorshift(s):
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s


def _rand_f32(seed):
    """One xorshift32 draw (core/rng.py random_float parity).

    Mosaic has no u32 -> f32 cast; split into two exact 16-bit halves and
    recombine — hi*2^16 is exact in f32 and the single add rounds once, so
    the result is bit-identical to XLA's round-to-nearest conversion."""
    seed = _xorshift(seed)
    bc = jax.lax.bitcast_convert_type
    hi = bc(seed >> 16, jnp.int32).astype(jnp.float32)
    lo = bc(seed & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    return seed, (hi * np.float32(65536.0) + lo) * UINT_TO_FLOAT


def _kernel(
    params_ref,  # SMEM f32 [_P_MATS + M*_MAT_F]
    aabb_ref, meta2_ref, links_ref,  # SMEM node tables (accel/pack.py)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # VMEM ray tiles
    seed_ref, iflags_ref,  # iflags: bit0 alive, bit1 inside
    tris_ref, shade_ref,  # VMEM tri rows (full)
    # outputs (per tile)
    tpx_ref, tpy_ref, tpz_ref,
    oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
    oseed_ref, oflags_ref, oslot_ref, otex_ref,
    trav_ref, test_ref, live_ref,  # SMEM stats [K?, T]
    stack_ref,  # SMEM scratch [STACK_CAP]: deferred far children (stack walk)
    *,
    k_depths: int,
    depth_limit: int,
    depth_base: int,
    n_mats: int,
    root: int,
    max_steps: int,
    meta_shade: bool,
    use_stack: bool,
    roots: tuple = (),
):
    from cpu_ray_tracer_tpu.ops.pallas import ptraverse

    pid = pl.program_id(0)
    shape = TILE_SHAPE

    # the walk itself (fetch/slab/leaf-MT/stack machinery) lives in
    # ptraverse.make_traverser since r5 — shared verbatim with the fused
    # Whitted kernel (whitted_wf.py)
    traverse = ptraverse.make_traverser(
        aabb_ref, meta2_ref, links_ref, tris_ref, shade_ref, stack_ref,
        shape=shape, root=root, roots=roots, max_steps=max_steps,
        meta_shade=meta_shade, use_stack=use_stack,
    )

    def depth_fn(depth, s):
        (ox, oy, oz, dx, dy, dz, seed, tpx, tpy, tpz,
         alive, inside, missed, lit, trav_v, test_v, slot_prev) = s

        # majority direction octant over live lanes (ops/traverse_bvh.py
        # ray_octants semantics), computed in-register
        oct_ = (
            (dx < 0).astype(jnp.int32)
            + 2 * (dy < 0).astype(jnp.int32)
            + 4 * (dz < 0).astype(jnp.int32)
        )
        best_o8 = jnp.int32(0)
        best_cnt = jnp.int32(-1)
        for cand in range(8):
            cnt = jnp.sum(((oct_ == cand) & (alive > 0)).astype(jnp.int32))
            take = cnt > best_cnt
            best_o8 = jnp.where(take, jnp.int32(cand), best_o8)
            best_cnt = jnp.maximum(cnt, best_cnt)

        # light quad then floor plane, reducing t (scene/query.find_nearest
        # order, file_scene.cpp:170-175); params are SMEM scalars
        p = params_ref
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
        # floor: +Y plane at d=1 (template/primitives.h:107-111)
        dyf = jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
        t_f = -(oy + 1.0) / dyf
        hit_f = (t_f < t) & (t_f > 0.0)
        t = jnp.where(hit_f, t_f, t)

        t, slot, nx, ny, nz, tu, tv, mat, steps, tests = traverse(
            ox, oy, oz, dx, dy, dz, t, alive, best_o8
        )
        live_mask = alive > 0
        trav_v = trav_v + jnp.where(live_mask, steps, 0)
        test_v = test_v + jnp.where(live_mask, tests, 0)

        tri_hit = slot >= 0
        # classification (find_nearest): tri wins when the walk found one;
        # else floor beats quad by construction (floor tested against t_q)
        obj = jnp.where(
            tri_hit, 2, jnp.where(hit_f, 1, jnp.where(hit_q, 0, -1))
        )
        hit = (obj >= 0) & live_mask
        miss = (~(obj >= 0)) & live_mask
        missed = missed | miss.astype(jnp.int32)
        # depth cutoff AFTER the miss record (renderer.cpp:52-55)
        if depth_base + depth >= depth_limit:
            hit = jnp.zeros_like(hit)

        # hit info (scene/query.get_hit_info): normal/uv/mat per class
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
        # floor uv (plane_uv): frac(x * invto), frac(z * invto)
        fito = p[_P_FLOOR_INV_TO]
        fu = point_x * fito
        fv = point_z * fito
        fu = fu - jnp.floor(fu)
        fv = fv - jnp.floor(fv)
        uvx = jnp.where(tri_hit, tu, jnp.where(is_floor, fu, 0.0))
        uvy = jnp.where(tri_hit, tv, jnp.where(is_floor, fv, 0.0))
        mat_id = jnp.where(tri_hit, mat, jnp.where(is_lightq, 0, 1))
        mat_id = jnp.where(obj < 0, n_mats - 1, mat_id)  # error material
        # back-face flip
        flip = (nrm_x * dx + nrm_y * dy + nrm_z * dz) > 0
        nrm_x = jnp.where(flip, -nrm_x, nrm_x)
        nrm_y = jnp.where(flip, -nrm_y, nrm_y)
        nrm_z = jnp.where(flip, -nrm_z, nrm_z)

        # material fields (SMEM table select)
        alb_x = _mat_select(p, mat_id, 0, n_mats)
        alb_y = _mat_select(p, mat_id, 1, n_mats)
        alb_z = _mat_select(p, mat_id, 2, n_mats)
        refl = _mat_select(p, mat_id, 3, n_mats)
        refr = _mat_select(p, mat_id, 4, n_mats)
        abs_x = _mat_select(p, mat_id, 5, n_mats)
        abs_y = _mat_select(p, mat_id, 6, n_mats)
        abs_z = _mat_select(p, mat_id, 7, n_mats)
        is_light_m = _mat_select(p, mat_id, 8, n_mats) > 0.5
        has_tex = _mat_select(p, mat_id, 9, n_mats) > 0.5
        tex_off_i = (
            _mat_select(p, mat_id, 10, n_mats).astype(jnp.int32) * 4096
            + _mat_select(p, mat_id, 11, n_mats).astype(jnp.int32)
        )
        tex_w = _mat_select(p, mat_id, 12, n_mats)
        tex_h = _mat_select(p, mat_id, 13, n_mats)

        is_light = is_light_m & hit
        lit = lit | is_light.astype(jnp.int32)
        surf = hit & (~is_light)

        # Beer transmittance while inside (renderer.cpp:76-81 semantics as
        # implemented by the host bounce: applied to the throughput update
        # of continuing rays only)
        ins = inside > 0
        med_x = jnp.where(ins, jnp.exp(abs_x * (-t)), 1.0)
        med_y = jnp.where(ins, jnp.exp(abs_y * (-t)), 1.0)
        med_z = jnp.where(ins, jnp.exp(abs_z * (-t)), 1.0)

        # RNG: exactly 4 draws/bounce for every lane (host-bounce parity)
        seed, r_lobe = _rand_f32(seed)
        pick_mirror = surf & (r_lobe < refl)
        pick_diel = surf & (~pick_mirror) & (r_lobe < refl + refr)
        pick_diff = surf & (~pick_mirror) & (~pick_diel)

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
        seed, r_fresnel = _rand_f32(seed)
        take_refract = pick_diel & can & (r_fresnel > fr)

        # diffuse: uniform hemisphere (render/common.uniform_hemisphere)
        seed, r1 = _rand_f32(seed)
        seed, r2 = _rand_f32(seed)
        z = r1
        phi = np.float32(2.0 * np.pi) * r2
        rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        hx = rxy * jnp.cos(phi)
        hy = rxy * jnp.sin(phi)
        # Frisvad basis (render/common.orthonormal_basis)
        sgn = jnp.where(nrm_z >= 0.0, 1.0, -1.0)
        af = -1.0 / (sgn + nrm_z)
        bf = nrm_x * nrm_y * af
        t1x = 1.0 + sgn * nrm_x * nrm_x * af
        t1y = sgn * bf
        t1z = -sgn * nrm_x
        t2x = bf
        t2y = sgn + nrm_y * nrm_y * af
        t2z = -nrm_y
        dd_x = t1x * hx + t2x * hy + nrm_x * z
        dd_y = t1y * hx + t2y * hy + nrm_y * z
        dd_z = t1z * hx + t2z * hy + nrm_z * z
        cosr = jnp.maximum(dd_x * nrm_x + dd_y * nrm_y + dd_z * nrm_z, 0.0)

        # albedo: textured hits contribute 1 here and record a texel index
        # for the epilogue (texture.h:61-96 nearest semantics, exact ints)
        uu_c = jnp.clip(uvx, 0.0, 1.0)
        vv_c = 1.0 - jnp.clip(uvy, 0.0, 1.0)
        tx = jnp.clip((uu_c * tex_w).astype(jnp.int32), 0, tex_w.astype(jnp.int32) - 1)
        ty = jnp.clip((vv_c * tex_h).astype(jnp.int32), 0, tex_h.astype(jnp.int32) - 1)
        texel_idx = tex_off_i + tx + ty * tex_w.astype(jnp.int32)
        record = surf & has_tex
        tex_out = jnp.where(record, texel_idx, -1)
        alb_x = jnp.where(record, 1.0, alb_x)
        alb_y = jnp.where(record, 1.0, alb_y)
        alb_z = jnp.where(record, 1.0, alb_z)

        dw = INV2PI_W * cosr
        lw_x = jnp.where(pick_diff, alb_x * dw, alb_x)
        lw_y = jnp.where(pick_diff, alb_y * dw, alb_y)
        lw_z = jnp.where(pick_diff, alb_z * dw, alb_z)
        tpx = jnp.where(surf, tpx * med_x * lw_x, tpx)
        tpy = jnp.where(surf, tpy * med_y * lw_y, tpy)
        tpz = jnp.where(surf, tpz * med_z * lw_z, tpz)

        nd_x = jnp.where(pick_diff, dd_x, jnp.where(take_refract, td_x, rd_x))
        nd_y = jnp.where(pick_diff, dd_y, jnp.where(take_refract, td_y, rd_y))
        nd_z = jnp.where(pick_diff, dd_z, jnp.where(take_refract, td_z, rd_z))
        ox = jnp.where(surf, point_x + nd_x * EPS, ox)
        oy = jnp.where(surf, point_y + nd_y * EPS, oy)
        oz = jnp.where(surf, point_z + nd_z * EPS, oz)
        dx = jnp.where(surf, nd_x, dx)
        dy = jnp.where(surf, nd_y, dy)
        dz = jnp.where(surf, nd_z, dz)
        inside = (take_refract & (~ins)).astype(jnp.int32)
        alive = surf.astype(jnp.int32)
        slot_prev = jnp.where(surf, slot, slot_prev)
        return (
            (ox, oy, oz, dx, dy, dz, seed, tpx, tpy, tpz,
             alive, inside, missed, lit, trav_v, test_v, slot_prev),
            tex_out,
        )

    # init state from refs; throughput starts at 1 — per-depth callers fold
    # the kernel's multiplicative factor into their carried throughput
    iflags = iflags_ref[0]
    state = (
        ox_ref[0], oy_ref[0], oz_ref[0],
        dx_ref[0], dy_ref[0], dz_ref[0],
        seed_ref[0],
        jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32),
        iflags & 1,  # alive
        (iflags >> 1) & 1,  # inside
        jnp.zeros(shape, jnp.int32),  # missed
        jnp.zeros(shape, jnp.int32),  # lit
        jnp.zeros(shape, jnp.int32),  # traversed
        jnp.zeros(shape, jnp.int32),  # tested
        jnp.full(shape, -1, jnp.int32),  # last hit slot (tail locus)
    )
    for depth in range(k_depths):
        n_alive = jnp.sum(state[10])
        live_ref[depth, pid] = n_alive
        state, tex_out = jax.lax.cond(
            n_alive > 0,
            functools.partial(depth_fn, depth),
            lambda s: (s, jnp.full(shape, -1, jnp.int32)),
            state,
        )
        otex_ref[0, depth] = tex_out

    (ox, oy, oz, dx, dy, dz, seed, tpx, tpy, tpz,
     alive, inside, missed, lit, trav_v, test_v, slot_prev) = state
    tpx_ref[0] = tpx
    tpy_ref[0] = tpy
    tpz_ref[0] = tpz
    oox_ref[0] = ox
    ooy_ref[0] = oy
    ooz_ref[0] = oz
    odx_ref[0] = dx
    ody_ref[0] = dy
    odz_ref[0] = dz
    oseed_ref[0] = seed
    oflags_ref[0] = missed + 2 * lit + 4 * alive + 8 * inside
    oslot_ref[0] = slot_prev
    # exact per-ray step/test attribution: each lane accumulated the tile's
    # shared walk only while IT was alive (tighter than the packet kernel's
    # group-uniform broadcast)
    trav_ref[0] = trav_v
    test_ref[0] = test_v


def _tile(x):
    return x.reshape(-1, *TILE_SHAPE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_depths", "depth_limit", "depth_base", "n_mats", "root",
        "max_steps", "meta_shade", "interpret", "use_stack", "roots",
    ),
)
def _run(
    params, node_tables, tri_rows, shade_rows, comps,
    k_depths: int, depth_limit: int, depth_base: int, n_mats: int, root: int,
    max_steps: int, meta_shade: bool, interpret: bool, use_stack: bool = False,
    roots: tuple = (),
):
    n_tiles = comps[0].shape[0]
    tile_spec = pl.BlockSpec((1, *TILE_SHAPE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tex_spec = pl.BlockSpec(
        (1, k_depths, *TILE_SHAPE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.int32)
    u32 = jax.ShapeDtypeStruct((n_tiles, *TILE_SHAPE), jnp.uint32)
    texs = jax.ShapeDtypeStruct((n_tiles, k_depths, *TILE_SHAPE), jnp.int32)
    statk = jax.ShapeDtypeStruct((k_depths, n_tiles), jnp.int32)
    out_shapes = [
        f32, f32, f32,  # throughput
        f32, f32, f32, f32, f32, f32,  # o, d
        u32, i32, i32, texs,  # seed, flags, slot, texel records
        i32, i32, statk,  # traversed, tested, live counts
    ]
    out_specs = [tile_spec] * 12 + [tex_spec] + [tile_spec] * 2 + [smem_spec]
    kernel = functools.partial(
        _kernel,
        k_depths=k_depths, depth_limit=depth_limit, depth_base=depth_base,
        n_mats=n_mats, root=root, max_steps=max_steps, meta_shade=meta_shade,
        use_stack=use_stack, roots=roots,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=[smem_spec] * 4 + [tile_spec] * 8 + [full] * 2,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        interpret=interpret,
    )(params, *node_tables, *comps, tri_rows, shade_rows)


def trace(
    scene, o, d, seeds, k_depths: int, depth_limit: int,
    interpret: bool = False, alive=None, inside=None, depth_base: int = 0,
):
    """Run `k_depths` bounce depths (starting at logical depth `depth_base`)
    fully in-kernel.

    Returns a dict of [R]-shaped arrays in INPUT (pixel) order:
    tp [R,3] (MULTIPLICATIVE throughput factor sans texel factors — callers
    fold it into their carried throughput; starts at 1), o/d [R,3]
    (continuation or terminal ray), seed [R] u32, missed/lit/alive/inside
    [R] bool, tex_idx [R, k_depths] i32 (-1 = no textured hit), locus [R]
    i32 (winning leaf slot of the last hit, -1 where none), traversed/
    tested [R] i32 (exact per-ray attribution), live_counts [k_depths] i32
    (rays alive entering each depth — exact rays_traced accounting).

    `alive`/`inside` ([R] bool) carry per-depth state in: the per-depth
    tail mode (render/pathtracer._bounce_step_kernel) calls this once per
    sorted bounce depth with k_depths=1."""
    pk = scene.packed
    assert pk.node_aabb is not None, "wavefront kernel needs SMEM node tables"
    r = o.shape[0]
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
        _tile(pad1(o[:, 0], 0.0)), _tile(pad1(o[:, 1], 0.0)), _tile(pad1(o[:, 2], 0.0)),
        _tile(pad1(d[:, 0], 1.0)), _tile(pad1(d[:, 1], 1.0)), _tile(pad1(d[:, 2], 1.0)),
        _tile(pad1(seeds.astype(jnp.uint32), 0)),
        _tile(pad1(iflags, 0)),
    )
    params = pack_params(scene)
    n_mats = int(scene.materials.albedo.shape[0])
    assert n_mats <= MAX_MATS
    # stack-descent walk when the pack carries the near/far table and the
    # tree fits the scratch stack (same gate as packet_bvh.traverse)
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
        k_depths=k_depths,
        depth_limit=depth_limit,
        depth_base=depth_base,
        n_mats=n_mats,
        root=pk.root,
        max_steps=4 * pk.num_nodes + 16,
        meta_shade=pk.meta_in_shade,
        interpret=interpret,
        use_stack=use_stack,
        roots=pk.stack_roots if use_stack else (),
    )
    (tpx, tpy, tpz, oox, ooy, ooz, odx, ody, odz,
     oseed, oflags, oslot, otex, trav, test, live) = outs

    def unpad(x):
        return x.reshape(-1)[:r]

    flags = unpad(oflags)
    tex_idx = jnp.moveaxis(otex, 1, 0).reshape(k_depths, -1)[:, :r].T  # [R, K]
    return dict(
        tp=jnp.stack([unpad(tpx), unpad(tpy), unpad(tpz)], axis=-1),
        o=jnp.stack([unpad(oox), unpad(ooy), unpad(ooz)], axis=-1),
        d=jnp.stack([unpad(odx), unpad(ody), unpad(odz)], axis=-1),
        seed=unpad(oseed),
        missed=(flags & 1) > 0,
        lit=(flags & 2) > 0,
        alive=(flags & 4) > 0,
        inside=(flags & 8) > 0,
        tex_idx=tex_idx,
        locus=unpad(oslot),
        traversed=unpad(trav),
        tested=unpad(test),
        live_counts=jnp.sum(live, axis=1),
    )
