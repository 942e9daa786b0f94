"""Monte-Carlo path tracer as a bounded megabatch loop.

The reference's recursive `Sample` (3. PathTracer/renderer.cpp:50-101) is
tail recursion with a single stochastic child per bounce — exactly a loop.
Here the whole frame (or shard) of rays advances in lockstep through
`depth_limit + 1` bounce iterations carrying SoA state
{origin, dir, throughput, inside, seed, alive}; terminated lanes are masked.

Estimator parity (renderer.cpp:84-99):
* one uniform draw r selects the lobe: r < refl -> mirror;
  r < refl + refr -> dielectric (stochastic Fresnel choice); else diffuse;
* diffuse bounce: uniform-hemisphere direction, estimator
  brdf * 2pi * cos(R, N);
* miss -> skydome BEFORE the depth check; light hit -> light color (the sky
  gather itself is deferred to one post-loop pass — a ray escapes at most
  once);
* Beer absorption while inside; fresh rays reset `inside` except the
  refracted child (template/ray.h default — reference behavior kept).

Wavefront compaction: before every bounce >= 1 the ray state is globally
re-sorted by (terminated-last, origin Morton code, direction octant) and
processed in CHUNKS; a chunk whose slots lie wholly beyond the live-ray
count is skipped with `lax.cond` — real, unbiased work skipping (XLA
branches at runtime), adaptive to how fast paths terminate.  The sort also
feeds the Pallas packet kernel direction/locality-coherent tiles.

RNG: stateless per-ray xorshift32 streams (core/rng.py) seeded by
(pixel, sample) — the vectorizable replacement for the reference's per-tile
sequential stream.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.core import rng as rng_mod
from cpu_ray_tracer_tpu.ops.traverse_bvh import ray_octants
from cpu_ray_tracer_tpu.render import common
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.types import DeviceScene

EPS = constants.SHADE_EPS

# per-ray state keys permuted by the compaction sort
_RAY_KEYS = (
    "o", "d", "seed", "throughput", "radiance", "inside", "alive",
    "missed", "traversed", "tested", "pixel", "locus",
)


def _permute_state(state: dict, perm) -> dict:
    """Apply one permutation to the whole per-ray state with a SINGLE gather:
    all fields are packed (ints bitcast to f32 — a gather only moves bytes)
    into one [R, 18] array, gathered once, then split back.  TPU gathers
    cost ~per-index, so one wide gather beats a dozen 1-3-lane ones —
    but stay at or under 24 lanes: the TPU row-gather lowering has a
    cliff at 25+ lanes (measured 10.4 ms at [R,24] vs 37.7 ms at [R,25]
    for R=921600), which is why the bool flags share one bit-packed lane
    and the miss record is a single bit (see sample_radiance).

    `perm` is either gather indices (sources), or ("scatter", pos) with
    DESTINATION indices (the counting-sort path computes the inverse
    permutation directly — applying it as a scatter skips the argsort)."""
    bc = jax.lax.bitcast_convert_type
    flags = (
        state["inside"].astype(jnp.int32)
        + 2 * state["alive"].astype(jnp.int32)
        + 4 * state["missed"].astype(jnp.int32)
    )
    cols = [
        state["o"],  # 0:3
        state["d"],  # 3:6
        state["throughput"],  # 6:9
        state["radiance"],  # 9:12
        bc(state["seed"], jnp.float32)[..., None],  # 12
        bc(flags, jnp.float32)[..., None],  # 13 (inside|alive|missed bits)
        bc(state["traversed"], jnp.float32)[..., None],  # 14
        bc(state["tested"], jnp.float32)[..., None],  # 15
        bc(state["pixel"], jnp.float32)[..., None],  # 16
        bc(state["locus"], jnp.float32)[..., None],  # 17
    ]
    stacked = jnp.concatenate(cols, axis=1)
    if isinstance(perm, tuple) and perm[0] == "scatter":
        packed = jnp.zeros_like(stacked).at[perm[1]].set(stacked, unique_indices=True)
    else:
        packed = stacked[perm]
    pflags = bc(packed[:, 13], jnp.int32)
    return dict(
        o=packed[:, 0:3],
        d=packed[:, 3:6],
        throughput=packed[:, 6:9],
        radiance=packed[:, 9:12],
        seed=bc(packed[:, 12], jnp.uint32),
        inside=(pflags & 1) > 0,
        alive=(pflags & 2) > 0,
        missed=(pflags & 4) > 0,
        traversed=bc(packed[:, 14], jnp.int32),
        tested=bc(packed[:, 15], jnp.int32),
        pixel=bc(packed[:, 16], jnp.int32),
        locus=bc(packed[:, 17], jnp.int32),
    )


def _compaction_perm(scene: DeviceScene, o, d, alive, locus=None):
    """Compaction sort key (perf-only: the estimator is order-invariant, so
    the image is bit-identical under ANY permutation here).

    Default "locus": STABLE (dead-last, direction octant, previous-hit
    triangle id) — the finest origin-coherence key (rays leaving the same
    triangle share an origin to within one primitive).  With the 18-lane
    permute this beats "octant" (stable octant only, preserving existing
    origin order) by ~2% end-to-end; both beat re-binning by 7-bit Morton
    (31.8 vs 39.5 ms bounce kernel on bunny_teapot).
    CRT_RESORT=morton restores the (dead, Morton, octant) key."""
    oct_ = ray_octants(d)
    mode = _os.environ.get("CRT_RESORT", "locus")
    if mode == "octant_cs":
        # stable 9-bucket counting sort: pos[i] = start[key[i]] + rank-in-
        # bucket via one-hot cumsum — no 32-bit bitonic sort.  Returns the
        # INVERSE permutation (destinations); caller scatters with it.
        key = jnp.where(alive, oct_, jnp.int32(8))
        oh = jax.nn.one_hot(key, 9, dtype=jnp.int32)
        within = jnp.cumsum(oh, axis=0) - oh
        counts = within[-1] + oh[-1]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        pos = jnp.sum(oh * (starts[None, :] + within), axis=1)
        return ("scatter", pos)
    if mode == "octant" or (mode == "locus" and locus is None):
        key = jnp.where(alive, oct_, jnp.int32(8))
        return jnp.argsort(key, stable=True)
    if mode == "locus":
        # (dead, octant, previous-hit triangle): rays leaving the same
        # triangle share an origin to within one primitive — far tighter
        # tile unions than any quantized-origin code
        key = (oct_ << 21) | jnp.clip(locus + 1, 0, (1 << 21) - 1)
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
        return jnp.argsort(key, stable=True)
    root = getattr(scene, "bvh", None)
    if getattr(scene, "shared", None) is not None:
        # shared-instancing mode: mesh-0's root box is object space; the
        # instance-AABB union is the world box
        wmin = jnp.asarray(scene.shared.world_min, jnp.float32)
        wext = jnp.maximum(
            jnp.asarray(scene.shared.world_max, jnp.float32) - wmin, 1e-20
        )
        q = jnp.clip(((o - wmin) / wext) * 127.0, 0.0, 127.0).astype(jnp.int32)

        def spread3(v):
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        morton = spread3(q[..., 0]) | (spread3(q[..., 1]) << 1) | (spread3(q[..., 2]) << 2)
        key = (morton << 3) | oct_
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
        return jnp.argsort(key)
    if root is not None:
        wmin = scene.bvh.node_min[scene.bvh.root]
        wext = jnp.maximum(scene.bvh.node_max[scene.bvh.root] - wmin, 1e-20)
        q = jnp.clip(((o - wmin) / wext) * 127.0, 0.0, 127.0).astype(jnp.int32)

        def spread3(v):
            v = (v | (v << 8)) & 0x0300F00F
            v = (v | (v << 4)) & 0x030C30C3
            v = (v | (v << 2)) & 0x09249249
            return v

        morton = spread3(q[..., 0]) | (spread3(q[..., 1]) << 1) | (spread3(q[..., 2]) << 2)
        key = (morton << 3) | oct_
    else:
        key = oct_
    key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
    return jnp.argsort(key)


def sample_radiance(
    scene: DeviceScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    seeds: jnp.ndarray,
    depth_limit: int = constants.DEPTH_LIMIT,
    differentiable: bool = False,
    compaction_chunks: int | None = None,
):
    """Estimate radiance along rays (o, d) [R, 3] with per-ray uint32 seeds.

    Returns (radiance [R, 3] in the INPUT ray order, stats dict).  The
    per-ray stats (traversed/tested) are in internal compaction order —
    use them only through permutation-invariant reductions.
    `compaction_chunks`: chunks per bounce >= 1 (default 4 when divisible;
    1 disables skipping)."""
    r = o.shape[0]
    if differentiable:
        # No chunking under grad: the per-chunk lax.scan saves its residuals
        # STACKED per chunk ([n_chunks, chunk, ..., 1] — the trailing 1 pads
        # 128x on TPU, OOMing at ~900MB per broadcast), and dead-chunk
        # skipping buys nothing when the backward re-traverses everything
        # anyway.  One full-width program is both smaller and grad-correct.
        compaction_chunks = 1
    elif compaction_chunks is None:
        c = int(_os.environ.get("CRT_COMPACTION_CHUNKS", "48"))
        compaction_chunks = c if r % c == 0 and r >= 4096 else 1

    state = dict(
        o=o,
        d=d,
        seed=seeds,
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        inside=jnp.zeros((r,), jnp.bool_),
        alive=jnp.ones((r,), jnp.bool_),
        # deferred sky (see module docstring): a ray misses AT MOST once and
        # nothing mutates its d/throughput afterwards, so the miss record is
        # ONE BIT — sky is applied post-loop as missed * throughput * sky(d)
        missed=jnp.zeros((r,), jnp.bool_),
        traversed=jnp.zeros((r,), jnp.int32),
        tested=jnp.zeros((r,), jnp.int32),
        pixel=jnp.arange(r, dtype=jnp.int32),
        # previous-hit triangle id: the finest origin-coherence signal for
        # the CRT_RESORT=locus compaction key (-1 until the first hit)
        locus=jnp.full((r,), -1, jnp.int32),
    )

    nearest = query.find_nearest_diff if differentiable else query.find_nearest

    # t-capped two-phase bounce traversal (opt-in, CRT_TCAP=0.1): bounce rays
    # usually hit NEARBY geometry, and a small t0 cap makes the slab test
    # (tmin < t_best) prune almost the whole tree.  A hit found under the cap
    # IS the global nearest (any farther hit has larger t), so only capped
    # MISSES pay the full-range second pass — correctness is exact, not
    # approximate.  Default OFF: on open-sky scenes ~40% of bounce rays
    # escape, miss under the cap, and pay both passes (bench: 6.73 -> 6.28
    # Mrays/s at 0.1); a win only on closed interiors.
    tcap_frac = float(_os.environ.get("CRT_TCAP", "0"))
    world = getattr(scene, "packed", None)
    use_tcap = (
        not differentiable
        and tcap_frac > 0
        and world is not None
        and getattr(scene, "use_pallas", False)
    )
    if use_tcap:
        import numpy as _np

        diag = float(
            _np.linalg.norm(_np.asarray(world.world_max) - _np.asarray(world.world_min))
        )
        t_cap = jnp.float32(diag * tcap_frac)

    def bounce(depth, s, capped=False, tap_chunks=1):
        """Advance every ray in `s` one path segment (any batch size).

        `tap_chunks`: chunk the albedo texel tap (only) so image regions
        with no textured hit skip its HBM gather (see get_albedo's
        lax.cond).  Used by the full-width PRIMARY call, whose pixel order
        is spatially coherent; bounce-depth calls are already chunked by
        depth_body so they pass 1.  Chunking only the tap (not traversal)
        keeps kernel tile composition — and thus t-tie resolution on shared
        triangle edges — identical for any chunk count."""
        alive = s["alive"]
        if capped and use_tcap:
            res = nearest(scene, s["o"], s["d"], t0=t_cap, mask=alive, sort_rays=False)
            missed = (res["obj_idx"] < 0) & alive
            res2 = nearest(scene, s["o"], s["d"], mask=missed, sort_rays=False)
            for k in ("t", "obj_idx", "tri_idx", "mat_id_tri"):
                res[k] = jnp.where(missed, res2[k], res[k])
            res["bary"] = jnp.where(missed[..., None], res2["bary"], res["bary"])
            for k in ("shade_rec", "shade_normal", "shade_uv"):
                if k in res:
                    res[k] = jnp.where(missed[..., None], res2[k], res[k])
            res["traversed"] = res["traversed"] + res2["traversed"]
            res["tested"] = res["tested"] + res2["tested"]
        else:
            res = nearest(scene, s["o"], s["d"], mask=alive, sort_rays=False)
        t = res["t"]
        obj = res["obj_idx"]
        hit = (obj >= 0) & alive
        miss = (~(obj >= 0)) & alive

        missed = s["missed"] | miss
        radiance = s["radiance"]
        # depth cutoff AFTER the miss/sky record (renderer.cpp:52-55)
        # (jnp ops: python `~False` is -2 and would int-promote the mask)
        past_limit = jnp.asarray(depth >= depth_limit)
        hit = jnp.logical_and(hit, jnp.logical_not(past_limit))

        point = s["o"] + t[..., None] * s["d"]
        normal, uv, mat_id = query.get_hit_info(scene, res, point, s["d"])
        mf = query.material_fields(scene, mat_id)
        w = mat_id.shape[0]
        if tap_chunks > 1 and w % tap_chunks == 0:

            def tap_body(_, args):
                mid_c, uv_c, obj_c, pt_c, mf_c = args
                return None, query.get_albedo(
                    scene, mid_c, uv_c, obj=obj_c, point=pt_c, fields=mf_c
                )

            ck = lambda x: x.reshape(tap_chunks, w // tap_chunks, *x.shape[1:])
            _, albedo = jax.lax.scan(
                tap_body,
                None,
                (ck(mat_id), ck(uv), ck(obj), ck(point), {k: ck(v) for k, v in mf.items()}),
            )
            albedo = albedo.reshape(w, 3)
        else:
            albedo = query.get_albedo(scene, mat_id, uv, obj=obj, point=point, fields=mf)
        is_light = mf["is_light"] & hit
        radiance = radiance + jnp.where(
            is_light[..., None], s["throughput"] * scene.light_color, 0.0
        )
        surf = hit & (~is_light)

        refl = mf["reflectivity"]
        refr = mf["refractivity"]
        medium = jnp.where(
            s["inside"][..., None],
            jnp.exp(mf["absorption"] * (-t)[..., None]),
            1.0,
        )

        seed = s["seed"]
        seed, r_lobe = rng_mod.random_float(seed)
        pick_mirror = surf & (r_lobe < refl)
        pick_diel = surf & (~pick_mirror) & (r_lobe < refl + refr)
        pick_diff = surf & (~pick_mirror) & (~pick_diel)

        # dielectric: stochastic Fresnel branch (renderer.cpp:27-45)
        fr, can_refract, t_dir, r_dir = common.dielectric_terms(s["d"], normal, s["inside"])
        seed, r_fresnel = rng_mod.random_float(seed)
        take_refract = pick_diel & can_refract & (r_fresnel > fr)

        # diffuse: uniform hemisphere + estimator brdf * 2pi * cos
        seed, r1 = rng_mod.random_float(seed)
        seed, r2 = rng_mod.random_float(seed)
        diff_dir = common.uniform_hemisphere(normal, r1, r2)
        cosr = jnp.maximum(common.vm.dot(diff_dir, normal), 0.0)
        diff_w = albedo * constants.INVPI * (2.0 * constants.PI) * cosr[..., None]

        new_d = jnp.where(
            pick_diff[..., None],
            diff_dir,
            jnp.where(take_refract[..., None], t_dir, r_dir),
        )
        lobe_w = jnp.where(
            pick_diff[..., None],
            diff_w,
            albedo,  # mirror / dielectric multiply albedo only
        )
        throughput = jnp.where(
            surf[..., None], s["throughput"] * medium * lobe_w, s["throughput"]
        )
        new_o = point + new_d * EPS
        inside = jnp.where(take_refract, ~s["inside"], jnp.zeros_like(s["inside"]))

        return dict(
            o=jnp.where(surf[..., None], new_o, s["o"]),
            d=jnp.where(surf[..., None], new_d, s["d"]),
            seed=seed,
            throughput=throughput,
            radiance=radiance,
            inside=inside,
            alive=surf,
            missed=missed,
            traversed=s["traversed"] + res["traversed"],
            tested=s["tested"] + res["tested"],
            pixel=s["pixel"],
            locus=jnp.where(surf, res["tri_idx"], s["locus"]),
        )

    rays_traced = jnp.int32(r)
    state = bounce(0, state, tap_chunks=compaction_chunks)

    # Bounces 1..depth_limit as a scan over depth, each a scan over chunks:
    # `bounce` is traced exactly twice (full-width + chunk-width), keeping
    # the program (and its Mosaic kernel count) small — a python-unrolled
    # version compiled 20+ identical pallas kernels and took minutes.
    chunk = r // compaction_chunks

    def sort_state(st):
        perm = _compaction_perm(scene, st["o"], st["d"], st["alive"], st["locus"])
        return _permute_state(st, perm)

    def depth_body(carry, depth):
        """One bounce depth at the carried state's (static) width: global
        compaction resort, then chunked bounce with dead-chunk skipping."""
        state, rays_traced = carry
        w = state["alive"].shape[0]
        n_chunks = max(w // chunk, 1)
        n_alive = jnp.sum(state["alive"].astype(jnp.int32))
        rays_traced = rays_traced + n_alive
        if n_chunks > 1:
            state = sort_state(state)
        chunked = {
            k: state[k].reshape(n_chunks, w // n_chunks, *state[k].shape[1:])
            for k in _RAY_KEYS
        }
        # per-chunk live counts (exact skip: dead rays never resurrect)
        chunk_alive = jnp.sum(
            state["alive"].reshape(n_chunks, w // n_chunks).astype(jnp.int32),
            axis=1,
        )

        def chunk_body(_, inp):
            piece, calive = inp
            out = jax.lax.cond(
                calive > 0,
                lambda p: bounce(depth, p, capped=True),
                lambda p: p,
                piece,
            )
            return None, out

        _, chunked = jax.lax.scan(chunk_body, None, (chunked, chunk_alive))
        state = {
            k: chunked[k].reshape(w, *chunked[k].shape[2:]) for k in _RAY_KEYS
        }
        return (state, rays_traced), None

    # Depth 1 runs at full width (typically >50% of paths survive the
    # primary hit).  Deeper bounces usually have FEW survivors — measured on
    # the bench scene: 60.8% live at depth 1, 4.5% at depth 2, <=2.2% past
    # that — yet a full-width depth iteration costs ~90ms at 1M rays
    # (resort ~22ms + per-chunk fixed costs) regardless of liveness.  So
    # after depth 1 a liveness CASCADE picks the narrowest static buffer
    # from {1, 4} chunks (lax.cond nest) that holds every live ray, and all
    # remaining depths run inside it; the full-width scan stays as the
    # fallback for mirror-box-style scenes where most paths survive.  The
    # chunk width is identical in every tier, so the Pallas kernels and the
    # traced bounce body are shared across tiers.
    if depth_limit >= 1:
        (state, rays_traced), _ = jax.lax.scan(
            depth_body, (state, rays_traced), jnp.arange(1, 2)
        )
    if depth_limit >= 2:
        deep = jnp.arange(2, depth_limit + 1)

        def deep_full(carry):
            (st, rt), _ = jax.lax.scan(depth_body, carry, deep)
            return st, rt

        def make_tier(width):
            def tier(carry):
                st, rt = carry
                st = sort_state(st)  # compact live rays into the prefix
                head = {k: st[k][:width] for k in _RAY_KEYS}
                tail = {k: st[k][width:] for k in _RAY_KEYS}
                (head, rt), _ = jax.lax.scan(depth_body, (head, rt), deep)
                st = {
                    k: jnp.concatenate([head[k], tail[k]], axis=0)
                    for k in _RAY_KEYS
                }
                return st, rt

            return tier

        n_live = jnp.sum(state["alive"].astype(jnp.int32))
        tiers = [w for w in (chunk, 4 * chunk) if w < r]
        run = deep_full
        for w in reversed(tiers):  # build the cond nest widest-first
            run = (
                lambda carry, w=w, fallback=run: jax.lax.cond(
                    n_live <= w, make_tier(w), fallback, carry
                )
            )
        state, rays_traced = run((state, rays_traced))

    # missed rays' d and throughput are frozen at miss time (dead lanes are
    # never mutated), so the deferred sky needs no separate miss_d/miss_tp.
    # The equirect gather is chunked like the texel tap: compaction leaves
    # absorbed/live rays clustered, so chunks with no missed ray skip the
    # ~11 ns/ray HBM gather via lax.cond.
    def sky_contrib(missed, tp, d):
        sky_w = jnp.where(missed[..., None], tp, 0.0)
        return sky_w * query.sky_color(scene, d)

    if compaction_chunks > 1 and r % compaction_chunks == 0:
        ck = lambda x: x.reshape(compaction_chunks, r // compaction_chunks, *x.shape[1:])

        def sky_body(_, args):
            missed, tp, d = args
            out = jax.lax.cond(
                jnp.any(missed),
                lambda a: sky_contrib(*a),
                lambda a: jnp.zeros_like(a[1]),
                (missed, tp, d),
            )
            return None, out

        _, sky = jax.lax.scan(
            sky_body, None, (ck(state["missed"]), ck(state["throughput"]), ck(state["d"]))
        )
        radiance = state["radiance"] + sky.reshape(r, 3)
    else:
        radiance = state["radiance"] + sky_contrib(
            state["missed"], state["throughput"], state["d"]
        )
    # un-permute radiance to the caller's ray order.  Multi-lane scatters
    # are catastrophically slow on this stack (measured: [R,3] scatter
    # 78 ms vs [R,3] gather 8.5 ms vs 1-D scatter ~4 ms at R=921600), so
    # invert the permutation with a ONE-LANE iota scatter and apply it as
    # a gather: inv[pixel[j]] = j  =>  out[i] = radiance[inv[i]].
    # traversed/tested stay in internal compaction order — every consumer
    # (traversal_summary) reduces them, which is permutation-invariant.
    # When no compaction sort ever ran (depth 0 or chunks == 1) `pixel` is
    # still the identity and the inverse is skipped outright — also dodges
    # an XLA TPU fusion-pass crash on constant-iota-indexed scatters
    # (scatter_emitter.cc CHECK operand_indices.size() == 1).
    if depth_limit == 0 or compaction_chunks == 1:
        out = radiance
    else:
        inv = (
            jnp.zeros((r,), jnp.int32)
            .at[state["pixel"]]
            .set(jnp.arange(r, dtype=jnp.int32), unique_indices=True)
        )
        out = radiance[inv]
    return out, dict(
        rays_traced=rays_traced,
        traversed=state["traversed"],
        tested=state["tested"],
    )


def render_pass(
    scene: DeviceScene,
    camera: cam_mod.Camera,
    spp_index: jnp.ndarray,
    depth_limit: int = constants.DEPTH_LIMIT,
    differentiable: bool = False,
    samples_per_pass: int = 1,
):
    """One progressive pass: `samples_per_pass` jittered samples per pixel
    (3. PathTracer/renderer.cpp:117-131).  Returns (radiance [H, W, 3] =
    SUM of the pass's samples, stats).  `spp_index` salts the per-pixel RNG
    stream like the reference's `spp * 1799` tile seed; sample k of the
    megapass uses salt `spp_index + k`, so a 4-sample megapass at base b
    draws exactly the same per-sample streams as four 1-sample passes at
    b, b+1, b+2, b+3 — the estimator is unchanged, only batching differs.

    Why megabatch several samples: ray density per spatial region scales
    with samples/pixel, and the packet kernel's waste is (tile union size /
    rays in tile) — denser, pixel-adjacent samples tighten every tile's
    node/leaf union (primaries near-duplicate; bounce origins cluster on
    the same surfaces), and per-pass fixed costs amortize."""
    n = camera.width * camera.height
    s = samples_per_pass
    if s == 1:
        pixel_ids = jnp.arange(n, dtype=jnp.uint32)
        seeds = rng_mod.pixel_seeds(pixel_ids, spp_index)
        seeds, jx = rng_mod.random_float(seeds)
        seeds, jy = rng_mod.random_float(seeds)
        rays = cam_mod.full_frame_rays(camera, jitter_x=jx, jitter_y=jy)
        radiance, stats = sample_radiance(
            scene, rays.o, rays.d, seeds, depth_limit, differentiable=differentiable
        )
        return radiance.reshape(camera.height, camera.width, 3), stats

    # pixel-major layout: a pixel's s samples are ADJACENT, so a 4096-ray
    # kernel tile covers 4096/s pixels — maximum primary coherence
    pixel_ids = jnp.repeat(jnp.arange(n, dtype=jnp.uint32), s)
    sample_k = jnp.tile(jnp.arange(s, dtype=jnp.uint32), n)
    seeds = rng_mod.pixel_seeds(pixel_ids, jnp.asarray(spp_index, jnp.uint32) + sample_k)
    seeds, jx = rng_mod.random_float(seeds)
    seeds, jy = rng_mod.random_float(seeds)
    xs, ys = cam_mod.pixel_grid(camera)
    rays = cam_mod.primary_rays(
        camera, jnp.repeat(xs, s) + jx, jnp.repeat(ys, s) + jy
    )
    # keep the dead-chunk-skip granularity (chunk SIZE) equal to the 1-spp
    # configuration by scaling the chunk count with s
    c = int(_os.environ.get("CRT_COMPACTION_CHUNKS", "48")) * s
    r = n * s
    chunks = c if r % c == 0 and r >= 4096 else 1
    radiance, stats = sample_radiance(
        scene,
        rays.o,
        rays.d,
        seeds,
        depth_limit,
        differentiable=differentiable,
        compaction_chunks=chunks,
    )
    radiance = radiance.reshape(n, s, 3).sum(axis=1)
    return radiance.reshape(camera.height, camera.width, 3), stats


render_pass_jit = jax.jit(
    render_pass,
    static_argnames=("depth_limit", "differentiable", "samples_per_pass"),
)
