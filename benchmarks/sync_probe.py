"""Per-node-step cost decomposition for the packet kernel (TPU, exclusive).

The packet kernel's hot loop does, per node step:
  (1) scalar SMEM fetches of the node record,
  (2) a broadcast vector slab test,
  (3) a vector->scalar reduction (any lane hit?) feeding the cursor branch.

The round-1 ablations showed the step costs ~1.4us regardless of tile size
or unrolling — this probe isolates WHICH of (1)-(3) is the wall by timing
four kernel variants over the same 256-step walk on real scene tables:

  A scalar-only:   (1) + scalar branch; slab math absent.
  B vector-nosync: (1) + (2); branch decided by scalar parity (no reduce
                   on the dependency path).
  C per-step sync: (1) + (2) + (3) — the production kernel's shape.
  D sync-per-4:    (1) + (2) per step, ONE reduce per 4 steps feeding the
                   4th branch — the BFS-frontier design's cost model.
  E1/E2/E8:        8-ary reduce-pipelining probes: EIGHT slab tests of 8
                   different nodes per counted step, decided by 1 packed
                   reduce (E1), 2 reduces (E2), or 8 separate reduces (E8)
                   — measures whether multiple vector->scalar reduces
                   pipeline (share one sync) or serialize.

ns/step deltas between variants give the price of the vector work and of
the sync, and whether batching syncs (D) recovers variant-B speed.  NOTE
the step granularity differs: A-D process ONE node per counted step, the E
variants process EIGHT — the printout reports both ns/step and ns/node so
rows stay comparable.  SYNC_VARIANTS=C,D (comma list) filters which
variants run.
"""

import os
import sys
import time
import functools

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.path.isdir(os.path.join(REPO, ".jax_cache")):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

TILE = 4096
TILE_SHAPE = (TILE // 128, 128)
STEPS = 256
N_TILES = 225  # 1280*720 / 4096


def make_kernel(variant: str):
    def kernel(aabb_ref, links_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, out_ref, stack_smem):
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        rdx, rdy, rdz = 1.0 / dx, 1.0 / dy, 1.0 / dz

        def slab(node):
            bminx = aabb_ref[0, node]
            bminy = aabb_ref[1, node]
            bminz = aabb_ref[2, node]
            bmaxx = aabb_ref[3, node]
            bmaxy = aabb_ref[4, node]
            bmaxz = aabb_ref[5, node]
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
            return (tmax >= tmin) & (tmax > 0.0) & (tmin < 1e30)

        def fetch_links(node):
            return links_ref[0, 0, node], links_ref[0, 1, node]

        if variant in ("A", "B"):
            def body(c):
                step, cur, acc = c
                for _ in range(2):  # match production UNROLL=2
                    node = jnp.maximum(cur, 0)
                    hit_link, miss_link = fetch_links(node)
                    if variant == "B":
                        lane_hit = slab(node)
                        acc = acc + lane_hit.astype(jnp.float32)
                    # scalar-decided branch: parity of the node id (data
                    # dependency through SMEM only)
                    descend = (node & 1) == 0
                    cur = jnp.where(cur < 0, cur,
                                    jnp.where(descend, hit_link, miss_link))
                    step = step + 1
                return step, cur, acc

            def cond(c):
                step, cur, acc = c
                return (step < STEPS) & True

            carry = (jnp.int32(0), jnp.int32(0),
                     jnp.zeros(TILE_SHAPE, jnp.float32))
            step, cur, acc = jax.lax.while_loop(cond, body, carry)
            out_ref[0] = acc + jnp.float32(cur)
        elif variant == "C":
            def body(c):
                step, cur, acc = c
                for _ in range(2):
                    node = jnp.maximum(cur, 0)
                    hit_link, miss_link = fetch_links(node)
                    lane_hit = slab(node)
                    acc = acc + lane_hit.astype(jnp.float32)
                    any_lane = jnp.sum(lane_hit.astype(jnp.int32)) > 0
                    cur = jnp.where(cur < 0, cur,
                                    jnp.where(any_lane, hit_link, miss_link))
                    step = step + 1
                return step, cur, acc

            carry = (jnp.int32(0), jnp.int32(0),
                     jnp.zeros(TILE_SHAPE, jnp.float32))
            step, cur, acc = jax.lax.while_loop(
                lambda c: c[0] < STEPS, body, carry)
            out_ref[0] = acc + jnp.float32(cur)
        elif variant.startswith("E"):
            # 8-ary step model: EIGHT slab tests of 8 different nodes per
            # step, decided by either 2 packed reduces (E2: 4 bool fields
            # of 8 bits each per i32 — enough for any-hit booleans if each
            # lane contributes a saturating single bit... here we just sum
            # counts, fields may alias; timing-only) or 8 separate reduces
            # (E8).  Measures whether multiple vector->scalar reduces
            # PIPELINE (share one ~175 ns sync) or serialize.
            n_red = int(variant[1:])
            def body(c):
                step, cur, acc = c
                node = jnp.maximum(cur, 0)
                hits = []
                for k in range(8):
                    nk = (node + k) & 1023
                    lane_hit = slab(nk)
                    acc = acc + lane_hit.astype(jnp.float32)
                    hits.append(lane_hit.astype(jnp.int32))
                if n_red == 8:
                    scal = [jnp.sum(h) for h in hits]
                    bits = jnp.int32(0)
                    for k, s in enumerate(scal):
                        bits = bits | (jnp.where(s > 0, 1, 0) << k)
                elif n_red == 2:
                    p0 = jnp.sum(hits[0] + (hits[1] << 8)
                                 + (hits[2] << 16) + (hits[3] << 24))
                    p1 = jnp.sum(hits[4] + (hits[5] << 8)
                                 + (hits[6] << 16) + (hits[7] << 24))
                    bits = p0 | p1
                else:  # 1 packed reduce (bool-ish, timing only)
                    p0 = hits[0]
                    for k in range(1, 8):
                        p0 = p0 | (hits[k] << (k * 4))
                    bits = jnp.sum(p0)
                hit_link, miss_link = fetch_links(node)
                cur = jnp.where(cur < 0, cur,
                                jnp.where((bits & 0xFF) != 0,
                                          hit_link, miss_link))
                step = step + 1
                return step, cur, acc

            carry = (jnp.int32(0), jnp.int32(0),
                     jnp.zeros(TILE_SHAPE, jnp.float32))
            step, cur, acc = jax.lax.while_loop(
                lambda c: c[0] < STEPS, body, carry)
            out_ref[0] = acc + jnp.float32(cur)
        elif variant.startswith("F"):
            # Wide-walk step models (r4): E8's 8 slabs + 8 pipelined reduces
            # PLUS the structural extras the real wide kernel carries, added
            # one at a time to find where its measured 4.4 us/step hides:
            #   F0: + 8 predicated SMEM stack stores + pop (no leaf work)
            #   F1: F0 + leaf lax.cond wrapping a 2-row traced fori of real
            #       Möller–Trumbore rows on a dummy tri row (taken ~always)
            #   F2: F0 + the same fori WITHOUT the cond
            sub = variant[1:]

            def body(c):
                step, cur, sp, acc, t = c
                node = jnp.maximum(cur, 0)
                hits = []
                for k in range(8):
                    nk = (node + k) & 1023
                    lane_hit = slab(nk) & (t < 1e30 + jnp.float32(step))
                    hits.append(jnp.sum(lane_hit.astype(jnp.int32)))
                bits = jnp.int32(0)
                for k, s in enumerate(hits):
                    bits = bits | (jnp.where(s > 0, 1, 0) << k)

                if sub in ("1", "2"):
                    def leaf(args):
                        def row_body(i, a):
                            acc, t = a
                            # MT-row-shaped vector work (16 fmas + selects)
                            tt = acc * 1.0000001 + jnp.float32(i)
                            ok = tt < t
                            t = jnp.where(ok, tt, t)
                            return acc + tt, t
                        return jax.lax.fori_loop(
                            args[2], args[3], row_body, (args[0], args[1])
                        )
                    lo = jnp.where((bits & 3) > 0, node & 7, jnp.int32(9))
                    hi = jnp.where((bits & 3) > 0, (node & 7) + 2, jnp.int32(0))
                    if sub == "1":
                        acc, t = jax.lax.cond(
                            hi > lo, leaf, lambda a: (a[0], a[1]),
                            (acc, t, lo, hi),
                        )
                    else:
                        acc, t = leaf((acc, t, jnp.minimum(lo, hi), hi))

                # 8 predicated pushes + pop, exactly the wide kernel's shape
                spm = sp
                for k in range(8):
                    m_k = links_ref[0, 0, (node + k) & 1023]
                    push = ((bits >> k) & 1) > 0
                    stack_smem[spm] = m_k
                    spm = spm + push.astype(jnp.int32)
                spm = jnp.maximum(spm - 1, 0)
                cur = jnp.where(
                    cur < 0, cur, stack_smem[jnp.maximum(spm - 1, 0)] & 1023
                )
                return step + 1, cur, spm & 63, acc, t

            def kern_body(c):
                return body(c)

            carry = (jnp.int32(0), jnp.int32(0), jnp.int32(1),
                     jnp.zeros(TILE_SHAPE, jnp.float32),
                     jnp.full(TILE_SHAPE, 1e30, jnp.float32))
            step, cur, sp, acc, t = jax.lax.while_loop(
                lambda c: c[0] < STEPS, kern_body, carry)
            out_ref[0] = acc + t + jnp.float32(cur + sp)
        elif variant == "D":
            def body(c):
                step, cur, acc = c
                packed = jnp.zeros(TILE_SHAPE, jnp.int32)
                nodes = []
                for k in range(4):
                    node = jnp.maximum(cur, 0)
                    nodes.append(node)
                    hit_link, miss_link = fetch_links(node)
                    lane_hit = slab(node)
                    acc = acc + lane_hit.astype(jnp.float32)
                    packed = packed | (lane_hit.astype(jnp.int32) << k)
                    # first 3 branches scalar-decided (frontier semantics:
                    # which nodes to test next comes from the stack, not
                    # from this step's vector result)
                    descend = (node & 1) == 0
                    cur = jnp.where(cur < 0, cur,
                                    jnp.where(descend, hit_link, miss_link))
                    step = step + 1
                # ONE reduce for the 4 tested nodes; its bits feed the
                # next iteration's start cursor (dependency preserved)
                bits = jnp.sum(packed)  # scalar; bit k set-ish if node k hit
                cur = jnp.where((bits & 1) >= 0, cur, jnp.int32(0))
                return step, cur, acc

            carry = (jnp.int32(0), jnp.int32(0),
                     jnp.zeros(TILE_SHAPE, jnp.float32))
            step, cur, acc = jax.lax.while_loop(
                lambda c: c[0] < STEPS, body, carry)
            out_ref[0] = acc + jnp.float32(cur)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(aabb, links, comps, variant):
    tile_spec = pl.BlockSpec((1, *TILE_SHAPE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        make_kernel(variant),
        grid=(N_TILES,),
        out_shape=jax.ShapeDtypeStruct((N_TILES, *TILE_SHAPE), jnp.float32),
        in_specs=[smem_spec, smem_spec] + [tile_spec] * 6,
        out_specs=tile_spec,
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
    )(aabb, links, *comps)


def main():
    from cpu_ray_tracer_tpu.core import camera as cam_mod
    from cpu_ray_tracer_tpu.scene.build import compile_scene

    scene, info = compile_scene(
        os.path.join(REPO, "assets", "scenes", "bunny_teapot.xml"), layout="tlas"
    )
    pk = scene.packed
    cam = cam_mod.make_camera(1280, 720, pos=(0.0, 0.3, -1.2),
                              target=(0.0, -0.1, 2.5))
    rays = cam_mod.full_frame_rays(cam)
    comps = [
        rays.o[:, 0].reshape(N_TILES, *TILE_SHAPE),
        rays.o[:, 1].reshape(N_TILES, *TILE_SHAPE),
        rays.o[:, 2].reshape(N_TILES, *TILE_SHAPE),
        rays.d[:, 0].reshape(N_TILES, *TILE_SHAPE),
        rays.d[:, 1].reshape(N_TILES, *TILE_SHAPE),
        rays.d[:, 2].reshape(N_TILES, *TILE_SHAPE),
    ]
    aabb, links = pk.node_aabb, pk.node_links

    def warm():
        g = jax.jit(lambda v: v * 1.000001)
        y = jnp.float32(1.0)
        for _ in range(60):
            y = g(y)
        float(y)

    variants = ("A", "B", "C", "D", "E1", "E2", "E8")
    if os.environ.get("SYNC_VARIANTS"):
        variants = tuple(os.environ["SYNC_VARIANTS"].split(","))
    for variant in variants:
        x = run(aabb, links, comps, variant)
        jax.block_until_ready(x)
        warm()
        # two timing passes, keep the faster: the FIRST chained measurement
        # in a process reads several-fold inflated on the tunneled device
        dt = 1e30
        for _ in range(2):
            t0 = time.time()
            reps = 10
            for _ in range(reps):
                x = run(aabb, links, comps, variant)
            float(jnp.asarray(x).sum())
            dt = min(dt, (time.time() - t0) / reps)
        ns_step = dt * 1e9 / (N_TILES * STEPS)
        # E variants slab-test 8 nodes per counted step; A-D test one —
        # ns/node is the cross-variant-comparable figure
        nodes_per_step = 8 if variant.startswith("E") else 1
        print(
            f"variant {variant}: {dt*1000:.2f} ms  {ns_step:.0f} ns/step"
            f"  {ns_step / nodes_per_step:.0f} ns/node",
            flush=True,
        )


if __name__ == "__main__":
    main()
