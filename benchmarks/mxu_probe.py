"""MXU leaf-intersection probe (VERDICT r3 ask #1): can Möller–Trumbore move
onto the matrix unit?

The four MT quantities are multilinear in the ray: with per-ray features
Phi = [O, D, OxD, 1] (10 floats, padded to 16) and per-triangle coefficient
columns, a leaf test is  C[4K, 16] @ Phi[16, R]  — a matmul.  The catch is
arithmetic intensity: K_contract = 16 wastes 7/8 of the MXU's 128-deep dot,
and an [M, 16] @ [16, R] matmul streams R columns in ~R cycles REGARDLESS
of M (up to 128), so the MXU only beats the VPU if M >= ~64 triangles are
batched per matmul — which requires deferring/queueing leaf visits inside
the traversal.

This probe times, inside one Pallas kernel each:
  V      : the production VPU row test — 8 broadcast tris vs a (32, 128)
           ray tile per row (45 vector ops x 4 vregs).
  M8/M32/M64/M128 : C[4m, 16] @ Phi[16, 4096] per flush (m tris), plus the
           f32 epilogue (reciprocal, u/v/t, accept chain, per-ray min-merge
           over the m candidates) — quantity-major row grouping so each
           quantity slab is a dense [m, 4096] block.

Output: ns per 8-triangle-row-equivalent for each variant, and the implied
speedup bound.  Decision rule: integrate only if an achievable batch size
(m <= 32, since leaves average 1-3 rows and deferral queues add real cost)
beats V by >= 1.5x.

Numbers (v5e, 2026-08-20 run, two-pass chained timing with a discarded
first measurement):
  V 1171 ns/row; M8 966; M32 973; M64 973; M128 985 ns/row-equivalent —
  the MXU formulation is a FLAT ~1.2x faster per test, independent of
  batch size (the [*, 16] @ [16, 4096] matmul is stream-bound, so batching
  more rows per flush buys nothing).  1.2x on the leaf test is ~2-3% of
  the headline (leaf rows are ~25-40% of traverse, traverse ~35% of a
  pass) and does NOT clear the >= 1.5x integration bar: the production
  kernel would additionally pay the [16, R] feature-matrix build, the
  (1, 4096) <-> (32, 128) layout conversions of the running hit state, and
  an f32-precision risk (the feature form loses the O - v0 cancellation).
  CONCLUSION: leaf Möller–Trumbore stays on the VPU; K = 16 wastes 8x of
  the MXU's 128-deep dot and no achievable batching recovers it.
  Recorded in docs/ROOFLINE.md.
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
TS = (32, 128)
N_TILES = 64
FLUSHES = 64  # leaf flushes per tile program


def make_vpu_kernel():
    def kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

        def body(i, c):
            t, u, v, slot = c
            trow = tris_ref[pl.ds(i, 1), :]
            for kk in range(8):
                l0 = kk * 16
                v0x, v0y, v0z = trow[0, l0], trow[0, l0 + 1], trow[0, l0 + 2]
                e1x, e1y, e1z = trow[0, l0 + 3], trow[0, l0 + 4], trow[0, l0 + 5]
                e2x, e2y, e2z = trow[0, l0 + 6], trow[0, l0 + 7], trow[0, l0 + 8]
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
                sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
                uu = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = f * (dx * qx + dy * qy + dz * qz)
                tt = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (jnp.abs(a) >= 1e-4) & (uu >= 0) & (uu <= 1)
                    & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4) & (tt < t)
                )
                t = jnp.where(ok, tt, t)
                u = jnp.where(ok, uu, u)
                v = jnp.where(ok, vv, v)
                slot = jnp.where(ok, i * 8 + kk, slot)
            return t, u, v, slot

        t0 = jnp.full(TS, 1e30, jnp.float32)
        z = jnp.zeros(TS, jnp.float32)
        t, u, v, slot = jax.lax.fori_loop(
            0, FLUSHES, body, (t0, z, z, jnp.full(TS, -1, jnp.int32))
        )
        out_ref[0] = t + u + v + slot.astype(jnp.float32)

    return kernel


def make_mxu_kernel(m: int):
    """m triangles per flush; C is [4m, 16] quantity-major (a rows, then
    u*a, v*a, t*a rows), Phi is [16, 4096]."""

    def kernel(c_ref, phi_ref, out_ref):
        phi = phi_ref[0]  # (16, 4096)

        def body(i, c):
            t, slot = c
            cm = c_ref[pl.ds((i % 4) * 4 * m, 4 * m), :]  # (4m, 16)
            prod = jnp.dot(cm, phi, preferred_element_type=jnp.float32)  # (4m, 4096)
            a = prod[0 * m : 1 * m]
            ua = prod[1 * m : 2 * m]
            va = prod[2 * m : 3 * m]
            ta = prod[3 * m : 4 * m]
            f = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
            uu = ua * f
            vv = va * f
            tt = ta * f
            ok = (
                (jnp.abs(a) >= 1e-4) & (uu >= 0) & (uu <= 1)
                & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4) & (tt < t)
            )
            cand = jnp.where(ok, tt, 1e30)
            tb = jnp.min(cand, axis=0, keepdims=True)  # (1, 4096)
            win = jnp.argmin(cand, axis=0)[None, :]  # (1, 4096)
            slot = jnp.where(tb < t, i * m + win, slot)
            t = jnp.minimum(t, tb)
            return t, slot

        t0 = jnp.full((1, TILE), 1e30, jnp.float32)
        # flush count scaled so total tri-ray tests match the VPU variant
        n_flush = max((FLUSHES * 8) // m, 1)
        t, slot = jax.lax.fori_loop(
            0, n_flush, body, (t0, jnp.full((1, TILE), -1, jnp.int32))
        )
        out_ref[0, 0, :] = t[0, :128] + slot[0, :128].astype(jnp.float32)

    return kernel


def main():
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.normal(size=(FLUSHES, 128)).astype(np.float32))
    comps = [
        jnp.asarray(rng.normal(size=(N_TILES, *TS)).astype(np.float32))
        for _ in range(6)
    ]
    tile_spec = pl.BlockSpec((1, *TS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def timed(f, *a):
        x = f(*a)
        jax.block_until_ready(x)
        dt = 1e30
        for _ in range(2):
            t1 = time.time()
            acc = jnp.float32(0.0)
            for _ in range(10):
                acc = acc + f(*a)
            float(acc)
            dt = min(dt, (time.time() - t1) / 10)
        return dt

    vpu = jax.jit(
        lambda tris, *comps: pl.pallas_call(
            make_vpu_kernel(),
            grid=(N_TILES,),
            out_shape=jax.ShapeDtypeStruct((N_TILES, *TS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [tile_spec] * 6,
            out_specs=tile_spec,
        )(tris, *comps).sum()
    )
    dt_warm = timed(vpu, tris, *comps)  # discard: first-in-process inflation
    dt_v = timed(vpu, tris, *comps)
    rows_total = N_TILES * FLUSHES
    print(f"V(vpu rows): {dt_v*1000:.2f} ms  {dt_v*1e9/rows_total:.0f} ns/row", flush=True)

    results = {"V_ns_per_row": dt_v * 1e9 / rows_total}
    for m in (8, 32, 64, 128):
        c_tab = jnp.asarray(rng.normal(size=(16 * m, 16)).astype(np.float32))
        phi = jnp.asarray(rng.normal(size=(N_TILES, 16, TILE)).astype(np.float32))
        phi_spec = pl.BlockSpec((1, 16, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        mxu = jax.jit(
            lambda c_tab, phi, m=m, phi_spec=phi_spec: pl.pallas_call(
                make_mxu_kernel(m),
                grid=(N_TILES,),
                out_shape=jax.ShapeDtypeStruct((N_TILES, 1, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), phi_spec],
                out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            )(c_tab, phi).sum()
        )
        dt_m = timed(mxu, c_tab, phi)
        n_flush = max((FLUSHES * 8) // m, 1)
        rows_eq = N_TILES * n_flush * m / 8  # 8-tri-row equivalents
        ns_row = dt_m * 1e9 / rows_eq
        print(
            f"M{m}(mxu {m} tris/flush): {dt_m*1000:.2f} ms  "
            f"{ns_row:.0f} ns/row-equivalent  "
            f"({results['V_ns_per_row']/ns_row:.2f}x vs VPU)",
            flush=True,
        )
        results[f"M{m}_ns_per_row"] = ns_row
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
