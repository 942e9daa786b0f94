"""Microbench: per-ray attribute gather strategies on TPU.

The post-traversal shade gather ([R]-index rows from a [N, 16] table) costs
~40 ms at R=921k, N=11k — as much as sorted-bounce traversal.  This probe
times the alternatives so the shade path can pick the fastest formulation.
Run exclusively (one TPU process).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

if os.path.isdir(os.path.join(REPO, ".jax_cache")):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

R = 1280 * 720
N = 10952


def timeit(name, f, *args, reps=20):
    """Chain `reps` calls then force a scalar readback — block_until_ready
    alone under-reports on the tunneled runtime (async completion acks)."""
    x = f(*args)
    float(jnp.asarray(x).sum())  # compile + sync
    # idle-slow-mode guard: ~50 rapid trivial calls before timing
    g = jax.jit(lambda v: v * 1.000001)
    y = jnp.float32(1.0)
    for _ in range(60):
        y = g(y)
    float(y)
    t = time.time()
    for _ in range(reps):
        x = f(*args)
    float(jnp.asarray(x).sum())
    dt = (time.time() - t) / reps
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))
    idx_sorted = jnp.sort(idx_rand)
    # hit-coherent: sorted rays hit nearby tris — model as smooth walk
    walk = np.clip(np.cumsum(rng.integers(-2, 3, size=R)) % N, 0, N - 1)
    idx_coh = jnp.asarray(walk.astype(np.int32))
    tab16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    tab16b = tab16.astype(jnp.bfloat16)
    tab128 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    tab8a = tab16[:, :8]
    bary = jnp.asarray(rng.random((R, 2)).astype(np.float32))

    f_row = jax.jit(lambda t, i: t[i].sum())
    f_interp = jax.jit(
        lambda t, i, b: (
            (1 - b[:, 0:1] - b[:, 1:2]) * t[i][:, 0:3]
            + b[:, 0:1] * t[i][:, 3:6]
            + b[:, 1:2] * t[i][:, 6:9]
        ).sum()
    )

    timeit("gather [N,16] f32 rand", f_row, tab16, idx_rand)
    timeit("gather [N,16] f32 sorted", f_row, tab16, idx_sorted)
    timeit("gather [N,16] f32 coherent", f_row, tab16, idx_coh)
    timeit("gather [N,16] bf16 rand", f_row, tab16b, idx_rand)
    timeit("gather [N,8] f32 rand", f_row, tab8a, idx_rand)
    timeit("gather [N,128] f32 rand", f_row, tab128, idx_rand)
    timeit("interp shade rand", f_interp, tab16, idx_rand, bary)
    timeit("interp shade coherent", f_interp, tab16, idx_coh, bary)

    # one-hot matmul for scale (chunked to bound memory)
    def onehot_chunk(t, i):
        C = 65536
        acc = jnp.float32(0)
        for c in range(R // C):
            oh = jax.nn.one_hot(
                jax.lax.dynamic_slice(i, (c * C,), (C,)), N, dtype=jnp.bfloat16
            )
            acc += jnp.dot(oh, t.astype(jnp.bfloat16)).astype(jnp.float32).sum()
        return acc

    timeit("one-hot matmul bf16 chunked", jax.jit(onehot_chunk), tab16, idx_rand)

    # argsort reference
    timeit("argsort R keys", jax.jit(lambda k: jnp.argsort(k)), idx_rand)
    # scatter reference (film accumulate analog)
    timeit(
        "scatter-add [R]->[N,16]",
        jax.jit(lambda t, i: jnp.zeros((N, 16), jnp.float32).at[i].add(t[i]).sum()),
        tab16,
        idx_rand,
    )


if __name__ == "__main__":
    main()
