"""Poison bisect round 2: is it data content, dtype, or time-recoverable?"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.path.isdir(os.path.join(REPO, ".jax_cache")):
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

    trivial = jax.jit(lambda x: x * 1.0003 + 0.1)
    x = jnp.ones((8, 128), jnp.float32)

    def lat(tag, n=15):
        trivial(x).block_until_ready()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            trivial(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{tag}: med {ts[len(ts)//2]*1e3:.3f} ms  min {ts[0]*1e3:.3f} ms", flush=True)

    lat("warmup0")
    lat("fresh")

    rng = np.random.RandomState(0)

    # 25MB random f32 (same size as skydome texels)
    a = jnp.asarray(rng.rand(2097152, 3).astype(np.float32))
    a.block_until_ready()
    lat("after_25MB_random_f32")

    # wait 10s, does it recover?
    time.sleep(10)
    lat("after_sleep10")

    # 25MB zeros f32
    b = jnp.asarray(np.zeros((2097152, 3), np.float32))
    b.block_until_ready()
    lat("after_25MB_zeros_f32")

    # 8MB random uint32
    c = jnp.asarray(rng.randint(0, 2**31, size=2097152).astype(np.uint32))
    c.block_until_ready()
    lat("after_8MB_random_u32")

    time.sleep(10)
    lat("after_sleep10_b")

    time.sleep(30)
    lat("after_sleep30")


if __name__ == "__main__":
    main()
