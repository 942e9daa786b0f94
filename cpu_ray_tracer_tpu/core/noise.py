"""Perlin-style value noise (port of the reference's noise2D,
template/tmplmath.cpp:36-88 — unused by its renderers but part of the
template's math library surface).  Batched jnp implementation."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PRIMES = np.array(
    [
        [995615039, 600173719, 701464987],
        [831731269, 162318869, 136250887],
        [174329291, 946737083, 245679977],
        [362489573, 795918041, 350777237],
        [457025711, 880830799, 909678923],
        [787070341, 177340217, 593320781],
        [405493717, 291031019, 391950901],
        [458904767, 676625681, 424452397],
        [531736441, 939683957, 810651871],
        [997169939, 842027887, 423882827],
    ],
    np.int32,
)


def _noise(x: jnp.ndarray, y: jnp.ndarray, prime_index: int) -> jnp.ndarray:
    """Integer-lattice hash noise in [-1, 1] (tmplmath.cpp Noise2D)."""
    # int32 wraparound matches the reference's 32-bit int arithmetic
    n = x.astype(jnp.int32) + y.astype(jnp.int32) * 57
    n = (n << 13) ^ n
    a, b, c = (int(v) for v in _PRIMES[prime_index % len(_PRIMES)])
    t = (n * (n * n * jnp.int32(a) + jnp.int32(b)) + jnp.int32(c)) & jnp.int32(0x7FFFFFFF)
    return 1.0 - t.astype(jnp.float32) / np.float32(1073741824.0)


def _smoothed(x, y, i):
    corners = (
        _noise(x - 1, y - 1, i) + _noise(x + 1, y - 1, i)
        + _noise(x - 1, y + 1, i) + _noise(x + 1, y + 1, i)
    ) / 16.0
    sides = (
        _noise(x - 1, y, i) + _noise(x + 1, y, i)
        + _noise(x, y - 1, i) + _noise(x, y + 1, i)
    ) / 8.0
    return corners + sides + _noise(x, y, i) / 4.0


def _interpolated(x, y, i):
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    fx = x - xi
    fy = y - yi
    v1 = _smoothed(xi, yi, i)
    v2 = _smoothed(xi + 1, yi, i)
    v3 = _smoothed(xi, yi + 1, i)
    v4 = _smoothed(xi + 1, yi + 1, i)

    def cosine(a, b, t):
        f = (1.0 - jnp.cos(t * np.float32(np.pi))) * 0.5
        return a * (1 - f) + b * f

    return cosine(cosine(v1, v2, fx), cosine(v3, v4, fx), fy)


def noise2d(x: jnp.ndarray, y: jnp.ndarray, octaves: int = 7, persistence: float = 0.5):
    """Fractal value noise, matching the reference's octave accumulation."""
    total = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    freq = 1.0
    amp = 1.0
    for i in range(octaves):
        total = total + _interpolated(x * freq, y * freq, i) * amp
        freq *= 2.0
        amp *= persistence
    return total
