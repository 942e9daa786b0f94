"""Debug AOV colorizations (infra/helper.h:104-128)."""

from __future__ import annotations

import jax.numpy as jnp


def traverse_count_color(count: jnp.ndarray, peak) -> jnp.ndarray:
    """Green -> red heatmap of traversal counts
    (helper.h:104-120 GetTraverseCountColor): ratio = count/peak, low half
    lerps green->yellow, high half yellow->red."""
    ratio = count.astype(jnp.float32) / jnp.maximum(jnp.asarray(peak, jnp.float32), 1.0)
    low = ratio <= 0.5
    t = jnp.where(low, ratio * 2.0, (ratio - 0.5) * 2.0)
    r = jnp.where(low, t, 1.0)
    g = jnp.where(low, 1.0, 1.0 - t)
    return jnp.stack([r, g, jnp.zeros_like(r)], axis=-1)


def depth_color(depth: jnp.ndarray, max_depth) -> jnp.ndarray:
    """Blue -> red by tree depth (helper.h:122-128)."""
    ratio = depth.astype(jnp.float32) / jnp.maximum(jnp.asarray(max_depth, jnp.float32), 1.0)
    return jnp.stack([ratio, jnp.zeros_like(ratio), 1.0 - ratio], axis=-1)


def edge_color(bary: jnp.ndarray) -> jnp.ndarray:
    """Black near triangle edges (renderer.cpp GetEdgeDebugColor)."""
    u = bary[..., 0]
    v = bary[..., 1]
    near = (
        (jnp.abs(u) < 0.03)
        | (jnp.abs(u - 1.0) < 0.03)
        | (jnp.abs(v) < 0.03)
        | (jnp.abs(v - 1.0) < 0.03)
    )
    c = jnp.where(near, 0.0, 1.0)
    return jnp.stack([c, c, c], axis=-1)


def id_color(ids: jnp.ndarray) -> jnp.ndarray:
    """Stable pseudo-random color per object id; black for misses."""
    h = (ids.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(2654435761)
    r = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = (h & 0xFF).astype(jnp.float32) / 255.0
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.where((ids >= 0)[..., None], rgb, 0.0)
