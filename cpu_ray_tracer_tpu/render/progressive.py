"""Progressive accumulation driver (the reference's Tick loop,
3. PathTracer/renderer.cpp:144-167): repeated one-sample passes accumulate
into the Film; supports checkpoint/resume and per-step metrics."""

from __future__ import annotations

import jax.numpy as jnp

from cpu_ray_tracer_tpu.core import film as film_mod
from cpu_ray_tracer_tpu.core.camera import Camera
from cpu_ray_tracer_tpu.core.film import Film
from cpu_ray_tracer_tpu.render import pathtracer
from cpu_ray_tracer_tpu.scene.types import DeviceScene
from cpu_ray_tracer_tpu.utils import checkpoint as ckpt_mod
from cpu_ray_tracer_tpu.utils import metrics as metrics_mod


def render_progressive(
    scene: DeviceScene,
    camera: Camera,
    spp: int,
    depth_limit: int = 5,
    film: Film | None = None,
    checkpoint_path: str = "",
    checkpoint_every: int = 0,
    logger: metrics_mod.JsonlLogger | None = None,
    render_fn=None,
) -> Film:
    """Accumulate until `film.spp == spp`.  Resumes from `film` (e.g. loaded
    from a checkpoint).  `render_fn(scene, camera, pass_idx)` defaults to the
    single-chip jitted path-tracer pass; the sharded variant drops in."""
    if film is None:
        film = film_mod.make_film(camera.height, camera.width)
    if render_fn is None:
        def render_fn(s, c, i):
            return pathtracer.render_pass_jit(s, c, i, depth_limit=depth_limit)

    fm = metrics_mod.FrameMetrics(camera.width, camera.height)
    start = int(film.spp)
    for p in range(start, spp):
        fm.start()
        out = render_fn(scene, camera, jnp.uint32(p))
        radiance, stats = out if isinstance(out, tuple) else (out, {})
        radiance.block_until_ready()
        timing = fm.stop()
        film = film_mod.add_samples(film, radiance, 1)
        if logger is not None:
            rec = dict(
                step=p + 1,
                energy=float(film_mod.energy(film.mean())),
                **timing,
            )
            if stats:
                rec["rays_traced"] = int(stats.get("rays_traced", 0))
                rec.update(metrics_mod.traversal_summary(stats["traversed"], stats["tested"]))
            logger.log(rec)
        if checkpoint_path and checkpoint_every and (p + 1) % checkpoint_every == 0:
            ckpt_mod.save_film(checkpoint_path, film)
    return film
