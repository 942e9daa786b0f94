"""Bisect which step of compile_scene degrades per-call device latency."""

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

    def lat(tag):
        trivial(x).block_until_ready()
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            trivial(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{tag}: {ts[len(ts)//2]*1e3:.3f} ms", flush=True)

    lat("fresh")

    # Step 1: a single big f32 device array (like the skydome texels)
    big = jnp.asarray(np.zeros((8 * 1024 * 1024, 3), np.float32))  # 100 MB
    big.block_until_ready()
    lat("after_100MB_array")
    del big
    lat("after_del_100MB")

    # Step 2: load the actual textures + atlas (device arrays incl. packed u32)
    from cpu_ray_tracer_tpu.core.textures import build_atlas
    from cpu_ray_tracer_tpu.io.image import load_texture_image
    from cpu_ray_tracer_tpu.io.scene_xml import load_scene_xml, resolve_asset

    xml = os.path.join(REPO, "assets/scenes/bunny_teapot.xml")
    spec = load_scene_xml(xml)
    xml_dir = os.path.dirname(xml)
    images = []
    images.append(load_texture_image(resolve_asset(spec.plane_texture_location, xml_dir), keep_float=False))
    for m in spec.materials:
        if m.texture_location:
            images.append(load_texture_image(resolve_asset(m.texture_location, xml_dir), keep_float=False))
    atlas = build_atlas(images)
    atlas.texels.block_until_ready()
    print(f"atlas texels {atlas.texels.shape}", flush=True)
    lat("after_atlas")

    # Step 3: skydome texture (the big one)
    sky_img = load_texture_image(resolve_asset(spec.skydome_location, xml_dir), keep_float=False)
    sky = build_atlas([sky_img])
    sky.texels.block_until_ready()
    print(f"sky texels {sky.texels.shape} = {sky.texels.nbytes/1e6:.0f} MB", flush=True)
    lat("after_skydome")

    del sky
    lat("after_del_skydome")


if __name__ == "__main__":
    main()
