"""Generate substitute assets for files the upstream repo references but does
not ship (SURVEY.md §2 "Missing assets"):

* industrial_sunset_puresky_4k.hdr  -> procedural sunset sky (.png)
* textures/log_fence.png            -> procedural wood grain
* urna.obj + textures/urna.jpg      -> procedural lathed urn + ceramic texture

Run from repo root: python tools/make_substitute_assets.py
"""

import os

import numpy as np
from PIL import Image

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def sunset_sky(w=2048, h=1024):
    """Equirect sunset: warm horizon band, blue-grey zenith, sun disk."""
    v = np.linspace(0.0, 1.0, h)[:, None]  # 0 = top (zenith)
    u = np.linspace(0.0, 1.0, w)[None, :]
    # vertical gradient: zenith steel blue -> horizon orange -> ground brown
    zenith = np.array([0.35, 0.47, 0.66])
    horizon = np.array([0.98, 0.62, 0.35])
    ground = np.array([0.25, 0.20, 0.17])
    t_sky = np.clip(v / 0.5, 0, 1) ** 1.5
    sky = zenith[None, None] * (1 - t_sky[..., None]) + horizon[None, None] * t_sky[..., None]
    t_gnd = np.clip((v - 0.5) / 0.5, 0, 1) ** 0.5
    img = sky * (1 - t_gnd[..., None]) + ground[None, None] * t_gnd[..., None]
    # sun disk just above horizon
    su, sv = 0.72, 0.47
    du = np.minimum(np.abs(u - su), 1 - np.abs(u - su)) * 2.0  # wrap
    dist = np.sqrt(du**2 + ((v - sv) * 1.0) ** 2)
    sun = np.clip(1.0 - dist / 0.03, 0, 1) ** 0.5
    glow = np.exp(-((dist / 0.25) ** 2))
    img = img + sun[..., None] * np.array([1.0, 0.9, 0.7]) + glow[..., None] * np.array([0.5, 0.3, 0.12])
    return np.clip(img, 0, 1)


def wood_grain(w=512, h=512, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 12 * np.pi, w)[None, :]
    y = np.linspace(0, 3 * np.pi, h)[:, None]
    rings = np.sin(x + 2.2 * np.sin(y) + rng.normal(0, 0.4, (h, 1)).cumsum(0) * 0.15)
    grain = 0.5 + 0.5 * rings
    base_dark = np.array([0.33, 0.21, 0.11])
    base_light = np.array([0.55, 0.38, 0.21])
    img = base_dark[None, None] * (1 - grain[..., None]) + base_light[None, None] * grain[..., None]
    noise = rng.normal(0, 0.02, (h, w, 1))
    return np.clip(img + noise, 0, 1)


def ceramic(w=256, h=256, seed=3):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 6 * np.pi, h)[:, None]
    bands = 0.85 + 0.1 * np.sin(y)
    img = np.repeat(bands, w, axis=1)[..., None] * np.array([0.82, 0.72, 0.6])
    img += rng.normal(0, 0.015, (h, w, 3))
    return np.clip(img, 0, 1)


def urn_obj(path, rings=24, segs=32):
    """Lathed urn: revolve a vase profile around Y."""
    profile_t = np.linspace(0, 1, rings)
    radius = 0.25 + 0.35 * np.sin(profile_t * np.pi) ** 1.3 + 0.1 * (1 - profile_t) ** 4
    height = profile_t * 1.6 - 0.8
    verts, norms, uvs, faces = [], [], [], []
    for i, (r, hgt) in enumerate(zip(radius, height)):
        for j in range(segs):
            a = 2 * np.pi * j / segs
            verts.append((r * np.cos(a), hgt, r * np.sin(a)))
            # approximate normal from profile slope
            dr = (radius[min(i + 1, rings - 1)] - radius[max(i - 1, 0)])
            dh = (height[min(i + 1, rings - 1)] - height[max(i - 1, 0)])
            n = np.array([dh * np.cos(a), -dr, dh * np.sin(a)])
            n = n / (np.linalg.norm(n) + 1e-9)
            norms.append(tuple(n))
            uvs.append((j / segs, i / (rings - 1)))
    for i in range(rings - 1):
        for j in range(segs):
            a = i * segs + j
            b = i * segs + (j + 1) % segs
            c = (i + 1) * segs + (j + 1) % segs
            d = (i + 1) * segs + j
            faces.append((a, b, c))
            faces.append((a, c, d))
    with open(path, "w") as f:
        f.write("# procedural urn (substitute asset)\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in uvs:
            f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for n in norms:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a+1}/{a+1}/{a+1} {b+1}/{b+1}/{b+1} {c+1}/{c+1}/{c+1}\n")


def save(img, path):
    Image.fromarray((img * 255).astype(np.uint8), "RGB").save(path)
    print("wrote", path)


if __name__ == "__main__":
    os.makedirs(os.path.join(ASSETS, "textures"), exist_ok=True)
    save(sunset_sky(), os.path.join(ASSETS, "industrial_sunset_puresky_4k.png"))
    save(wood_grain(), os.path.join(ASSETS, "textures", "log_fence.png"))
    save(ceramic(), os.path.join(ASSETS, "textures", "urna.jpg"))
    save(wood_grain(256, 256, seed=21), os.path.join(ASSETS, "textures", "T_Trim_01_BaseColor.png"))
    urn_obj(os.path.join(ASSETS, "urna.obj"))
    print("done")
