"""Differentiable-rendering parameter plumbing.

The optimizable parameters are exactly the scene quantities the north star
names (BASELINE.json): material params (albedo/reflectivity/refractivity/
absorption), texture texels, the light transform/color, and triangle vertex
positions.  `apply_params` swaps a parameter pytree into a DeviceScene;
integrators called with `differentiable=True` then give pixel gradients
w.r.t. all of them (detached visibility — see scene/query.find_nearest_diff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpu_ray_tracer_tpu.scene.types import DeviceScene

PARAM_KEYS = (
    "albedo",
    "reflectivity",
    "refractivity",
    "absorption",
    "texels",
    "light_color",
    "v0",
    "e1",
    "e2",
)


def extract_params(scene: DeviceScene, keys=("albedo", "texels", "light_color")) -> dict:
    src = {
        "albedo": scene.materials.albedo,
        "reflectivity": scene.materials.reflectivity,
        "refractivity": scene.materials.refractivity,
        "absorption": scene.materials.absorption,
        "texels": scene.atlas.texels,
        "light_color": scene.light_color,
        "v0": scene.tris.v0,
        "e1": scene.tris.e1,
        "e2": scene.tris.e2,
    }
    return {k: src[k] for k in keys}


def apply_params(scene: DeviceScene, params: dict) -> DeviceScene:
    mats = scene.materials
    for k in ("albedo", "reflectivity", "refractivity", "absorption"):
        if k in params:
            mats = mats.replace(**{k: params[k]})
    atlas = scene.atlas
    if "texels" in params:
        atlas = atlas.replace(texels=params["texels"])
    tris = scene.tris
    for k in ("v0", "e1", "e2"):
        if k in params:
            tris = tris.replace(**{k: params[k]})
    out = scene.replace(materials=mats, atlas=atlas, tris=tris)
    if "light_color" in params:
        out = out.replace(light_color=params["light_color"])
    return out


def l2_image_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img - target) ** 2)


def make_loss_fn(scene: DeviceScene, render_fn, target: jnp.ndarray):
    """render_fn(scene) -> image.  Returns loss(params) for jax.grad."""

    def loss(params):
        s = apply_params(scene, params)
        img = render_fn(s)
        return l2_image_loss(img, target)

    return loss


def finite_difference(loss_fn, params: dict, key: str, index, eps: float = 1e-3):
    """Central finite difference of loss w.r.t. one scalar entry — the
    gradient-correctness oracle (BASELINE.json metric)."""

    def perturbed(sign):
        p = dict(params)
        arr = p[key]
        flat = arr.reshape(-1)
        flat = flat.at[index].add(sign * eps)
        p[key] = flat.reshape(arr.shape)
        return loss_fn(p)

    return (perturbed(+1.0) - perturbed(-1.0)) / (2 * eps)
