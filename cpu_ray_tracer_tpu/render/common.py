"""Shared shading pieces used by both integrators."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracer_tpu import constants
from cpu_ray_tracer_tpu.core import vecmath as vm
from cpu_ray_tracer_tpu.scene import query
from cpu_ray_tracer_tpu.scene.types import DeviceScene

EPS = constants.SHADE_EPS


def direct_illumination(scene: DeviceScene, point: jnp.ndarray, normal: jnp.ndarray, active=None):
    """Point-light direct irradiance with a shadow ray
    (2. WhittedStyle/renderer.cpp:105-126): inverse-square falloff, N·L,
    shadow max distance = dist - 2*EPSILON."""
    light_pos = query.get_light_pos(scene)
    l = light_pos - point
    dist = vm.length(l)
    l = l / jnp.maximum(dist, 1e-20)[..., None]
    ndotl = vm.dot(normal, l)
    facing = ndotl >= EPS
    occluded = query.is_occluded(
        scene, point + l * EPS, l, jnp.maximum(dist - 2 * EPS, 1e-6), mask=active
    )
    att = 1.0 / jnp.maximum(dist * dist, 1e-20)
    irr = scene.light_color * (att * ndotl)[..., None]
    vis = facing & (~occluded)
    if active is not None:
        vis = vis & active
    return jnp.where(vis[..., None], irr, 0.0)


def dielectric_terms(d: jnp.ndarray, n: jnp.ndarray, inside: jnp.ndarray):
    """Shared dielectric math of both integrators
    (2. WhittedStyle/renderer.cpp:54-66, 3. PathTracer/renderer.cpp:27-45).

    Returns (fresnel, can_refract, transmitted_dir, reflected_dir).
    fresnel is 1 under total internal reflection (`Fr = 1` default).
    """
    n1 = jnp.where(inside, constants.IOR, 1.0)
    n2 = jnp.where(inside, 1.0, constants.IOR)
    eta = n1 / n2
    cosi, cost2, t_dir = vm.refract_terms(d, n, eta)
    can = cost2 > 0.0
    fr = jnp.where(can, vm.schlick_fresnel(cosi, n1, n2), 1.0)
    r_dir = vm.reflect(d, n)
    return fr, can, t_dir, r_dir


def beer(scene: DeviceScene, mat_id: jnp.ndarray, t: jnp.ndarray, inside: jnp.ndarray):
    """Medium transmittance exp(-absorption*t) applied only while inside
    (renderer.cpp:81-88)."""
    absorption = scene.materials.absorption[mat_id]
    scale = jnp.exp(absorption * (-t)[..., None])
    return jnp.where(inside[..., None], scale, 1.0)


def orthonormal_basis(n: jnp.ndarray):
    """Branchless tangent frame (Frisvad-style) for hemisphere sampling."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, n[..., 1] * -1.0], axis=-1)
    return t, bt


def uniform_hemisphere(n: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray):
    """Uniform solid-angle hemisphere direction about n.

    Statistically equivalent to the reference's rejection sampler
    (tmplmath.h:535-544 `diffusereflection`): pdf = 1/2pi, paired with the
    estimator `brdf * 2pi * cos` (3. PathTracer/renderer.cpp:93-99).
    """
    z = r1  # cos(theta) uniform in [0,1] -> uniform on hemisphere
    phi = (2.0 * np.pi) * r2
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    t, bt = orthonormal_basis(n)
    return t * x[..., None] + bt * y[..., None] + n * z[..., None]
