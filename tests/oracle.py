"""Independent scalar/numpy oracle implementing the reference's recursive
Whitted `Trace` and scene queries directly (2. WhittedStyle/renderer.cpp,
infra/scene/tlas_file_scene.cpp), with brute-force triangle intersection.

Structured like the C++ (per-ray recursion, early returns) so it is an
independent check of BOTH the BVH traversal and the wavefront integrator.
Use at tiny resolutions only.
"""

from __future__ import annotations

import numpy as np

EPSILON = np.float32(1e-3)
TRI_EPS = np.float32(1e-4)
IOR = np.float32(1.2)
LIGHT_COLOR = np.array([24.0, 24.0, 22.0], np.float32)
AMBIENT = np.array([0.3, 0.3, 0.3], np.float32)
INVPI = 1.0 / np.pi


class SceneOracle:
    def __init__(self, scene):
        """Pull a DeviceScene's arrays to numpy."""
        g = lambda x: np.asarray(x)
        self.v0 = g(scene.tris.v0)
        self.e1 = g(scene.tris.e1)
        self.e2 = g(scene.tris.e2)
        self.n0 = g(scene.tris.n0)
        self.n1 = g(scene.tris.n1)
        self.n2 = g(scene.tris.n2)
        self.uv0 = g(scene.tris.uv0)
        self.uv1 = g(scene.tris.uv1)
        self.uv2 = g(scene.tris.uv2)
        self.obj_id = g(scene.tris.obj_id)
        self.tri_mat = g(scene.tris.mat_id)
        self.albedo = g(scene.materials.albedo)
        self.reflectivity = g(scene.materials.reflectivity)
        self.refractivity = g(scene.materials.refractivity)
        self.absorption = g(scene.materials.absorption)
        self.tex_id = g(scene.materials.tex_id)
        self.is_light = g(scene.materials.is_light)
        self.texels = g(scene.atlas.texels)
        self.tex_off = g(scene.atlas.offset)
        self.tex_w = g(scene.atlas.width)
        self.tex_h = g(scene.atlas.height)
        self.light_t = g(scene.light_t)
        self.light_inv_t = g(scene.light_inv_t)
        self.light_size = np.float32(scene.light_size)
        self.floor_inv_to = np.float32(scene.floor_inv_to)
        self.skydome_tex = scene.skydome_tex

    # --- primitives ------------------------------------------------------
    def intersect_quad(self, o, d, tmax):
        it = self.light_inv_t
        oy = it[1, 0] * o[0] + it[1, 1] * o[1] + it[1, 2] * o[2] + it[1, 3]
        dy = it[1, 0] * d[0] + it[1, 1] * d[1] + it[1, 2] * d[2]
        if dy == 0:
            return None
        t = oy / -dy
        if not (0 < t < tmax):
            return None
        ox = it[0, 0] * o[0] + it[0, 1] * o[1] + it[0, 2] * o[2] + it[0, 3]
        oz = it[2, 0] * o[0] + it[2, 1] * o[1] + it[2, 2] * o[2] + it[2, 3]
        dx = it[0, 0] * d[0] + it[0, 1] * d[1] + it[0, 2] * d[2]
        dz = it[2, 0] * d[0] + it[2, 1] * d[1] + it[2, 2] * d[2]
        ix = ox + t * dx
        iz = oz + t * dz
        s = self.light_size
        if -s < ix < s and -s < iz < s:
            return t
        return None

    def intersect_floor(self, o, d, tmax):
        if d[1] == 0:
            return None
        t = -(o[1] + 1.0) / d[1]
        if 0 < t < tmax:
            return t
        return None

    def intersect_tris(self, o, d, tmax):
        """Vectorized brute force over all triangles; returns
        (t, tri, u, v) or None."""
        h = np.cross(d[None], self.e2)
        a = np.einsum("ij,ij->i", self.e1, h)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            s = o[None] - self.v0
            u = f * np.einsum("ij,ij->i", s, h)
            q = np.cross(s, self.e1)
            v = f * np.einsum("ij,j->i", q, d)
            t = f * np.einsum("ij,ij->i", self.e2, q)
        ok = (
            (np.abs(a) >= TRI_EPS)
            & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            & (t > TRI_EPS) & (t < tmax)
        )
        if not ok.any():
            return None
        idx = np.where(ok)[0]
        best = idx[np.argmin(t[idx])]
        return float(t[best]), int(best), float(u[best]), float(v[best])

    # --- scene queries -----------------------------------------------------
    def find_nearest(self, o, d):
        t = 1e34
        obj = -1
        tri = -1
        bary = (0.0, 0.0)
        tq = self.intersect_quad(o, d, t)
        if tq is not None:
            t, obj = tq, 0
        tf = self.intersect_floor(o, d, t)
        if tf is not None:
            t, obj = tf, 1
        tt = self.intersect_tris(o, d, t)
        if tt is not None:
            t, tri, u, v = tt
            obj = int(self.obj_id[tri])
            bary = (u, v)
        return t, obj, tri, bary

    def is_occluded(self, o, d, dist):
        if self.intersect_quad(o, d, dist) is not None:
            return True
        # quirk (file_scene.cpp:177-187): triangles checked with t reset to inf
        return self.intersect_tris(o, d, 1e34) is not None

    def sample_tex(self, tid, u, v):
        if tid < 0:
            return np.zeros(3, np.float32)
        w, h, off = int(self.tex_w[tid]), int(self.tex_h[tid]), int(self.tex_off[tid])
        uu = min(max(u, 0.0), 1.0)
        vv = 1.0 - min(max(v, 0.0), 1.0)
        x = min(max(int(uu * w), 0), w - 1)
        y = min(max(int(vv * h), 0), h - 1)
        return self.texels[off + x + y * w]

    def sky_color(self, d):
        if self.skydome_tex < 0:
            return np.zeros(3, np.float32)
        phi = np.arctan2(-d[2], d[0]) + np.pi
        theta = np.arccos(np.clip(-d[1], -1, 1))
        return self.sample_tex(self.skydome_tex, phi / (2 * np.pi), theta / np.pi)

    def get_light_pos(self):
        t = self.light_t
        c1 = t[:3, :3] @ np.array([-0.5, 0, -0.5], np.float32) + t[:3, 3]
        c2 = t[:3, :3] @ np.array([0.5, 0, 0.5], np.float32) + t[:3, 3]
        return ((c1 + c2) * np.float32(0.5) - np.array([0, 0.01, 0], np.float32)).astype(np.float32)

    def hit_info(self, o, d, t, obj, tri, bary):
        p = o + t * d
        if obj == 0:
            n = -self.light_t[:3, 1]
            uv = (0.0, 0.0)
            mat = 0
        elif obj == 1:
            n = np.array([0.0, 1.0, 0.0], np.float32)
            u = p[0] * self.floor_inv_to
            v = p[2] * self.floor_inv_to
            uv = (u - np.floor(u), v - np.floor(v))
            mat = 1
        else:
            u, v = bary
            w = 1 - u - v
            n = w * self.n0[tri] + u * self.n1[tri] + v * self.n2[tri]
            n = n / max(np.linalg.norm(n), 1e-20)
            uv = tuple(w * self.uv0[tri] + u * self.uv1[tri] + v * self.uv2[tri])
            mat = int(self.tri_mat[tri])
        if np.dot(n, d) > 0:
            n = -n
        return p, n, uv, mat

    def get_albedo(self, mat, uv):
        tid = int(self.tex_id[mat])
        if tid >= 0:
            return self.sample_tex(tid, uv[0], uv[1])
        return self.albedo[mat]


class WhittedOracle:
    """Recursive reference Trace (2. WhittedStyle/renderer.cpp:21-126)."""

    def __init__(self, scene, depth_limit=5):
        self.s = SceneOracle(scene)
        self.depth_limit = depth_limit

    def direct_illumination(self, p, n):
        s = self.s
        lp = s.get_light_pos()
        l = (lp - p).astype(np.float32)
        dist = np.float32(np.linalg.norm(l))
        l = (l / dist).astype(np.float32)
        ndotl = float(np.dot(n, l))
        if ndotl < EPSILON:
            return np.zeros(3, np.float32)
        if s.is_occluded(p + l * EPSILON, l, dist - 2 * EPSILON):
            return np.zeros(3, np.float32)
        return LIGHT_COLOR * (ndotl / (dist * dist))

    def trace(self, o, d, inside, depth):
        if depth > self.depth_limit:
            return np.zeros(3, np.float32)
        s = self.s
        t, obj, tri, bary = s.find_nearest(o, d)
        if obj == -1:
            return s.sky_color(d)
        p, n, uv, mat = s.hit_info(o, d, t, obj, tri, bary)
        albedo = s.get_albedo(mat, uv)
        if s.is_light[mat]:
            return LIGHT_COLOR.copy()
        out = np.zeros(3, np.float32)
        refl = float(s.reflectivity[mat])
        refr = float(s.refractivity[mat])
        diff = 1 - (refl + refr)
        if refl > 0:
            r = d - 2 * n * np.dot(n, d)
            out += refl * albedo * self.trace(p + r * EPSILON, r, False, depth + 1)
        elif refr > 0:
            r = d - 2 * n * np.dot(n, d)
            n1, n2 = (IOR, 1.0) if inside else (1.0, IOR)
            eta = n1 / n2
            cosi = float(np.dot(-d, n))
            cost2 = 1 - eta * eta * (1 - cosi * cosi)
            fr = 1.0
            if cost2 > 0:
                r0 = ((n1 - n2) / (n1 + n2)) ** 2
                c = 1 - cosi
                fr = r0 + (1 - r0) * c**5
                tdir = eta * d + (eta * cosi - np.sqrt(abs(cost2))) * n
                out += albedo * (1 - fr) * self.trace(
                    p + tdir * EPSILON, tdir, not inside, depth + 1
                )
            out += albedo * fr * self.trace(p + r * EPSILON, r, False, depth + 1)
        if diff > 0:
            irr = self.direct_illumination(p, n)
            out += diff * (albedo * INVPI) * (irr + AMBIENT)
        if inside:
            out = out * np.exp(s.absorption[mat] * -t)
        return out

    def render(self, camera):
        """Renders using the package's own primary-ray generator so the
        comparison isolates traversal+shading (bit-identical primaries —
        nearest-neighbor texture taps make images discontinuous in the
        ray direction's LSBs)."""
        from cpu_ray_tracer_tpu.core.camera import full_frame_rays

        w, h = camera.width, camera.height
        rays = full_frame_rays(camera)
        o = np.asarray(rays.o)
        d = np.asarray(rays.d)
        img = np.zeros((h * w, 3), np.float32)
        for i in range(h * w):
            img[i] = self.trace(o[i], d[i], False, 0)
        return img.reshape(h, w, 3)
