"""Differentiable-pass tests: jax.grad vs central finite differences for
material albedo, texture texels, light color and vertex positions
(BASELINE.json gradient-correctness metric)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracer_tpu.core import camera as cam_mod
from cpu_ray_tracer_tpu.diff import grad as grad_mod
from cpu_ray_tracer_tpu.render import pathtracer, whitted
from cpu_ray_tracer_tpu.scene.build import compile_scene

from tests.conftest import OUR_ASSETS

CUBE_XML = os.path.join(OUR_ASSETS, "scenes", "cube_scene.xml")


@pytest.fixture(scope="module")
def setup():
    # bilinear texture taps for smooth texel gradients
    scene, _ = compile_scene(CUBE_XML, layout="tlas", bilinear=True)
    cam = cam_mod.make_camera(16, 10)
    return scene, cam


def whitted_image(scene, cam):
    return whitted.render(scene, cam, depth_limit=2, differentiable=True)["image"]


class TestGradVsFiniteDifference:
    def _check(self, setup, key, indices, eps, atol, rtol, keys=None):
        scene, cam = setup
        keys = keys or (key,)
        params = grad_mod.extract_params(scene, keys=keys)
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        loss_fn = grad_mod.make_loss_fn(scene, lambda s: whitted_image(s, cam), target)
        g = jax.grad(loss_fn)(params)[key].reshape(-1)
        for idx in indices:
            fd = grad_mod.finite_difference(loss_fn, params, key, idx, eps=eps)
            got = float(g[idx])
            want = float(fd)
            assert abs(got - want) <= atol + rtol * abs(want), (
                f"{key}[{idx}]: grad {got} vs fd {want}"
            )
        return np.asarray(g)

    def test_albedo_gradients(self, setup):
        # material slot 2 = the cube's XML material (constant albedo)
        g = self._check(setup, "albedo", [2 * 3 + 0, 2 * 3 + 1, 2 * 3 + 2], 1e-3, 5e-5, 5e-2)
        assert np.abs(g).max() > 0  # something flows

    def test_light_color_gradients(self, setup):
        self._check(setup, "light_color", [0, 1, 2], 1e-2, 1e-5, 5e-2)

    def test_texel_gradients_flow(self, setup):
        scene, cam = setup
        params = grad_mod.extract_params(scene, keys=("texels",))
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        loss_fn = grad_mod.make_loss_fn(scene, lambda s: whitted_image(s, cam), target)
        g = jax.grad(loss_fn)(params)["texels"]
        nz = int(jnp.sum(jnp.any(jnp.abs(g) > 0, axis=-1)))
        assert nz > 10  # many floor/sky texels receive gradient
        # spot-check one texel with nonzero gradient against FD
        flat = np.asarray(g).reshape(-1)
        idx = int(np.argmax(np.abs(flat)))
        fd = grad_mod.finite_difference(loss_fn, params, "texels", idx, eps=1e-2)
        got, want = float(flat[idx]), float(fd)
        assert abs(got - want) <= 1e-5 + 0.05 * abs(want)

    def test_vertex_gradients_flow(self, setup):
        # vertex positions: grads via the recomputed t/bary (non-silhouette)
        scene, cam = setup
        params = grad_mod.extract_params(scene, keys=("v0", "e1", "e2"))
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        loss_fn = grad_mod.make_loss_fn(scene, lambda s: whitted_image(s, cam), target)
        g = jax.grad(loss_fn)(params)
        total = sum(float(jnp.abs(v).sum()) for v in g.values())
        assert np.isfinite(total)
        assert total > 0

    def test_pt_gradients_finite(self, setup):
        scene, cam = setup
        params = grad_mod.extract_params(scene, keys=("albedo", "texels", "light_color"))
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)

        def render_fn(s):
            img, _ = pathtracer.render_pass(
                s, cam, jnp.uint32(0), depth_limit=2, differentiable=True
            )
            return img

        loss_fn = grad_mod.make_loss_fn(scene, render_fn, target)
        g = jax.grad(loss_fn)(params)
        for k, v in g.items():
            assert np.isfinite(np.asarray(v)).all(), k
        assert float(jnp.abs(g["albedo"]).sum()) > 0

    def test_pt_grad_matches_fd_fixed_seed(self, setup):
        # With the SAME seed, the PT estimator is a deterministic function;
        # its gradient must match FD like any other function.
        scene, cam = setup
        params = grad_mod.extract_params(scene, keys=("albedo",))
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)

        def render_fn(s):
            img, _ = pathtracer.render_pass(
                s, cam, jnp.uint32(7), depth_limit=2, differentiable=True
            )
            return img

        loss_fn = grad_mod.make_loss_fn(scene, render_fn, target)
        g = jax.grad(loss_fn)(params)["albedo"].reshape(-1)
        idx = 2 * 3 + 1
        fd = grad_mod.finite_difference(loss_fn, params, "albedo", idx, eps=1e-3)
        got, want = float(g[idx]), float(fd)
        assert abs(got - want) <= 1e-5 + 0.05 * abs(want), (got, want)


class TestOptimization:
    def test_albedo_recovery(self, setup):
        # inverse rendering: perturb the cube albedo, recover it from the
        # original image by gradient descent (config 5's mechanism, tiny)
        import optax

        scene, cam = setup
        target = whitted_image(scene, cam)

        params = grad_mod.extract_params(scene, keys=("albedo",))
        true_albedo = params["albedo"]
        params = {"albedo": params["albedo"].at[2].set(jnp.array([0.2, 0.9, 0.4]))}

        loss_fn = grad_mod.make_loss_fn(scene, lambda s: whitted_image(s, cam), target)
        opt = optax.adam(0.05)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, st = opt.update(g, st, p)
            return optax.apply_updates(p, up), st, l

        losses = []
        for _ in range(60):
            params, opt_state, l = step(params, opt_state)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.05
        np.testing.assert_allclose(
            np.asarray(params["albedo"][2]), np.asarray(true_albedo[2]), atol=0.08
        )


class TestDiffCompaction:
    """r3: compaction is enabled under grad (remat'd bounces + custom-vjp
    permutes, see sample_radiance docstring).  The permutation machinery
    must be gradient-transparent: chunked+sorted grads == unchunked grads."""

    @pytest.fixture(scope="class")
    def setup4k(self):
        # nearest-tap (parity) mode: bilinear diff is force-unchunked (see
        # sample_radiance), so only this mode exercises the chunked+sorted
        # grad path this class is about
        scene, _ = compile_scene(CUBE_XML, layout="tlas", bilinear=False)
        cam = cam_mod.make_camera(64, 64)  # 4096 rays: chunkable width
        return scene, cam

    def _grads(self, scene, cam, chunks):
        params = grad_mod.extract_params(scene, keys=("albedo", "light_color"))
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        n = cam.width * cam.height
        from cpu_ray_tracer_tpu.core import rng as rng_mod

        seeds = rng_mod.pixel_seeds(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))

        def loss_fn(p):
            s = grad_mod.apply_params(scene, p)
            rays = cam_mod.full_frame_rays(cam)
            rad, _ = pathtracer.sample_radiance(
                s, rays.o, rays.d, seeds, depth_limit=3,
                differentiable=True, compaction_chunks=chunks,
            )
            img = rad.reshape(cam.height, cam.width, 3)
            return grad_mod.l2_image_loss(img, target)

        return jax.value_and_grad(loss_fn)(params)

    def test_chunked_grads_match_unchunked(self, setup4k):
        scene, cam = setup4k
        l1, g1 = self._grads(scene, cam, 1)
        l4, g4 = self._grads(scene, cam, 4)
        # the estimator is permutation-invariant: identical loss
        np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g4[k]), rtol=1e-4, atol=1e-7,
                err_msg=k,
            )


class TestBilinearDiffCompaction:
    """r4: bilinear (texture-learning) diff chunks too — the texel tap is
    DEFERRED out of the chunk scans (pathtracer._bounce_step defer_tex), so
    the scan transpose never stacks atlas cotangents (the r3 19.8 GB OOM).
    Chunked+sorted grads — including the `texels` leaf — must equal the
    unchunked ones, and the forward radiance must equal the
    non-differentiable render (the deferral is an exact refactoring)."""

    @pytest.fixture(scope="class")
    def setup4k(self):
        scene, _ = compile_scene(CUBE_XML, layout="tlas", bilinear=True)
        cam = cam_mod.make_camera(64, 64)
        return scene, cam

    def _grads(self, scene, cam, chunks, differentiable=True):
        params = grad_mod.extract_params(
            scene, keys=("albedo", "texels", "light_color")
        )
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        n = cam.width * cam.height
        from cpu_ray_tracer_tpu.core import rng as rng_mod

        seeds = rng_mod.pixel_seeds(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))

        def loss_fn(p):
            s = grad_mod.apply_params(scene, p)
            rays = cam_mod.full_frame_rays(cam)
            rad, _ = pathtracer.sample_radiance(
                s, rays.o, rays.d, seeds, depth_limit=3,
                differentiable=differentiable, compaction_chunks=chunks,
            )
            img = rad.reshape(cam.height, cam.width, 3)
            return grad_mod.l2_image_loss(img, target)

        if not differentiable:
            return loss_fn(params), None
        return jax.value_and_grad(loss_fn)(params)

    def test_bilinear_chunked_grads_match_unchunked(self, setup4k):
        scene, cam = setup4k
        l1, g1 = self._grads(scene, cam, 1)
        l4, g4 = self._grads(scene, cam, 4)
        np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
        assert float(jnp.abs(g1["texels"]).sum()) > 0  # texel grads flow
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g4[k]), rtol=1e-4, atol=1e-7,
                err_msg=k,
            )

    def test_d1_tap_deferral_matches_fullwidth_apply(self, setup4k, monkeypatch):
        """r5 d1-tap deferral (records ride the depth-2 compaction sort,
        factor applies on the tier head) vs the full-width depth-1 apply:
        same loss, same gradients including the texels leaf."""
        scene, cam = setup4k
        monkeypatch.setenv("CRT_D1_TAP_DEFER", "0")
        l0, g0 = self._grads(scene, cam, 4)
        monkeypatch.setenv("CRT_D1_TAP_DEFER", "1")
        l1, g1 = self._grads(scene, cam, 4)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(g0[k]), np.asarray(g1[k]), rtol=1e-4, atol=1e-7,
                err_msg=k,
            )

    def test_deferred_tap_matches_inline_forward(self, setup4k):
        # differentiable=False renders with the INLINE bilinear tap; the
        # deferred-factor estimator must produce the same radiance
        scene, cam = setup4k
        l_inline, _ = self._grads(scene, cam, 4, differentiable=False)
        l_defer, _ = self._grads(scene, cam, 4)
        np.testing.assert_allclose(float(l_inline), float(l_defer), rtol=2e-4)

    def test_deferred_tap_grads_match_inline_autodiff(self, setup4k, monkeypatch):
        # the deferred tap's HAND-WRITTEN VJP (_apply_tap_factor_bwd:
        # texel scatter + tx/ty chain rule) against the independent
        # formulation: plain autodiff through sample_bilinear
        # (CRT_DEFER_TEX=0).  Covers the uv-side (vertex) gradients that
        # the texel FD tests do not reach.
        scene, cam = setup4k
        params_keys = ("albedo", "texels", "light_color", "v0", "e1", "e2")
        target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        n = cam.width * cam.height
        from cpu_ray_tracer_tpu.core import rng as rng_mod

        seeds = rng_mod.pixel_seeds(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))

        def grads(defer):
            monkeypatch.setenv("CRT_DEFER_TEX", "1" if defer else "0")
            params = grad_mod.extract_params(scene, keys=params_keys)

            def loss_fn(p):
                s = grad_mod.apply_params(scene, p)
                rays = cam_mod.full_frame_rays(cam)
                rad, _ = pathtracer.sample_radiance(
                    s, rays.o, rays.d, seeds, depth_limit=2,
                    differentiable=True, compaction_chunks=4,
                )
                return grad_mod.l2_image_loss(
                    rad.reshape(cam.height, cam.width, 3), target
                )

            return jax.value_and_grad(loss_fn)(params)

        l_d, g_d = grads(True)
        l_i, g_i = grads(False)
        np.testing.assert_allclose(float(l_d), float(l_i), rtol=1e-5)
        for k in g_d:
            np.testing.assert_allclose(
                np.asarray(g_d[k]), np.asarray(g_i[k]), rtol=2e-4, atol=1e-7,
                err_msg=k,
            )
