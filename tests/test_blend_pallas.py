# -*- coding: utf-8 -*-
"""Pallas blend kernels vs the XLA fallback (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import rasterize

from test_rasterizer import make_camera, make_scene

CFG_XLA = RasterizerConfig(
    tile_h=8, tile_w=128, max_tiles_per_gaussian=32, tile_capacity=128,
    chunk=8, backend="xla",
)
CFG_PALLAS = CFG_XLA.replace(backend="pallas")


def small_setup(seed=0, n=48):
    cam = make_camera(W=256, H=16)
    scene = make_scene(jax.random.PRNGKey(seed), n=n, opacity_max=0.8)
    return cam, scene


class TestPallasBlend:
    def test_forward_matches_xla(self):
        cam, scene = small_setup()
        out_x = rasterize(*scene, cam, CFG_XLA)
        out_p = rasterize(*scene, cam, CFG_PALLAS)
        assert int(out_x.n_truncated) == 0
        np.testing.assert_allclose(out_p.image, out_x.image, atol=1e-6)
        np.testing.assert_allclose(out_p.final_T, out_x.final_T, atol=1e-6)

    def test_forward_with_bg(self):
        cam, scene = small_setup(seed=1)
        bg = jnp.array([0.3, 0.1, 0.6])
        out_x = rasterize(*scene, cam, CFG_XLA, bg=bg)
        out_p = rasterize(*scene, cam, CFG_PALLAS, bg=bg)
        np.testing.assert_allclose(out_p.image, out_x.image, atol=1e-6)

    def test_backward_matches_xla(self):
        cam, scene = small_setup(seed=2)
        wgt = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 256))

        def make_loss(cfg):
            def loss(means, op, sc, qu, co):
                out = rasterize(means, op, sc, qu, co, cam, cfg)
                return jnp.sum(out.image * wgt)
            return loss

        g_x = jax.grad(make_loss(CFG_XLA), argnums=(0, 1, 2, 3, 4))(*scene)
        g_p = jax.grad(make_loss(CFG_PALLAS), argnums=(0, 1, 2, 3, 4))(*scene)
        for name, gx, gp in zip("means op sc qu co".split(), g_x, g_p):
            scale = np.maximum(np.abs(np.asarray(gx)).max(), 1e-8)
            # 2e-5: the kernel recovers the geometric gradients from
            # tile-centered pixel moments (algebraically identical to the
            # per-slot fields; f32 recombination rounding differs)
            np.testing.assert_allclose(
                np.asarray(gp) / scale, np.asarray(gx) / scale, atol=2e-5,
                err_msg=f"pallas grad mismatch: {name}",
            )

    def test_saturation_early_exit(self):
        # Opaque stack saturating T: pallas early-exit must not change output.
        cam, _ = small_setup()
        n = 64
        means = jnp.tile(jnp.array([10.0, 0.0, 0.0]), (n, 1))
        scene = (
            means,
            jnp.full((n,), 0.95),
            jnp.full((n, 3), 0.5),
            jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            jax.random.uniform(jax.random.PRNGKey(4), (n, 3)),
        )
        out_x = rasterize(*scene, cam, CFG_XLA)
        out_p = rasterize(*scene, cam, CFG_PALLAS)
        np.testing.assert_allclose(out_p.image, out_x.image, atol=1e-6)
        np.testing.assert_allclose(out_p.final_T, out_x.final_T, atol=1e-7)

    def test_truncated_tiles_match(self):
        # more gaussians in a tile than capacity: nearest-K truncation must
        # behave identically in both backends
        cam = make_camera(W=256, H=16)
        n = 256
        key = jax.random.PRNGKey(5)
        means = jnp.stack([
            jax.random.uniform(key, (n,), minval=8.0, maxval=30.0),
            jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                               minval=-1.0, maxval=1.0),
            jax.random.uniform(jax.random.fold_in(key, 2), (n,),
                               minval=-0.2, maxval=0.2),
        ], -1)
        scene = (
            means,
            jnp.full((n,), 0.4),
            jnp.full((n, 3), 0.3),
            jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            jax.random.uniform(jax.random.fold_in(key, 3), (n, 3)),
        )
        cfg_small = CFG_XLA.replace(tile_capacity=16, chunk=8,
                                    max_tiles_per_gaussian=64)
        out_x = rasterize(*scene, cam, cfg_small)
        out_p = rasterize(*scene, cam, cfg_small.replace(backend="pallas"))
        assert int(out_x.n_truncated) > 0, "test needs actual truncation"
        np.testing.assert_allclose(out_p.image, out_x.image, atol=1e-6)


class TestGradCapacity:
    """Bounded backward slot space (RasterizerConfig.grad_capacity):
    slots past the deepest n_contrib carry zero gradient, so a capacity
    covering them must reproduce the unbounded scatter bit-exactly, and a
    too-small capacity must be *reported* (n_grad_truncated > 0)."""

    def _grads(self, cam, scene, cfg):
        def loss(*s):
            out = rasterize(*s, cam, cfg)
            return jnp.sum(out.image ** 2)

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*scene)

    def test_covering_capacity_is_exact(self):
        # opaque stack: saturation after a handful of slots
        cam, _ = small_setup()
        n = 64
        means = jnp.stack([
            jax.random.uniform(jax.random.PRNGKey(7), (n,), minval=8.0,
                               maxval=12.0),
            jnp.zeros((n,)), jnp.zeros((n,))], -1)
        scene = (
            means, jnp.full((n,), 0.95), jnp.full((n, 3), 0.5),
            jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            jax.random.uniform(jax.random.PRNGKey(8), (n, 3)),
        )
        out = rasterize(*scene, cam, CFG_PALLAS)
        assert int(out.n_grad_truncated) == 0  # unbounded: always 0
        # tile counts are 64 here, so 64 slots always cover the deepest
        # contributor (tail pixels blend every slot without saturating)
        cfg_b = CFG_PALLAS.replace(grad_capacity=64)
        out_b = rasterize(*scene, cam, cfg_b)
        assert int(out_b.n_grad_truncated) == 0
        g_full = self._grads(cam, scene, CFG_PALLAS)
        g_bounded = self._grads(cam, scene, cfg_b)
        for gf, gb in zip(g_full, g_bounded):
            np.testing.assert_array_equal(np.asarray(gf), np.asarray(gb))

    def test_truncation_is_counted(self):
        # translucent stack deeper than the budget: must be reported
        cam, scene = small_setup(seed=9, n=96)
        cfg_b = CFG_PALLAS.replace(grad_capacity=16)
        out_b = rasterize(*scene, cam, cfg_b)
        out_full = rasterize(*scene, cam, CFG_PALLAS)
        assert int(out_full.n_grad_truncated) == 0
        assert int(out_b.n_grad_truncated) > 0

    def test_grad_budget_compacted_matches_dense(self):
        # budget covering sum(k_hi): identical grads to the dense scatter
        cam, scene = small_setup(seed=11, n=96)
        g_dense = self._grads(cam, scene, CFG_PALLAS)
        cfg_b = CFG_PALLAS.replace(grad_budget=4096)
        out = rasterize(*scene, cam, cfg_b)
        assert int(out.n_grad_truncated) == 0
        g_budget = self._grads(cam, scene, cfg_b)
        for gd, gb in zip(g_dense, g_budget):
            np.testing.assert_allclose(np.asarray(gd), np.asarray(gb),
                                       rtol=1e-6, atol=1e-7)

    def test_grad_budget_overflow_is_counted(self):
        cam, scene = small_setup(seed=12, n=96)
        cfg_b = CFG_PALLAS.replace(grad_budget=16)
        out = rasterize(*scene, cam, cfg_b)
        assert int(out.n_grad_truncated) > 0
        # a budget that is not a page multiple only enumerates whole
        # pages: floor(24/16)*16 == 16, so the counters must agree
        out24 = rasterize(*scene, cam, CFG_PALLAS.replace(grad_budget=24))
        assert int(out24.n_grad_truncated) == int(out.n_grad_truncated)
