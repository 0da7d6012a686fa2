# -*- coding: utf-8 -*-
"""Mesh-sharded rasterizer vs the single-device pipeline on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import rasterize
from gaussiancity_tpu.parallel.sharded_raster import make_sharded_rasterizer

from test_rasterizer import make_camera, make_scene

CFG = RasterizerConfig(tile_h=8, tile_w=128, max_tiles_per_gaussian=64,
                       tile_capacity=256, backend="xla")


class TestShardedRasterizer:
    def test_matches_single_device(self):
        n_dev = len(jax.devices())
        mesh = jax.make_mesh((n_dev,), ("tile",))
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(0), n=512)
        valid = jnp.ones((512,), bool)
        bg = jnp.array([0.1, 0.2, 0.3])

        ref = rasterize(*scene, cam, CFG, bg=bg).image

        fn = jax.jit(make_sharded_rasterizer(mesh, cam, CFG))
        img = fn(*scene, valid, bg)
        assert img.shape == ref.shape
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    def test_gradients_flow_to_shards(self):
        n_dev = len(jax.devices())
        mesh = jax.make_mesh((n_dev,), ("tile",))
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(1), n=256)
        valid = jnp.ones((256,), bool)
        bg = jnp.zeros(3)
        fn = make_sharded_rasterizer(mesh, cam, CFG)

        def loss_sharded(*s):
            return jnp.sum(fn(*s, valid, bg) ** 2)

        def loss_single(*s):
            return jnp.sum(rasterize(*s, cam, CFG).image ** 2)

        g_sh = jax.jit(
            jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4)))(*scene)
        g_si = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*scene)
        for name, a, b in zip("means op sc qu co".split(), g_sh, g_si):
            scale = max(float(jnp.abs(b).max()), 1e-8)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
                err_msg=f"sharded grad mismatch: {name}")
