# -*- coding: utf-8 -*-
"""Rasterizer correctness: tiled pipeline vs naive oracle, gradients of the
custom VJP vs autodiff of the oracle, camera conventions vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiancity_tpu.camera import CameraModel, quat_xyzw_to_matrix, world_to_camera
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import rasterize
from gaussiancity_tpu.ops.rasterizer.naive import naive_render


def make_camera(W=256, H=64, f=100.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float64)
    cam_model = CameraModel(K, (W, H))
    # Identity quaternion: camera at origin looking along +x (reference
    # convention: look dir = R[:, 0] before the [F|R|U]->[R|U|F] swap).
    return cam_model.params(np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))


def make_scene(key, n=256, depth_range=(4.0, 40.0), opacity_max=0.9):
    ks = jax.random.split(key, 5)
    depth = jax.random.uniform(ks[0], (n,), minval=depth_range[0],
                               maxval=depth_range[1])
    # Points ahead of the camera (+x), spread to cover the frustum.
    y = jax.random.uniform(ks[1], (n,), minval=-1.2, maxval=1.2) * depth
    z = jax.random.uniform(ks[2], (n,), minval=-0.4, maxval=0.4) * depth
    means = jnp.stack([depth, y, z], axis=-1)
    scales = jax.random.uniform(ks[3], (n, 3), minval=0.05, maxval=0.6)
    quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    colors = jax.random.uniform(ks[4], (n, 3))
    opacity = jax.random.uniform(ks[0], (n,), minval=0.1, maxval=opacity_max)
    return means, opacity, scales, quats, colors


CFG = RasterizerConfig(tile_h=8, tile_w=128, max_tiles_per_gaussian=64,
                       tile_capacity=512)


class TestCameraConventions:
    def test_quat_matches_scipy(self):
        import scipy.spatial.transform as sst

        rng = np.random.default_rng(0)
        for _ in range(10):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            got = quat_xyzw_to_matrix(q)
            want = sst.Rotation.from_quat(q).as_matrix()
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_w2c_matches_reference_construction(self):
        import scipy.spatial.transform as sst

        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        pos = rng.normal(size=3) * 10
        got = world_to_camera(pos, q)
        R = sst.Rotation.from_quat(q).as_matrix()[:, [1, 2, 0]]
        want = np.zeros((4, 4), dtype=np.float32)
        want[:3, :3] = R.T
        want[:3, 3] = -R.T @ pos
        want[3, 3] = 1.0
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_traced_w2c_matches_host(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        pos = rng.normal(size=3) * 5
        host = world_to_camera(pos, q)
        traced = world_to_camera(jnp.asarray(pos, jnp.float32),
                                 jnp.asarray(q, jnp.float32), xp=jnp)
        np.testing.assert_allclose(host, np.asarray(traced), atol=1e-5)


class TestForwardParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tiled_matches_naive(self, seed):
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(seed))
        out = rasterize(*scene, cam, CFG)
        ref_img, ref_T = naive_render(*scene, cam, CFG)
        assert int(out.n_dropped_pairs) == 0
        assert int(out.n_truncated) == 0
        np.testing.assert_allclose(out.image, ref_img, atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(out.final_T, ref_T, atol=3e-5, rtol=1e-4)

    def test_with_background(self):
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(3), n=64)
        bg = jnp.array([0.2, 0.4, 0.8])
        out = rasterize(*scene, cam, CFG, bg=bg)
        ref_img, _ = naive_render(*scene, cam, CFG, bg=bg)
        np.testing.assert_allclose(out.image, ref_img, atol=3e-5, rtol=1e-4)

    def test_empty_scene_is_background(self):
        cam = make_camera()
        n = 16
        means = jnp.zeros((n, 3))
        out = rasterize(
            means,
            jnp.ones((n,)),
            jnp.ones((n, 3)),
            jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
            jnp.ones((n, 3)),
            cam,
            CFG,
            valid=jnp.zeros((n,), dtype=bool),
            bg=jnp.array([0.1, 0.2, 0.3]),
        )
        want = np.broadcast_to(
            np.array([0.1, 0.2, 0.3])[:, None, None], out.image.shape
        )
        np.testing.assert_allclose(out.image, want, atol=1e-6)

    def test_saturated_pixels_terminate(self):
        # Stack many near-opaque Gaussians at the same spot: transmittance
        # must drop below 1e-4 and terminate exactly like the oracle.
        cam = make_camera()
        n = 64
        means = jnp.tile(jnp.array([10.0, 0.0, 0.0]), (n, 1))
        scales = jnp.full((n, 3), 0.5)
        quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
        colors = jnp.linspace(0.0, 1.0, n)[:, None] * jnp.ones((n, 3))
        opacity = jnp.full((n,), 0.9)
        out = rasterize(means, opacity, scales, quats, colors, cam, CFG)
        ref_img, ref_T = naive_render(means, opacity, scales, quats, colors,
                                      cam, CFG)
        np.testing.assert_allclose(out.image, ref_img, atol=3e-5, rtol=1e-4)
        assert float(out.final_T.min()) < 1e-4 + 1e-6


class TestGradients:
    def test_grads_match_naive_autodiff(self):
        cam = make_camera(W=128, H=32)
        scene = make_scene(jax.random.PRNGKey(7), n=96, opacity_max=0.8)
        key = jax.random.PRNGKey(11)
        target = jax.random.uniform(key, (3, 32, 128))
        wgt = jax.random.normal(jax.random.PRNGKey(12), (3, 32, 128))

        def loss_tiled(means, op, sc, qu, co):
            out = rasterize(means, op, sc, qu, co, cam, CFG)
            return jnp.sum((out.image - target) * wgt)

        def loss_naive(means, op, sc, qu, co):
            img, _ = naive_render(means, op, sc, qu, co, cam, CFG)
            return jnp.sum((img - target) * wgt)

        g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*scene)
        g_naive = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*scene)
        names = ["means", "opacity", "scales", "quats", "colors"]
        for name, gt, gn in zip(names, g_tiled, g_naive):
            scale = np.maximum(np.abs(np.asarray(gn)).max(), 1e-8)
            np.testing.assert_allclose(
                np.asarray(gt) / scale, np.asarray(gn) / scale,
                atol=5e-4, err_msg=f"grad mismatch for {name}",
            )

    def test_grad_nonzero_and_finite(self):
        cam = make_camera(W=128, H=32)
        scene = make_scene(jax.random.PRNGKey(5), n=64)

        def loss(means, op, sc, qu, co):
            out = rasterize(means, op, sc, qu, co, cam, CFG)
            return jnp.sum(out.image ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*scene)
        total = 0.0
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
            total += float(jnp.sum(jnp.abs(g)))
        assert total > 0.0

    def test_background_gradient(self):
        cam = make_camera(W=128, H=32)
        scene = make_scene(jax.random.PRNGKey(6), n=32)

        def loss(bg):
            out = rasterize(*scene, cam, CFG, bg=bg)
            return jnp.sum(out.image)

        g = jax.grad(loss)(jnp.zeros(3))
        # dL/dbg = sum of final_T over pixels for each channel
        out = rasterize(*scene, cam, CFG)
        want = float(jnp.sum(out.final_T))
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4)


class TestJit:
    def test_jit_compiles_and_matches(self):
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(9), n=128)

        f = jax.jit(lambda *s: rasterize(*s, cam, CFG).image)
        np.testing.assert_allclose(
            f(*scene), rasterize(*scene, cam, CFG).image, atol=1e-5
        )


class TestRefGate:
    """With ref_tile16_gate on, the observable rect test happens at the
    reference's 16x16 block grid (config.h:15), so the render must be
    INDEPENDENT of this repo's own compute-tile shape (and equal to the
    16x16-gated naive oracle, covered by TestForwardParity)."""

    def test_gate_render_is_tile_shape_independent(self):
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(7), n=512)
        outs = {}
        for th, tw in ((8, 128), (32, 32), (16, 64)):
            for backend in ("xla", "pallas"):
                cfg = RasterizerConfig(
                    tile_h=th, tile_w=tw, max_tiles_per_gaussian=64,
                    tile_capacity=512, backend=backend,
                    ref_tile16_gate=True)
                out = rasterize(*scene, cam, cfg)
                assert int(out.n_dropped_pairs) == 0
                assert int(out.n_truncated) == 0
                outs[(th, tw, backend)] = np.asarray(out.image)
        ref = outs[(8, 128, "xla")]
        for key, img in outs.items():
            np.testing.assert_allclose(img, ref, atol=3e-6, rtol=1e-5,
                                       err_msg=str(key))

    def test_gate_windowed_unaligned_origin(self):
        # window origins that are NOT multiples of 16 make compute tiles
        # straddle 16x16 block rows/cols (an 8-row tile at y0 = 12
        # touches two block rows) — the gate bitmask must enumerate the
        # straddle block (blend_pallas._stamp_gate_mask nbx/nby) and the
        # windowed render must still equal the full render's crop
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(3), n=512)
        x0, y0, Wc, Hc = 92, 12, 128, 32
        for th, tw in ((8, 128), (32, 32)):
            for backend in ("xla", "pallas"):
                cfg = RasterizerConfig(
                    tile_h=th, tile_w=tw, max_tiles_per_gaussian=64,
                    tile_capacity=512, backend=backend,
                    ref_tile16_gate=True)
                full = rasterize(*scene, cam, cfg)
                win = rasterize(*scene, cam, cfg,
                                window=(jnp.int32(x0), jnp.int32(y0),
                                        Wc, Hc))
                np.testing.assert_allclose(
                    np.asarray(win.image),
                    np.asarray(full.image[:, y0:y0 + Hc, x0:x0 + Wc]),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"{(th, tw, backend)}")

    def test_gate_off_depends_on_tile_shape(self):
        # the converse: without the gate the tile-rect fringe is
        # observable (documents WHY the gate exists)
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(7), n=512)
        imgs = []
        for th, tw in ((8, 128), (32, 32)):
            cfg = RasterizerConfig(
                tile_h=th, tile_w=tw, max_tiles_per_gaussian=64,
                tile_capacity=512, backend="xla", ref_tile16_gate=False)
            imgs.append(np.asarray(rasterize(*scene, cam, cfg).image))
        assert np.abs(imgs[0] - imgs[1]).max() > 1e-4


class TestWindowedRender:
    """window=(x0, y0, Wc, Hc) must reproduce the corresponding crop of
    the full-sensor render — values and gradients (the reference crops
    after rendering the full sensor, utils/helpers.py:250-270)."""

    def test_window_equals_full_crop(self):
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(3), n=512)
        full = rasterize(*scene, cam, CFG)
        x0, y0, Wc, Hc = 96, 16, 128, 32
        win = rasterize(*scene, cam, CFG,
                        window=(jnp.int32(x0), jnp.int32(y0), Wc, Hc))
        np.testing.assert_allclose(
            np.asarray(win.image),
            np.asarray(full.image[:, y0:y0 + Hc, x0:x0 + Wc]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(win.final_T),
            np.asarray(full.final_T[y0:y0 + Hc, x0:x0 + Wc]),
            rtol=1e-5, atol=1e-5)

    def test_window_grads_match_full_crop(self):
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(4), n=256)
        x0, y0, Wc, Hc = 64, 24, 128, 32

        def loss_full(*s):
            img = rasterize(*s, cam, CFG).image
            return jnp.sum(img[:, y0:y0 + Hc, x0:x0 + Wc] ** 2)

        def loss_win(*s):
            img = rasterize(*s, cam, CFG,
                            window=(x0, y0, Wc, Hc)).image
            return jnp.sum(img ** 2)

        gf = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(*scene)
        gw = jax.grad(loss_win, argnums=(0, 1, 2, 3, 4))(*scene)
        for a, b in zip(gw, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_traced_window_origin_under_jit(self):
        cam = make_camera(W=256, H=64)
        scene = make_scene(jax.random.PRNGKey(5), n=128)
        Wc, Hc = 128, 32

        @jax.jit
        def render_at(x0, y0):
            return rasterize(*scene, cam, CFG,
                             window=(x0, y0, Wc, Hc)).image

        full = rasterize(*scene, cam, CFG).image
        for x0, y0 in ((0, 0), (128, 32), (40, 8)):
            got = render_at(jnp.int32(x0), jnp.int32(y0))
            np.testing.assert_allclose(
                np.asarray(got),
                np.asarray(full[:, y0:y0 + Hc, x0:x0 + Wc]),
                rtol=1e-5, atol=1e-5)


class TestTieredBinning:
    """Tiered duplication (binning.py module doc): ranked-area tiers must
    reproduce one giant uncapped expansion exactly — the reference has no
    per-Gaussian tile cap (rasterizer_impl.cu:64-99)."""

    def _prep(self, seed, n=512):
        from gaussiancity_tpu.ops.rasterizer import preprocess

        cam = make_camera()
        # depth range down to 1.5 creates whales spanning many tiles
        scene = make_scene(jax.random.PRNGKey(seed), n=n,
                           depth_range=(1.5, 40.0))
        means, op, sc, qu, co = scene
        return preprocess.preprocess(
            means, op, sc, qu, co, jnp.ones((n,), bool), cam), cam

    def test_tiers_match_uncapped_expansion(self):
        from gaussiancity_tpu.ops.rasterizer import binning

        prep, cam = self._prep(0)
        H, W = cam.img_h, cam.img_w
        n_ty, n_tx = binning.tile_grid(H, W, 8, 128)
        ref = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=n_ty * n_tx,
            tile_capacity=512)
        assert int(ref.n_dropped_pairs) == 0
        got = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=3,
            tile_capacity=512, tiers=((256, 6), (64, 10), (16, 0)))
        assert int(got.n_dropped_pairs) == 0
        np.testing.assert_array_equal(np.asarray(got.counts),
                                      np.asarray(ref.counts))
        np.testing.assert_array_equal(np.asarray(got.gauss_index),
                                      np.asarray(ref.gauss_index))

    def test_visible_cap_matches_dense_expansion(self):
        """visible_cap covering every nonzero-area Gaussian must be exact
        (identical TileBins to the dense main pass), with or without
        tiers, and must count drops when it is too small."""
        from gaussiancity_tpu.ops.rasterizer import binning

        prep, cam = self._prep(0)
        H, W = cam.img_h, cam.img_w
        n_vis = int(np.count_nonzero(np.asarray(binning.compute_rects_c(
            prep.mx, prep.my, prep.radius, prep.valid, H, W, 8, 128)[4])))
        ref = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=3,
            tile_capacity=512, tiers=((256, 6), (64, 10), (16, 0)))
        for tiers in (((256, 6), (64, 10), (16, 0)), ()):
            got = binning.bin_gaussians(
                prep, H, W, 8, 128, max_tiles_per_gaussian=3,
                tile_capacity=512, tiers=tiers, visible_cap=n_vis + 3)
            if tiers:
                assert (int(got.n_dropped_pairs)
                        == int(ref.n_dropped_pairs))
                np.testing.assert_array_equal(np.asarray(got.counts),
                                              np.asarray(ref.counts))
                np.testing.assert_array_equal(np.asarray(got.gauss_index),
                                              np.asarray(ref.gauss_index))
        # a cap below the visible count must report the dropped areas
        small = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=3,
            tile_capacity=512, visible_cap=max(n_vis // 2, 1))
        dense = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=3,
            tile_capacity=512)
        assert (int(small.n_dropped_pairs) > int(dense.n_dropped_pairs))
        assert (int(small.n_dropped_pairs) - int(dense.n_dropped_pairs)
                == int(dense.counts.sum()) - int(small.counts.sum()))

    def test_tier_overflow_is_counted(self):
        from gaussiancity_tpu.ops.rasterizer import binning

        prep, cam = self._prep(1)
        H, W = cam.img_h, cam.img_w
        uncapped = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=512,
            tile_capacity=512)
        # tiny caps everywhere -> must drop and say so
        got = binning.bin_gaussians(
            prep, H, W, 8, 128, max_tiles_per_gaussian=1,
            tile_capacity=512, tiers=((8, 2),))
        n_full = int(uncapped.counts.sum())
        assert int(got.n_dropped_pairs) == n_full - int(got.counts.sum())
        assert int(got.n_dropped_pairs) > 0

    def test_normalize_tiers(self):
        from gaussiancity_tpu.ops.rasterizer.binning import normalize_tiers

        # clips counts to N, caps to grid, dedupes, drops subsumed tiers
        # both big tiers clip to count 256 and merge, keeping the wider cap
        assert normalize_tiers(((16384, 16), (4096, 48), (128, 0)),
                               N=256, num_tiles=80) == ((256, 48), (128, 80))
        assert normalize_tiers((), N=256, num_tiles=80) == ()
        # equal counts keep the larger cap
        assert normalize_tiers(((64, 8), (64, 24)), N=256,
                               num_tiles=80) == ((64, 24),)

    def test_default_config_zero_drops_in_rasterize(self):
        cam = make_camera()
        scene = make_scene(jax.random.PRNGKey(2), n=512,
                           depth_range=(1.5, 40.0))
        cfg = RasterizerConfig(tile_capacity=512, max_tiles_per_gaussian=4)
        out = rasterize(*scene, cam, cfg)
        assert int(out.n_dropped_pairs) == 0
