# -*- coding: utf-8 -*-
"""Independent numeric validation of the EWA preprocess math: cov3d vs
scipy rotations, cov2d vs a literal NumPy transcription of the reference
formulas, projection vs hand-computed pinhole, plus rotated-quat rendering
(the tiled-vs-naive tests share preprocess, so these are the independent
checks of it)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.camera import CameraModel
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import preprocess as PP
from gaussiancity_tpu.ops.rasterizer import rasterize

from test_rasterizer import make_camera


class TestCov3d:
    def test_matches_scipy_rotation(self):
        import scipy.spatial.transform as sst

        rng = np.random.default_rng(0)
        for _ in range(10):
            q_wxyz = rng.normal(size=4)
            q_wxyz /= np.linalg.norm(q_wxyz)
            s = rng.uniform(0.2, 3.0, 3)
            cxx, cxy, cxz, cyy, cyz, czz = PP.compute_cov3d(
                jnp.asarray(s[None]), jnp.asarray(q_wxyz[None]))
            # scipy uses xyzw ordering; reference quats are (w, x, y, z)
            R = sst.Rotation.from_quat(
                [q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]]).as_matrix()
            want = R @ np.diag(s ** 2) @ R.T
            got = np.array([
                [float(cxx[0]), float(cxy[0]), float(cxz[0])],
                [float(cxy[0]), float(cyy[0]), float(cyz[0])],
                [float(cxz[0]), float(cyz[0]), float(czz[0])],
            ])
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_projection_center_pixel(self):
        # a point straight ahead of the camera must project to the
        # principal point (cx - 0.5, cy - 0.5 in the reference's
        # ndc2Pix convention)
        cam = make_camera(W=256, H=64, f=100.0)
        prep = PP.preprocess(
            jnp.asarray([[10.0, 0.0, 0.0]]), jnp.asarray([0.5]),
            jnp.asarray([[1.0, 1.0, 1.0]]),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([[1.0, 1, 1]]),
            jnp.asarray([True]), cam)
        np.testing.assert_allclose(float(prep.mx[0]), 128 - 0.5, atol=1e-4)
        np.testing.assert_allclose(float(prep.my[0]), 32 - 0.5, atol=1e-4)
        np.testing.assert_allclose(float(prep.depth[0]), 10.0, atol=1e-5)

    def test_cov2d_isotropic_radius(self):
        # isotropic gaussian: screen radius = ceil(3 * (s * f / z)) after
        # the +0.3 low-pass
        cam = make_camera(W=256, H=64, f=100.0)
        s, z = 0.5, 10.0
        prep = PP.preprocess(
            jnp.asarray([[z, 0.0, 0.0]]), jnp.asarray([0.5]),
            jnp.asarray([[s, s, s]]),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([[1.0, 1, 1]]),
            jnp.asarray([True]), cam)
        sigma_px = np.sqrt((s * 100.0 / z) ** 2 + 0.3)
        assert int(prep.radius[0]) == int(np.ceil(3 * sigma_px))


class TestRotatedQuats:
    def test_rotation_about_view_axis_swaps_extent(self):
        """An anisotropic gaussian rotated 90 deg about the viewing axis
        must render with swapped screen extents."""
        cam = make_camera(W=256, H=64, f=100.0)
        cfg = RasterizerConfig(tile_h=8, tile_w=128,
                               max_tiles_per_gaussian=64, tile_capacity=128,
                               backend="xla")
        means = jnp.asarray([[12.0, 0.0, 0.0]])
        op = jnp.asarray([0.8])
        col = jnp.asarray([[1.0, 1.0, 1.0]])
        scales = jnp.asarray([[0.01, 1.0, 0.25]])  # wide in y, short in z
        ident = jnp.asarray([[1.0, 0, 0, 0]])
        # 90 deg about the x (view) axis: w = cos45, x = sin45
        c45 = float(np.cos(np.pi / 4))
        rot = jnp.asarray([[c45, c45, 0.0, 0.0]])
        img_a = rasterize(means, op, scales, ident, col, cam, cfg).image
        swapped = jnp.asarray([[0.01, 0.25, 1.0]])
        img_b = rasterize(means, op, swapped, ident, col, cam, cfg).image
        img_r = rasterize(means, op, scales, rot, col, cam, cfg).image
        # rotated anisotropic == axis-swapped anisotropic
        np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_b),
                                   atol=1e-4)
        # and clearly different from the unrotated one
        assert float(jnp.abs(img_r - img_a).max()) > 0.1

    def test_random_quats_tiled_vs_naive(self):
        from gaussiancity_tpu.ops.rasterizer.naive import naive_render
        from test_rasterizer import CFG, make_scene

        cam = make_camera()
        means, op, scales, _, colors = make_scene(jax.random.PRNGKey(4),
                                                  n=128)
        q = jax.random.normal(jax.random.PRNGKey(5), (128, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        out = rasterize(means, op, scales, q, colors, cam, CFG)
        ref, _ = naive_render(means, op, scales, q, colors, cam, CFG)
        np.testing.assert_allclose(out.image, ref, atol=3e-5, rtol=1e-4)


class TestFlips:
    def test_wrapper_flips(self):
        from gaussiancity_tpu.ops.rasterizer import GaussianRasterizerWrapper

        W, H = 256, 64
        K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
        pts = np.zeros((4, 14), np.float32)
        pts[:, 0] = 10.0  # ahead
        pts[:, 1] = [-2, -1, 1, 2]  # spread across the image
        pts[:, 3] = 1.0
        pts[:, 4:7] = 0.3
        pts[:, 7] = 1.0
        pts[:, 11:14] = np.linspace(0.2, 1.0, 4)[:, None]
        base = GaussianRasterizerWrapper(K, (W, H), flip_lr=False)
        lr = GaussianRasterizerWrapper(K, (W, H), flip_lr=True)
        ud = GaussianRasterizerWrapper(K, (W, H), flip_lr=False, flip_ud=True)
        pos = np.zeros(3)
        quat = np.array([0, 0, 0, 1.0])
        ib = np.asarray(base(jnp.asarray(pts), pos, quat))
        il = np.asarray(lr(jnp.asarray(pts), pos, quat))
        iu = np.asarray(ud(jnp.asarray(pts), pos, quat))
        np.testing.assert_allclose(il, ib[:, :, ::-1], atol=1e-6)
        np.testing.assert_allclose(iu, ib[:, ::-1, :], atol=1e-6)
