# -*- coding: utf-8 -*-
"""Spherical-harmonics color evaluation (reference: forward.cu:20-66,
backward.cu:375-425)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiancity_tpu.ops.rasterizer import eval_sh_colors, num_sh_coeffs


def sh_oracle(shs, means, campos, deg):
    """Scalar per-point oracle following the CUDA kernel line by line."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    out = np.zeros((len(means), 3), np.float64)
    for i, (m, sh) in enumerate(zip(means, shs)):
        d = m - campos
        d = d / np.linalg.norm(d)
        x, y, z = d
        r = C0 * sh[0]
        if deg > 0:
            r = r - C1 * y * sh[1] + C1 * z * sh[2] - C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            r = (r + C2[0] * xy * sh[4] + C2[1] * yz * sh[5]
                 + C2[2] * (2 * zz - xx - yy) * sh[6]
                 + C2[3] * xz * sh[7] + C2[4] * (xx - yy) * sh[8])
        if deg > 2:
            r = (r + C3[0] * y * (3 * xx - yy) * sh[9]
                 + C3[1] * xy * z * sh[10]
                 + C3[2] * y * (4 * zz - xx - yy) * sh[11]
                 + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                 + C3[4] * x * (4 * zz - xx - yy) * sh[13]
                 + C3[5] * z * (xx - yy) * sh[14]
                 + C3[6] * x * (xx - 3 * yy) * sh[15])
        out[i] = np.maximum(r + 0.5, 0.0)
    return out


class TestEvalSH:
    @pytest.mark.parametrize("deg", [0, 1, 2, 3])
    def test_matches_oracle(self, deg):
        rng = np.random.default_rng(deg)
        N, M = 64, num_sh_coeffs(deg)
        shs = rng.standard_normal((N, M, 3)).astype(np.float32)
        means = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
        campos = np.array([1.0, -2.0, 3.0], np.float32)
        got = eval_sh_colors(jnp.asarray(shs), jnp.asarray(means),
                             jnp.asarray(campos), deg)
        want = sh_oracle(shs, means, campos, deg)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_deg0_view_independent(self):
        shs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, 1, 3)).astype(np.float32))
        means_a = jnp.asarray(np.random.default_rng(1).uniform(
            -5, 5, (8, 3)).astype(np.float32))
        means_b = means_a * 3.0 + 1.0
        campos = jnp.zeros(3)
        a = eval_sh_colors(shs, means_a, campos, 0)
        b = eval_sh_colors(shs, means_b, campos, 0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_clamp_gates_gradient(self):
        # channel pushed below zero gets zero gradient; positive passes
        shs = jnp.asarray([[[-10.0, 0.5, 0.0]]])  # deg 0: pre = C0*sh + .5
        means = jnp.asarray([[1.0, 0.0, 0.0]])
        campos = jnp.zeros(3)
        g = jax.grad(
            lambda s: eval_sh_colors(s, means, campos, 0).sum())(shs)
        g = np.asarray(g)[0, 0]
        assert g[0] == 0.0  # clamped channel
        assert g[1] > 0.0  # active channel
        # barely-positive pre passes gradient (the gate is `< 0`,
        # matching the reference's `clamped` flag, forward.cu:62-64)
        sh0 = np.float32(-0.5 / 0.28209479177387814) + 1e-5
        shs_pos = jnp.asarray([[[sh0, sh0, sh0]]])
        gz = jax.grad(
            lambda s: eval_sh_colors(s, means, campos, 0).sum())(shs_pos)
        assert (np.asarray(gz) > 0).all()

    def test_too_few_coeffs_raises(self):
        with pytest.raises(ValueError):
            eval_sh_colors(jnp.zeros((4, 4, 3)), jnp.zeros((4, 3)),
                           jnp.zeros(3), 2)

    def test_rasterize_shs_equals_precomputed(self):
        from gaussiancity_tpu.camera import CameraModel
        from gaussiancity_tpu.config import RasterizerConfig
        from gaussiancity_tpu.ops.rasterizer import rasterize

        rng = np.random.default_rng(0)
        N, deg = 128, 2
        W, H = 128, 32
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
        cam = CameraModel(K, (W, H)).params(
            np.zeros(3), np.array([0, 0, 0, 1.0]))
        depth = rng.uniform(3, 30, N).astype(np.float32)
        means = np.stack([depth, rng.uniform(-1, 1, N) * depth,
                          rng.uniform(-0.3, 0.3, N) * depth], 1
                         ).astype(np.float32)
        scales = rng.uniform(0.1, 0.5, (N, 3)).astype(np.float32)
        quats = np.tile([1, 0, 0, 0], (N, 1)).astype(np.float32)
        opac = rng.uniform(0.3, 0.9, N).astype(np.float32)
        shs = rng.standard_normal(
            (N, num_sh_coeffs(deg), 3)).astype(np.float32) * 0.3
        cfg = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=16)
        args = tuple(map(jnp.asarray, (means, opac, scales, quats)))
        out_sh = rasterize(*args, None, cam, cfg,
                           shs=jnp.asarray(shs), sh_degree=deg)
        colors = eval_sh_colors(jnp.asarray(shs), args[0], cam.cam_pos, deg)
        out_pre = rasterize(*args, colors, cam, cfg)
        np.testing.assert_allclose(np.asarray(out_sh.image),
                                   np.asarray(out_pre.image), atol=1e-6)

        # both-or-neither contract
        with pytest.raises(ValueError):
            rasterize(*args, colors, cam, cfg,
                      shs=jnp.asarray(shs), sh_degree=deg)
        with pytest.raises(ValueError):
            rasterize(*args, None, cam, cfg)

    def test_grads_flow_through_shs(self):
        from gaussiancity_tpu.camera import CameraModel
        from gaussiancity_tpu.config import RasterizerConfig
        from gaussiancity_tpu.ops.rasterizer import rasterize

        rng = np.random.default_rng(1)
        N, deg = 32, 1
        W, H = 128, 32
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
        cam = CameraModel(K, (W, H)).params(
            np.zeros(3), np.array([0, 0, 0, 1.0]))
        depth = rng.uniform(3, 20, N).astype(np.float32)
        means = np.stack([depth, rng.uniform(-1, 1, N) * depth,
                          rng.uniform(-0.3, 0.3, N) * depth], 1
                         ).astype(np.float32)
        cfg = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=16)

        def loss(shs, means):
            out = rasterize(
                jnp.asarray(means),
                jnp.full((N,), 0.8), jnp.full((N, 3), 0.3),
                jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1)),
                None, cam, cfg, shs=shs, sh_degree=deg)
            return jnp.sum(out.image ** 2)

        shs = jnp.asarray(rng.standard_normal(
            (N, num_sh_coeffs(deg), 3)).astype(np.float32) * 0.3)
        g_sh, g_m = jax.grad(loss, argnums=(0, 1))(shs, jnp.asarray(means))
        assert bool(jnp.all(jnp.isfinite(g_sh)))
        assert float(jnp.abs(g_sh).sum()) > 0
        # view-dir chain: means gradient includes the SH direction term
        assert bool(jnp.all(jnp.isfinite(g_m)))
