# -*- coding: utf-8 -*-
"""Model-stack tests: generator variants, discriminator, losses, hash grid."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import GaussianNetworkConfig, PTv3Config
from gaussiancity_tpu.losses import gan_loss, masked_l1
from gaussiancity_tpu.losses.perceptual import PerceptualLoss
from gaussiancity_tpu.models import Discriminator, Generator
from gaussiancity_tpu.ops.hash_grid import GridEncoder, hash_encode, level_params
from gaussiancity_tpu.utils import helpers


def rest_net_cfg():
    return GaussianNetworkConfig(
        scale_factor=0.5, encoder="GLOBAL", encoder_out_dim=5,
        pos_emd="HASH_GRID", hash_grid_n_levels=4, hash_grid_level_dim=4,
        hash_grid_map_size=12, z_dim=None, mlp_hidden_dim=64,
        ptv3=PTv3Config(enabled=False),
    )


def bldg_net_cfg():
    return GaussianNetworkConfig(
        scale_factor=0.65, encoder=None, encoder_out_dim=3,
        pos_emd="SIN_COS", sin_cos_freq_bends=4, z_dim=32, mlp_hidden_dim=64,
        ptv3=PTv3Config(enabled=False),
    )


class TestHashGrid:
    def test_level_params_match_reference_scheme(self):
        pls, offsets, res, hashed, total = level_params(3, 16, 16, 2048, 19)
        assert len(offsets) == 16
        assert res[0] == 16
        assert res[-1] == 2048
        # low-res levels dense, high-res hashed
        assert not hashed[0]
        assert hashed[-1]
        assert total == offsets[-1] + min(2 ** 19, (res[-1] + 1) ** 3 + 7) // 8 * 8 \
            or total > offsets[-1]

    def test_encode_shapes_and_oob(self):
        enc = GridEncoder(in_channels=3, n_levels=4, lvl_channels=2,
                          desired_resolution=128, log2_hashmap_size=10)
        x = jnp.array([[0.0, 0.0, 0.0], [0.5, -0.5, 0.25], [2.0, 0.0, 0.0]])
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (3, 8)
        # out-of-bound input -> zeros (reference: grid_encoder_ext.cu:113-139)
        np.testing.assert_allclose(y[2], 0.0)
        assert float(jnp.abs(y[:2]).sum()) > 0.0

    def test_interpolation_is_continuous(self):
        # moving the query point by eps changes output by O(eps)
        enc = GridEncoder(in_channels=2, n_levels=2, lvl_channels=2,
                          desired_resolution=64, log2_hashmap_size=8)
        x0 = jnp.array([[0.3, -0.2]])
        params = enc.init(jax.random.PRNGKey(1), x0)
        y0 = enc.apply(params, x0)
        y1 = enc.apply(params, x0 + 1e-5)
        assert float(jnp.abs(y1 - y0).max()) < 1e-5

    def test_grad_flows_to_embeddings(self):
        enc = GridEncoder(in_channels=2, n_levels=2, lvl_channels=2,
                          desired_resolution=64, log2_hashmap_size=8)
        x = jax.random.uniform(jax.random.PRNGKey(2), (16, 2), minval=-1,
                               maxval=1)
        params = enc.init(jax.random.PRNGKey(3), x)
        g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
        gsum = float(jnp.abs(g["params"]["embeddings"]).sum())
        assert gsum > 0.0


class TestGenerator:
    def test_rest_generator_forward(self):
        cfg = rest_net_cfg()
        B, N, n_classes, P = 1, 64, 8, 32
        gen = Generator(cfg=cfg, n_classes=n_classes, proj_size=P)
        rng = jax.random.PRNGKey(0)
        proj_uv = jax.random.uniform(rng, (B, N, 2), minval=-1, maxval=1)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(
            jnp.zeros((B, N), dtype=jnp.int32), n_classes)
        proj_hf = jnp.zeros((B, P, P, 1))
        proj_seg = jnp.zeros((B, P, P, n_classes))
        params = gen.init(rng, proj_uv, rel_xyz, None, onehots, None,
                          proj_hf, proj_seg)
        out = gen.apply(params, proj_uv, rel_xyz, None, onehots, None,
                        proj_hf, proj_seg)
        assert set(out.keys()) == {"rgb"}
        assert out["rgb"].shape == (B, N, 3)
        # rgb squashing: (sigmoid - .5) * 2 in (-1, 1)
        assert float(out["rgb"].max()) < 1.0
        assert float(out["rgb"].min()) > -1.0

    def test_bldg_generator_forward_with_z(self):
        cfg = bldg_net_cfg()
        B, N, n_classes = 1, 64, 8
        gen = Generator(cfg=cfg, n_classes=n_classes, proj_size=32)
        rng = jax.random.PRNGKey(0)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(
            jnp.full((B, N), 2, dtype=jnp.int32), n_classes)
        instances = jnp.concatenate(
            [jnp.full((B, N // 2), 100), jnp.full((B, N // 2), 102)], axis=1)
        z = helpers.get_z(jax.random.PRNGKey(7), instances, cfg.z_dim)
        assert z.shape == (B, N, cfg.z_dim)
        # same instance id -> same z
        np.testing.assert_allclose(z[0, 0], z[0, 1])
        assert float(jnp.abs(z[0, 0] - z[0, -1]).max()) > 0.0
        params = gen.init(rng, None, rel_xyz, None, onehots, z, None, None)
        out = gen.apply(params, None, rel_xyz, None, onehots, z, None, None)
        assert out["rgb"].shape == (B, N, 3)

    def test_local_encoder_generator(self):
        cfg = rest_net_cfg().replace(encoder="LOCAL")
        B, N, n_classes, P = 1, 32, 8, 64
        gen = Generator(cfg=cfg, n_classes=n_classes, proj_size=P)
        rng = jax.random.PRNGKey(0)
        proj_uv = jax.random.uniform(rng, (B, N, 2), minval=-1, maxval=1)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(
            jnp.zeros((B, N), dtype=jnp.int32), n_classes)
        proj_hf = jnp.zeros((B, P, P, 1))
        proj_seg = jnp.zeros((B, P, P, n_classes))
        params = gen.init(rng, proj_uv, rel_xyz, None, onehots, None,
                          proj_hf, proj_seg)
        out = gen.apply(params, proj_uv, rel_xyz, None, onehots, None,
                        proj_hf, proj_seg)
        assert out["rgb"].shape == (B, N, 3)


class TestDiscriminator:
    def test_forward_shapes_and_label(self):
        B, H, W, n_classes = 1, 64, 128, 8
        disc = Discriminator(n_channel_base=16, n_classes=n_classes)
        rng = jax.random.PRNGKey(0)
        img = jax.random.uniform(rng, (B, H, W, 3), minval=-1, maxval=1)
        seg = jax.nn.one_hot(
            jax.random.randint(rng, (B, H, W), 0, n_classes), n_classes)
        msk = jnp.ones((B, H, W, 1))
        variables = disc.init(rng, img, seg, msk)
        out, _ = disc.apply(variables, img, seg, msk,
                            mutable=["batch_stats"])
        assert out["pred"].shape == (B, H // 4, W // 4, n_classes + 1)
        assert out["label"].shape == (B, H // 4, W // 4, n_classes)
        # label stays one-hot
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out["label"], -1)), 1.0)

    def test_spectral_norm_updates(self):
        B, H, W, n_classes = 1, 32, 32, 4
        disc = Discriminator(n_channel_base=8, n_classes=n_classes)
        rng = jax.random.PRNGKey(0)
        img = jnp.ones((B, H, W, 3))
        seg = jax.nn.one_hot(jnp.zeros((B, H, W), jnp.int32), n_classes)
        msk = jnp.ones((B, H, W, 1))
        variables = disc.init(rng, img, seg, msk)
        _, updated = disc.apply(variables, img, seg, msk,
                                mutable=["batch_stats"])
        assert "batch_stats" in updated


class TestLosses:
    def test_gan_loss_semantics(self):
        B, H, W, C = 1, 8, 8, 4
        rng = jax.random.PRNGKey(0)
        pred = jax.random.normal(rng, (B, H, W, C + 1))
        label = jax.nn.one_hot(
            jax.random.randint(rng, (B, H, W), 1, C), C)
        for t_real, dis in [(True, True), (False, True), (True, False)]:
            v = gan_loss(pred, label, t_real, dis_update=dis)
            assert np.isfinite(float(v))
        # pushing each pixel's true-class logit up reduces D-real loss
        better = pred.at[..., :-1].add(3.0 * label)
        assert float(gan_loss(better, label, True)) < float(
            gan_loss(pred, label, True))

    def test_perceptual_loss(self):
        ploss = PerceptualLoss(layers=("relu_1_1", "relu_2_1"),
                               weights=(0.5, 1.0))
        params = ploss.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                               minval=-1, maxval=1)
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3),
                               minval=-1, maxval=1)
        la = ploss(params, a, b)
        assert float(la) > 0.0
        assert float(ploss(params, a, a)) < 1e-7

    def test_masked_l1(self):
        a = jnp.ones((1, 4, 4, 3))
        b = jnp.zeros((1, 4, 4, 3))
        m = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
        assert float(masked_l1(a, b, m)) == 0.5


class TestHelpers:
    def test_pack_points(self):
        B, N = 1, 8
        xyz = jnp.zeros((B, N, 3))
        scales = jnp.ones((B, N, 3))
        pts = helpers.get_gaussian_points(xyz, scales, {
            "rgb": jnp.full((B, N, 3), 0.5)})
        assert pts.shape == (B, N, 14)
        np.testing.assert_allclose(pts[0, 0, 3], 1.0)  # opacity
        np.testing.assert_allclose(np.asarray(pts[0, 0, 7:11]),
                                   [1, 0, 0, 0])  # identity quat

    def test_point_scales_special_z(self):
        scales = jnp.ones((1, 4, 1)) * 2.0
        classes = jnp.array([[1, 2, 5, 6]])
        s3 = helpers.get_point_scales(scales, classes, (1, 5, 6))
        np.testing.assert_allclose(np.asarray(s3[0, :, 0]), 2.0)
        np.testing.assert_allclose(np.asarray(s3[0, :, 2]), [1, 2, 1, 1])

    def test_ins_id_roundtrip(self):
        ids = np.array([[5, 123, 16000]], dtype=np.uint16)
        colors = helpers.get_ins_colors(ids, random=False)
        back = helpers.get_ins_id(colors.astype(np.float64))
        np.testing.assert_array_equal(back, ids)


class TestSmoothness:
    def test_smoothness_loss(self):
        from gaussiancity_tpu.losses import smoothness_loss

        x = jnp.zeros((1, 16, 16, 1))
        y = jnp.zeros((1, 16, 16, 1)).at[:, 8:].set(1.0)
        # identical inputs -> zero; differing curvature -> positive
        assert float(smoothness_loss(x, x)) == 0.0
        assert float(smoothness_loss(x, y)) > 0.0


class TestBfloat16Compute:
    """bf16 compute path: params stay f32, outputs stay f32, values track
    the f32 path within bf16 tolerance, grads flow and are finite."""

    def _bldg_ptv3_cfg(self):
        # 2-stage PTv3 (one pool/unpool level) — exercises every bf16
        # code path (attention, CPE conv, norms, pooling) at a fraction
        # of the 3-stage compile time.
        from gaussiancity_tpu.config import PTv3Config

        ptv3 = PTv3Config(
            order=("cord",),
            stride=(2,),
            enc_depths=(1, 1),
            enc_channels=(8, 16),
            enc_n_head=(1, 2),
            enc_patch_size=(16, 16),
            dec_depths=(1,),
            dec_channels=(8,),
            dec_n_head=(1,),
            dec_patch_size=(16,),
            mlp_ratio=2.0,
        )
        return GaussianNetworkConfig(
            scale_factor=0.65, encoder=None, encoder_out_dim=3,
            pos_emd="SIN_COS", sin_cos_freq_bends=4, z_dim=32,
            mlp_hidden_dim=64, ptv3=ptv3,
        )

    def test_bldg_ptv3_bf16_matches_f32(self):
        cfg32 = self._bldg_ptv3_cfg()
        cfg16 = cfg32.replace(compute_dtype="bfloat16")
        B, N, n_classes = 1, 64, 8
        rng = jax.random.PRNGKey(0)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(
            jnp.full((B, N), 2, dtype=jnp.int32), n_classes)
        instances = jnp.full((B, N), 100)
        z = helpers.get_z(jax.random.PRNGKey(7), instances, cfg32.z_dim)
        mask = jnp.arange(N)[None] < (N - 5)

        gen32 = Generator(cfg=cfg32, n_classes=n_classes, proj_size=32)
        gen16 = Generator(cfg=cfg16, n_classes=n_classes, proj_size=32)
        params = gen32.init(rng, None, rel_xyz, None, onehots, z, None,
                            None, mask)
        # same param tree is valid for both (dtype changes no shapes)
        out32 = gen32.apply(params, None, rel_xyz, None, onehots, z, None,
                            None, mask)
        out16 = gen16.apply(params, None, rel_xyz, None, onehots, z, None,
                            None, mask)
        for k in out32:
            assert out16[k].dtype == jnp.float32, k  # outputs stay f32
            np.testing.assert_allclose(
                np.asarray(out32[k]), np.asarray(out16[k]), atol=0.08,
                err_msg=k)

        # params untouched by dtype: all f32
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32

        def loss(p):
            out = gen16.apply(p, None, rel_xyz, None, onehots, z, None,
                              None, mask)
            return sum(jnp.sum(v ** 2) for v in out.values())

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        # grads are f32 and reach the deepest PTv3 params
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert np.isfinite(total) and total > 0.0
        for leaf in leaves:
            assert leaf.dtype == jnp.float32

    def test_rest_hashgrid_bf16_matches_f32(self):
        cfg32 = rest_net_cfg()
        cfg16 = cfg32.replace(compute_dtype="bfloat16")
        B, N, n_classes, P = 1, 64, 8, 32
        rng = jax.random.PRNGKey(0)
        proj_uv = jax.random.uniform(rng, (B, N, 2), minval=-1, maxval=1)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(
            jnp.zeros((B, N), dtype=jnp.int32), n_classes)
        proj_hf = jnp.zeros((B, P, P, 1))
        proj_seg = jnp.zeros((B, P, P, n_classes))
        gen32 = Generator(cfg=cfg32, n_classes=n_classes, proj_size=P)
        gen16 = Generator(cfg=cfg16, n_classes=n_classes, proj_size=P)
        params = gen32.init(rng, proj_uv, rel_xyz, None, onehots, None,
                            proj_hf, proj_seg)
        out32 = gen32.apply(params, proj_uv, rel_xyz, None, onehots, None,
                            proj_hf, proj_seg)
        out16 = gen16.apply(params, proj_uv, rel_xyz, None, onehots, None,
                            proj_hf, proj_seg)
        assert out16["rgb"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out32["rgb"]),
                                   np.asarray(out16["rgb"]), atol=0.08)
