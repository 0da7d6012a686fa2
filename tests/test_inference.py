# -*- coding: utf-8 -*-
"""Inference pipeline test: synthetic city projections -> orbit trajectory
-> rendered frames via a tiny REST generator."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiancity_tpu.config import (
    Config, DatasetConfig, GaussianNetworkConfig, PTv3Config,
    RasterizerConfig,
)
from gaussiancity_tpu.inference.pipeline import (
    InferencePipeline, get_orbit_camera_poses, get_quat_from_look_at,
    get_style_lut,
)
from gaussiancity_tpu.models import Generator


def tiny_cfg():
    ds = DatasetConfig(
        sensor_size=(128, 64),
        n_classes=8,
        proj_size=64,
        cam_k=(60.0, 0, 64.0, 0, 60.0, 32.0, 0, 0, 1),
        flip_ud=False,
    )
    net = GaussianNetworkConfig(
        scale_factor=0.5, encoder="GLOBAL", encoder_out_dim=5,
        global_encoder_n_blocks=2, pos_emd="HASH_GRID",
        hash_grid_n_levels=2, hash_grid_level_dim=2, hash_grid_map_size=8,
        z_dim=None, mlp_hidden_dim=16, ptv3=PTv3Config(enabled=False),
    )
    rast = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                            backend="xla")
    return Config(dataset=ds, network=net, rasterizer=rast)


def synthetic_projections(P=64, seed=0):
    rng = np.random.default_rng(seed)
    ins = np.ones((P, P), np.int16)
    ins[10:20, 10:20] = 100
    ins[30:42, 30:44] = 102
    td = np.where(ins >= 100, 18, 2).astype(np.int16)
    bu = np.zeros((P, P), np.int16)
    pts = np.ones((P, P), bool)
    seg = np.where(ins >= 100, 2, ins).astype(np.int16)
    return {"REST": {"INS": ins, "SEG": seg, "TD_HF": td, "BU_HF": bu,
                     "PTS": pts}}


class TestCameraPoses:
    def test_quat_look_at_points_forward(self):
        q = get_quat_from_look_at(np.array([0.0, 0, 0]),
                                  np.array([10.0, 0, 0]))
        import scipy.spatial.transform as sst

        R = sst.Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(R[:, 0], [1, 0, 0], atol=1e-8)

    def test_orbit(self):
        poses = get_orbit_camera_poses(64, n_points=8, radius=20, altitude=40)
        assert len(poses) == 8
        r = np.hypot(poses[0]["tx"] - 32, poses[0]["ty"] - 32)
        np.testing.assert_allclose(r, 20, atol=1e-6)


class TestInference:
    def test_render_trajectory(self, tmp_path):
        cfg = tiny_cfg()
        gen = Generator(cfg=cfg.network, n_classes=8,
                        proj_size=cfg.dataset.proj_size)
        P = cfg.dataset.proj_size
        N = 2048
        rng = jax.random.PRNGKey(0)
        params = gen.init(
            rng,
            jnp.zeros((1, N, 2)), jnp.zeros((1, N, 3)), None,
            jnp.zeros((1, N, 8)), None,
            jnp.zeros((1, P, P, 1)), jnp.zeros((1, P, P, 8)),
            jnp.ones((1, N), bool),
        )["params"]
        pipe = InferencePipeline(
            cfg, {"REST": (gen, params)}, max_points=N,
            vol_shape=(72, 72, 24),
        )
        projections = synthetic_projections(P)
        centers = {int(i): (32.0, 32.0, 64.0, 64.0, 20.0)
                   for i in range(0, 200)}
        poses = get_orbit_camera_poses(P, n_points=2, radius=30, altitude=30)
        frames = pipe.render_trajectory(
            projections, centers, poses,
            video_path=str(tmp_path / "out.mp4"))
        assert len(frames) == 2
        H, W = cfg.dataset.sensor_size[1], cfg.dataset.sensor_size[0]
        assert frames[0].shape == (H, W, 3)
        # frames contain actual content (some visible splats)
        assert frames[0].std() > 1.0
        assert (tmp_path / "out.mp4").exists()

    def test_style_lut(self):
        lut = get_style_lut({1: (0, 0, 0, 0, 0)}, z_dim=8,
                            z_bank={5: np.ones(8)})
        assert lut.shape[1] == 8
        np.testing.assert_allclose(lut[5], 1.0)
        assert lut.min() >= 0 and lut.max() < 1.0 + 1e-6


class TestInferenceFromCheckpoint:
    def test_ckpt_to_video(self, tmp_path):
        """End-to-end: smoke-train -> checkpoint -> get_models ->
        InferencePipeline -> frames (reference: scripts/inference.py
        :57-108, 614-707 — the ckpt-to-video glue)."""
        from tests.test_pipeline import smoke_cfg

        from gaussiancity_tpu.inference.loader import (
            get_city_projections, get_models, get_random_city,
        )
        from gaussiancity_tpu.training.train import train

        cfg = smoke_cfg().replace(output_dir=str(tmp_path))
        train(cfg, dataset_name="SYNTHETIC", max_steps=1)
        ckpt_dir = f"{cfg.output_dir}/ckpt/smoke"

        cfg2, models, z_banks = get_models({"REST": ckpt_dir})
        assert cfg2.exp_name == "smoke"
        assert "REST" in models
        gen, params = models["REST"]
        assert gen.cfg.encoder == "GLOBAL"

        # synthetic city dir for get_city_projections / get_random_city
        from gaussiancity_tpu.data import dataset_generator as dg

        root = tmp_path / "cities"
        city = root / "City01"
        city.mkdir(parents=True)
        projections = synthetic_projections(64)
        dg.dump_projections(projections,
                            str(city / "Projection"))
        picked = get_random_city(str(root))
        assert picked.endswith("City01")
        proj2, centers = get_city_projections(picked)
        assert "REST" in proj2 and 100 in centers

        pipe = InferencePipeline(cfg2, models, max_points=2048,
                                 vol_shape=(72, 72, 24))
        poses = get_orbit_camera_poses(64, n_points=1, radius=30,
                                       altitude=30)
        frames = pipe.render_trajectory(proj2, centers, poses)
        assert len(frames) == 1 and frames[0].std() > 0


class TestSelectNearest:
    def test_keeps_nearest_preserves_order(self):
        from gaussiancity_tpu.inference.pipeline import select_nearest

        pts = np.zeros((6, 9), np.float32)
        pts[:, 0] = [10, 1, 7, 2, 9, 3]  # x = distance from origin cam
        pts[:, 4] = np.arange(6)  # tag rows via instance col
        pad, mask, dropped = select_nearest(pts, np.zeros(3), 4)
        assert dropped == 2
        assert mask.sum() == 4
        # nearest four are x in {1, 2, 3, 7}, original order preserved
        np.testing.assert_array_equal(pad[mask][:, 0], [1, 7, 2, 3])

    def test_under_budget_pads(self):
        from gaussiancity_tpu.inference.pipeline import select_nearest

        pts = np.ones((3, 9), np.float32)
        pad, mask, dropped = select_nearest(pts, np.zeros(3), 8)
        assert dropped == 0 and mask.sum() == 3 and pad.shape == (8, 9)


def _two_model_pipe(N=1024):
    cfg = tiny_cfg()
    P = cfg.dataset.proj_size
    rng = jax.random.PRNGKey(0)
    rest = Generator(cfg=cfg.network, n_classes=8, proj_size=P)
    rest_p = rest.init(
        rng, jnp.zeros((1, N, 2)), jnp.zeros((1, N, 3)), None,
        jnp.zeros((1, N, 8)), None, jnp.zeros((1, P, P, 1)),
        jnp.zeros((1, P, P, 8)), jnp.ones((1, N), bool))["params"]
    bldg_net = cfg.network.replace(
        encoder=None, encoder_out_dim=3, pos_emd="SIN_COS",
        sin_cos_freq_bends=4, z_dim=8)
    bldg = Generator(cfg=bldg_net, n_classes=8, proj_size=P)
    bldg_p = bldg.init(
        jax.random.PRNGKey(1), jnp.zeros((1, N, 2)), jnp.zeros((1, N, 3)),
        None, jnp.zeros((1, N, 8)), jnp.zeros((1, N, 8)),
        jnp.zeros((1, P, P, 1)), jnp.zeros((1, P, P, 8)),
        jnp.ones((1, N), bool))["params"]
    pipe = InferencePipeline(
        cfg, {"REST": (rest, rest_p), "BLDG": (bldg, bldg_p)},
        max_points=N, vol_shape=(72, 72, 24),
        class_budgets={"REST": N, "BLDG": N // 2})
    return cfg, pipe


class TestCompactClassPath:
    """Compacted per-class inference (reference splits classes ragged,
    scripts/inference.py:455-507): per-class outputs must equal the dense
    masked path point-for-point (for pointwise generators), and the
    trajectory renderer must work end-to-end with budgets."""

    def test_single_matches_dense_selection(self):
        cfg, pipe = _two_model_pipe()
        N = pipe.max_points
        P = cfg.dataset.proj_size
        rng = np.random.default_rng(3)
        pts9 = np.zeros((N, 9), np.float32)
        pts9[:, 0] = rng.uniform(0, P, N)
        pts9[:, 1] = rng.uniform(0, P, N)
        pts9[:, 2] = rng.uniform(0, 20, N)
        pts9[:, 3] = 1.0
        pts9[:, 4] = rng.choice([1, 2, 100, 101], N)  # rest + bldg ins
        pts9[:, 5:8] = rng.uniform(-1, 1, (N, 3))
        mask = np.ones(N, bool)
        lut = jnp.asarray(get_style_lut({}, z_dim=8))
        hf = jnp.zeros((P, P, 1))
        seg = jnp.zeros((P, P, 8))
        params_map = {n: p for n, (_, p) in pipe.models.items()}
        dense = pipe.predict_attrs(params_map, jnp.asarray(pts9),
                                   jnp.asarray(mask), hf, seg, None, lut)
        masks = pipe.host_class_split(pts9)
        for name in pipe.models:
            single = pipe.predict_attrs_single(
                name, params_map[name], jnp.asarray(pts9),
                jnp.asarray(mask), hf, seg, None, lut)
            m = masks[name]
            assert m.any()
            np.testing.assert_allclose(
                np.asarray(single)[m], np.asarray(dense)[m],
                rtol=1e-6, atol=1e-6)

    def test_render_trajectory_compact(self, tmp_path):
        cfg, pipe = _two_model_pipe()
        P = cfg.dataset.proj_size
        projections = synthetic_projections(P)
        centers = {int(i): (32.0, 32.0, 64.0, 64.0, 20.0)
                   for i in range(0, 200)}
        poses = get_orbit_camera_poses(P, n_points=1, radius=30, altitude=30)
        frames = pipe.render_trajectory(projections, centers, poses,
                                        style_lut=np.ones((512, 8),
                                                          np.float32))
        assert len(frames) == 1
        H, W = cfg.dataset.sensor_size[1], cfg.dataset.sensor_size[0]
        assert frames[0].shape == (H, W, 3)
        assert frames[0].std() > 1.0


class TestRoadBlurParity:
    def test_blur_matches_reflect_oracle(self):
        """reference scripts/inference.py:255 uses torchvision
        GaussianBlur(kernel_size=3, sigma=2) == reflect-padded 3x3
        separable Gaussian; pinned against a numpy oracle."""
        from gaussiancity_tpu.inference.pipeline import _gaussian_blur3

        rng = np.random.default_rng(0)
        img = rng.standard_normal((9, 11, 3)).astype(np.float32)
        x = np.arange(-1, 2, dtype=np.float32)
        k1 = np.exp(-(x ** 2) / (2 * 2.0 ** 2))
        k1 /= k1.sum()
        k = np.outer(k1, k1)
        pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
        want = np.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                want += k[dy, dx] * pad[dy:dy + 9, dx:dx + 11]
        got = np.asarray(_gaussian_blur3(jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=1e-6)
