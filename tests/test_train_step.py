# -*- coding: utf-8 -*-
"""End-to-end training step tests: fused GAN step on synthetic BEV data,
single device and data-parallel over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import (
    Config, DatasetConfig, DiscriminatorOptim, GaussianNetworkConfig,
    PTv3Config, RasterizerConfig, TrainConfig,
)
from gaussiancity_tpu.training.step import Trainer, make_train_step


def tiny_config(use_disc=True, z_dim=None, encoder="GLOBAL"):
    ds = DatasetConfig(
        sensor_size=(256, 64),
        train_crop_size=(128, 32),
        n_classes=8,
        proj_size=32,
        cam_k=(100.0, 0, 128.0, 0, 100.0, 32.0, 0, 0, 1),
        flip_ud=False,
    )
    net = GaussianNetworkConfig(
        scale_factor=0.5,
        encoder=encoder,
        encoder_out_dim=5 if encoder else 3,
        global_encoder_n_blocks=2,
        pos_emd="HASH_GRID" if encoder else "SIN_COS",
        hash_grid_n_levels=4,
        hash_grid_level_dim=4,
        hash_grid_map_size=10,
        sin_cos_freq_bends=4,
        z_dim=z_dim,
        mlp_hidden_dim=32,
        dis_n_channel_base=8,
        ptv3=PTv3Config(enabled=False),
    )
    rast = RasterizerConfig(tile_h=8, tile_w=128, tile_capacity=128,
                            max_tiles_per_gaussian=16, backend="xla")
    tr = TrainConfig(
        perceptual_loss_layers=("relu_1_1", "relu_2_1"),
        perceptual_loss_weights=(0.5, 1.0),
        discriminator=DiscriminatorOptim(enabled=use_disc,
                                         n_warmup_iters=10),
    )
    return Config(dataset=ds, network=net, rasterizer=rast, train=tr)


def synthetic_batch(key, cfg, n_pts=64, split="train"):
    ds = cfg.dataset
    Wc, Hc = ds.train_crop_size if split == "train" else ds.test_crop_size
    P = ds.proj_size
    ks = jax.random.split(key, 8)
    depth = jax.random.uniform(ks[0], (1, n_pts), minval=5.0, maxval=30.0)
    y = jax.random.uniform(ks[1], (1, n_pts), minval=-0.8, maxval=0.8) * depth
    z = jax.random.uniform(ks[2], (1, n_pts), minval=-0.3, maxval=0.3) * depth
    abs_xyz = jnp.stack([depth, y, z], axis=-1)
    scale = jax.random.uniform(ks[3], (1, n_pts, 1), minval=0.3, maxval=1.0)
    instance = jax.random.randint(ks[4], (1, n_pts, 1), 0, 8).astype(jnp.float32)
    rel_xyz = jax.random.uniform(ks[5], (1, n_pts, 3), minval=-1, maxval=1)
    bidx = jnp.zeros((1, n_pts, 1))
    pts = jnp.concatenate([abs_xyz, scale, instance, rel_xyz, bidx], axis=-1)
    return {
        "pts": pts,
        "pts_mask": jnp.ones((1, n_pts), dtype=bool),
        "rgb": jax.random.uniform(ks[6], (1, Hc, Wc, 3), minval=-1, maxval=1),
        "seg": jax.nn.one_hot(
            jax.random.randint(ks[7], (1, Hc, Wc), 0, ds.n_classes),
            ds.n_classes),
        "msk": jnp.ones((1, Hc, Wc, 1)),
        "proj_hf": jnp.zeros((1, P, P, 1)),
        "proj_seg": jnp.zeros((1, P, P, ds.n_classes)),
        "cam_pos": jnp.zeros((1, 3)),
        "cam_quat": jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (1, 1)),
        "crp_xy": jnp.array([[16, 8]], dtype=jnp.int32),
    }


class TestTrainStep:
    def test_full_gan_step_updates_params(self):
        cfg = tiny_config(use_disc=True)
        trainer = Trainer(cfg)
        rng = jax.random.PRNGKey(0)
        batch = synthetic_batch(jax.random.PRNGKey(1), cfg)
        state = trainer.init_state(rng, batch)
        step = make_train_step(trainer)
        g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
        state2, metrics = step(state, batch, jax.random.PRNGKey(2))
        for k in ("L1Loss", "PerceptualLoss", "GANLoss", "GANLossFake",
                  "GANLossReal", "GenLoss", "DisLoss"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state2.step) == 1
        g1 = jax.tree_util.tree_leaves(state2.g_params)[0]
        assert float(jnp.abs(g1 - g0).max()) > 0.0

    def test_no_disc_step(self):
        cfg = tiny_config(use_disc=False)
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(1), cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = make_train_step(trainer)
        state2, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert float(metrics["DisLoss"]) == 0.0
        assert np.isfinite(float(metrics["GenLoss"]))

    def test_bldg_style_step_with_z(self):
        cfg = tiny_config(use_disc=True, z_dim=16, encoder=None)
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(3), cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state2, metrics = make_train_step(trainer)(
            state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(metrics["GenLoss"]))

    def test_loss_decreases_l1_only(self):
        # pure-L1 overfit on a single batch must reduce loss
        from gaussiancity_tpu.config import GeneratorOptim

        cfg = tiny_config(use_disc=False)
        cfg = cfg.replace(train=cfg.train.replace(
            generator=GeneratorOptim(lr=1e-2)))
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(5), cfg)
        # constant-color target: fittable by moving splat colors
        batch["rgb"] = jnp.full_like(batch["rgb"], 0.3)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = make_train_step(trainer)
        first = None
        last = None
        for i in range(12):
            state, metrics = step(state, batch, jax.random.PRNGKey(6))
            if first is None:
                first = float(metrics["L1Loss"])
            last = float(metrics["L1Loss"])
        assert last < first


class TestDataParallel:
    def test_shard_map_dp_step(self):
        from gaussiancity_tpu.training.step import make_parallel_train_step

        n_dev = len(jax.devices())
        assert n_dev == 8, f"expected 8 virtual CPU devices, got {n_dev}"
        mesh = jax.make_mesh((n_dev,), ("data",))
        cfg = tiny_config(use_disc=True)
        trainer = Trainer(cfg)
        batch1 = synthetic_batch(jax.random.PRNGKey(1), cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch1)
        pstep, repl, shard = make_parallel_train_step(trainer, mesh)
        # global batch: 8 replicas of the synthetic batch
        gbatch = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * n_dev, axis=0), batch1)
        gbatch = jax.device_put(gbatch, shard)
        state = jax.device_put(state, repl)
        state2, metrics = pstep(state, gbatch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["GenLoss"]))
        assert int(state2.step) == 1


class TestEvalCropSize:
    def test_eval_step_uses_test_crop_size(self):
        # Regression for the round-1 eval-path bug: eval batches are
        # center-cropped to test_crop_size (reference utils/datasets.py
        # :200-253) which differs from the train crop with the *default*
        # GoogleEarth sizes (train 448x448, test 720x405, sensor 960x540).
        from gaussiancity_tpu.config import DatasetConfig as DC

        dflt = DC()
        cfg = tiny_config(use_disc=False)
        cfg = cfg.replace(
            dataset=cfg.dataset.replace(
                sensor_size=dflt.sensor_size,
                train_crop_size=dflt.train_crop_size,
                test_crop_size=dflt.test_crop_size,
                cam_k=dflt.cam_k,
            ),
            rasterizer=cfg.rasterizer.replace(tile_capacity=64),
        )
        assert cfg.dataset.train_crop_size != cfg.dataset.test_crop_size
        trainer = Trainer(cfg)
        train_batch = synthetic_batch(jax.random.PRNGKey(0), cfg, n_pts=32)
        state = trainer.init_state(jax.random.PRNGKey(1), train_batch)
        eval_batch = synthetic_batch(jax.random.PRNGKey(2), cfg, n_pts=32,
                                     split="test")
        metrics, fake = jax.jit(trainer.eval_step)(
            state, eval_batch, jax.random.PRNGKey(3))
        Wt, Ht = cfg.dataset.test_crop_size
        assert fake.shape == (1, Ht, Wt, 3)
        assert np.isfinite(float(metrics["L1Loss"]))


class TestOverflowSurfacing:
    def test_binning_overflow_reaches_metrics(self):
        # All points on the optical axis -> every Gaussian lands in the same
        # tile; with tile_capacity 8 << 64 points the binning must truncate
        # and report it through the train metrics (never silently).
        cfg = tiny_config(use_disc=False)
        cfg = cfg.replace(rasterizer=cfg.rasterizer.replace(
            tile_capacity=8, max_tiles_per_gaussian=4))
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(1), cfg)
        pts = batch["pts"]
        xyz = jnp.concatenate([
            jnp.full((1, pts.shape[1], 1), 10.0),   # depth
            jnp.zeros((1, pts.shape[1], 2)),        # centered
        ], axis=-1)
        batch["pts"] = jnp.concatenate([xyz, pts[..., 3:]], axis=-1)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        _, metrics = make_train_step(trainer)(
            state, batch, jax.random.PRNGKey(2))
        assert float(metrics["RasterTruncated"]) > 0
        assert "RasterDroppedPairs" in metrics
        assert "PTv3PoolOverflow" in metrics

    def test_no_overflow_reports_zero(self):
        cfg = tiny_config(use_disc=False)
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(1), cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        _, metrics = make_train_step(trainer)(
            state, batch, jax.random.PRNGKey(2))
        assert float(metrics["RasterTruncated"]) == 0.0
        assert float(metrics["RasterDroppedPairs"]) == 0.0
        assert float(metrics["PTv3PoolOverflow"]) == 0.0


class TestCarRecipe:
    def test_car_recipe_step_runs(self):
        """CAR recipe (KITTI-360: car instance range, sin/cos + z + PTv3)
        — one fused GAN step must run and stay finite (reference:
        README.md CAR recipe)."""
        from gaussiancity_tpu.config import car_recipe, PTv3Config

        cfg = car_recipe()
        # shrink to CPU-test sizes, keep the recipe's structure
        cfg = cfg.replace(
            dataset=cfg.dataset.replace(
                sensor_size=(256, 64), train_crop_size=(128, 32),
                proj_size=32,
                cam_k=(100.0, 0, 128.0, 0, 100.0, 32.0, 0, 0, 1),
                flip_ud=False),
            network=cfg.network.replace(
                z_dim=8, mlp_hidden_dim=16, dis_n_channel_base=8,
                sin_cos_freq_bends=2,
                ptv3=PTv3Config(
                    enabled=True, stride=(2,), enc_depths=(1, 1),
                    enc_channels=(8, 16), enc_n_head=(1, 2),
                    enc_patch_size=(16, 16), dec_depths=(1,),
                    dec_channels=(8,), dec_n_head=(1,),
                    dec_patch_size=(16,))),
            rasterizer=cfg.rasterizer.replace(
                tile_capacity=128, max_tiles_per_gaussian=16,
                backend="xla"),
            train=cfg.train.replace(
                perceptual_loss_layers=("relu_1_1",),
                perceptual_loss_weights=(1.0,)),
        )
        trainer = Trainer(cfg)
        batch = synthetic_batch(jax.random.PRNGKey(0), cfg)
        # CAR instance ids (KITTI car range starts at 10000)
        pts = batch["pts"]
        car_ins = jax.random.randint(
            jax.random.PRNGKey(1), (1, pts.shape[1], 1), 10000, 10050
        ).astype(jnp.float32)
        batch["pts"] = jnp.concatenate(
            [pts[..., :4], car_ins, pts[..., 5:]], axis=-1)
        state = trainer.init_state(jax.random.PRNGKey(2), batch)
        state, metrics = make_train_step(trainer)(
            state, batch, jax.random.PRNGKey(3))
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"non-finite {k}"


class TestThreeModelMasks:
    def test_host_class_split_with_car(self):
        """REST/BLDG/CAR partition must be exhaustive and disjoint
        (reference: scripts/inference.py:429-453)."""
        from gaussiancity_tpu.config import kitti_360_dataset
        from gaussiancity_tpu.inference.pipeline import InferencePipeline

        cfg = tiny_config()
        cfg = cfg.replace(dataset=kitti_360_dataset().replace(
            sensor_size=(128, 64), proj_size=32,
            cam_k=(60.0, 0, 64.0, 0, 60.0, 32.0, 0, 0, 1)))
        pipe = InferencePipeline.__new__(InferencePipeline)
        pipe.ds = cfg.dataset
        pipe.models = {"REST": None, "BLDG": None, "CAR": None}
        n = 64
        pts9 = np.zeros((n, 9), np.float32)
        rng = np.random.default_rng(0)
        pts9[:, 4] = rng.choice([1, 5, 100, 101, 10005, 12000], n)
        masks = pipe.host_class_split(pts9)
        total = (masks["REST"].astype(int) + masks["BLDG"].astype(int)
                 + masks["CAR"].astype(int))
        np.testing.assert_array_equal(total, 1)  # exhaustive + disjoint
        assert masks["CAR"][pts9[:, 4] >= 10000].all()
        assert masks["BLDG"][(pts9[:, 4] >= 100)
                             & (pts9[:, 4] < 10000)].all()
