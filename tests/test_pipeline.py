# -*- coding: utf-8 -*-
"""Data pipeline + end-to-end smoke training on the synthetic dataset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiancity_tpu.config import (
    Config, DatasetConfig, DiscriminatorOptim, GaussianNetworkConfig,
    PTv3Config, RasterizerConfig, TrainConfig,
)
from gaussiancity_tpu.data.datasets import (
    DataLoader, SyntheticDataset, get_dataset, instances_to_classes_np,
)
from gaussiancity_tpu.data import transforms as T


def smoke_cfg():
    ds = DatasetConfig(
        name="SYNTHETIC",
        sensor_size=(256, 64),
        train_crop_size=(128, 32),
        test_crop_size=(128, 32),
        train_min_pixels=4,
        n_classes=8,
        proj_size=64,
        map_size=0,
        cam_k=(100.0, 0, 128.0, 0, 100.0, 32.0, 0, 0, 1),
        flip_ud=False,
        pin_memory=(),
    )
    net = GaussianNetworkConfig(
        scale_factor=0.5, encoder="GLOBAL", encoder_out_dim=5,
        global_encoder_n_blocks=2, pos_emd="HASH_GRID",
        hash_grid_n_levels=4, hash_grid_level_dim=4, hash_grid_map_size=10,
        z_dim=None, mlp_hidden_dim=32, dis_n_channel_base=8,
        ptv3=PTv3Config(enabled=False),
    )
    rast = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                            backend="xla")
    tr = TrainConfig(
        n_epochs=1,
        max_points=512,
        perceptual_loss_layers=("relu_1_1",),
        perceptual_loss_weights=(1.0,),
        ckpt_save_freq=1,
        discriminator=DiscriminatorOptim(enabled=True, n_warmup_iters=5),
    )
    return Config(exp_name="smoke", dataset=ds, network=net, rasterizer=rast,
                  train=tr, test=__import__(
                      "gaussiancity_tpu.config", fromlist=["TestConfig"]
                  ).TestConfig(test_freq=1))


class TestInstanceMapping:
    def test_google_earth_mapping(self):
        ds = DatasetConfig()
        inst = np.array([0, 1, 5, 100, 101, 202, 203, 40000])
        out = instances_to_classes_np(inst, ds)
        np.testing.assert_array_equal(out, [0, 1, 5, 2, 7, 2, 7, 40000])

    def test_kitti_mapping_with_cars(self):
        from gaussiancity_tpu.config import kitti_360_dataset

        ds = kitti_360_dataset()
        inst = np.array([0, 100, 101, 10005, 16384])
        out = instances_to_classes_np(inst, ds)
        np.testing.assert_array_equal(out, [0, 2, 7, 3, 16384])


class TestSyntheticPipeline:
    def test_dataset_item_shapes(self):
        cfg = smoke_cfg()
        ds = SyntheticDataset(cfg, "train", n_items=2)
        item = ds[0]
        Wc, Hc = cfg.dataset.train_crop_size
        assert item["rgb"].shape == (Hc, Wc, 3)
        assert item["seg"].shape == (Hc, Wc, 8)
        assert item["msk"].shape == (Hc, Wc, 1)
        assert item["pts"].shape == (cfg.train.max_points, 9)
        assert item["pts_mask"].sum() > 0
        assert item["proj_hf"].shape[-1] == 1

    def test_loader_batching(self):
        cfg = smoke_cfg()
        ds = SyntheticDataset(cfg, "train", n_items=4)
        loader = DataLoader(ds, batch_size=1, process_index=0,
                            process_count=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 4
        assert batches[0]["rgb"].shape[0] == 1

    def test_loader_host_sharding(self):
        cfg = smoke_cfg()
        ds = SyntheticDataset(cfg, "train", n_items=8)
        l0 = DataLoader(ds, process_index=0, process_count=2)
        l1 = DataLoader(ds, process_index=1, process_count=2)
        assert len(l0) == 4 and len(l1) == 4


class TestEndToEndTraining:
    def test_smoke_train_and_resume(self, tmp_path):
        from gaussiancity_tpu.training import checkpoint as ckpt_mod
        from gaussiancity_tpu.training.train import train

        cfg = smoke_cfg().replace(output_dir=str(tmp_path))
        train(cfg, dataset_name="SYNTHETIC", max_steps=2)
        ckpt_dir = f"{cfg.output_dir}/ckpt/smoke"
        assert ckpt_mod.latest_epoch(ckpt_dir) is not None
        # scalars were logged
        log = os.path.join(str(tmp_path), "logs", "smoke", "scalars.jsonl")
        assert os.path.exists(log) and os.path.getsize(log) > 0

        # resume restores state and optimizer
        from gaussiancity_tpu.training.step import Trainer

        trainer = Trainer(cfg)
        ds = get_dataset(cfg, "SYNTHETIC", "train")
        loader = DataLoader(ds, batch_size=1, process_index=0,
                            process_count=1)
        batch = jax.tree_util.tree_map(
            jnp.asarray, next(iter(loader.epoch(0))))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        restored, cfg2, epoch = ckpt_mod.restore_checkpoint(ckpt_dir, state)
        assert int(restored.step) >= 1
        assert cfg2.exp_name == "smoke"


class TestPrefetchLoader:
    def test_prefetch_matches_synchronous_order(self):
        cfg = smoke_cfg()
        ds = SyntheticDataset(cfg, "val", n_items=6)  # val: deterministic rng
        sync = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                          num_workers=0, process_index=0, process_count=1)
        pre = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                         num_workers=4, prefetch=3,
                         process_index=0, process_count=1)
        b_sync = list(sync.epoch(1))
        b_pre = list(pre.epoch(1))
        assert len(b_sync) == len(b_pre) == 3
        for a, b in zip(b_sync, b_pre):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_remainder_dropped(self):
        cfg = smoke_cfg()
        ds = SyntheticDataset(cfg, "val", n_items=7)
        loader = DataLoader(ds, batch_size=2, num_workers=2,
                            process_index=0, process_count=1)
        assert len(list(loader.epoch(0))) == 3  # 7 // 2, ragged tail dropped
