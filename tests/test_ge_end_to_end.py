# -*- coding: utf-8 -*-
"""Generated-artifacts -> GoogleEarthDataset -> train step: the full
"switch from the reference" loop on disk artifacts (reference: offline
scripts/dataset_generator.py output consumed by utils/datasets.py
GoogleEarthDataset -> core/train.py)."""

import os

import jax
import numpy as np
import pytest

from gaussiancity_tpu.config import (
    Config, DatasetConfig, DiscriminatorOptim, GaussianNetworkConfig,
    PTv3Config, RasterizerConfig, TrainConfig,
)
from gaussiancity_tpu.data import dataset_generator as dg
from gaussiancity_tpu.data.datasets import DataLoader, get_dataset
from gaussiancity_tpu.inference.pipeline import get_quat_from_look_at
from gaussiancity_tpu.training.step import Trainer, make_train_step

from test_dataset_generator import synthetic_city


@pytest.fixture()
def small_projection_window(monkeypatch):
    # the generator pads the local projection window to PROJECTION_SIZE
    # (2048 for Google Earth); shrink it so the test's proj tensors stay
    # small — the dataset cfg below uses the same size
    monkeypatch.setitem(dg.CONSTANTS["GOOGLE_EARTH"], "PROJECTION_SIZE", 128)


def _make_city(root, n_views=2):
    from PIL import Image

    city = os.path.join(root, "TestCity")
    os.makedirs(os.path.join(city, "footage"), exist_ok=True)
    synthetic_city(city)
    poses = []
    for i in range(n_views):
        pos = np.array([20.0 + 4 * i, 48.0, 30.0])
        q = get_quat_from_look_at(pos, np.array([48.0, 48.0, 1.0]))
        poses.append({"id": i, "tx": pos[0], "ty": pos[1], "tz": pos[2],
                      "qx": q[0], "qy": q[1], "qz": q[2], "qw": q[3]})
    dg.save_camera_poses(os.path.join(city, "CameraPoses.csv"), poses)
    dg.generate_city("GOOGLE_EARTH", city, vol_shape=(128, 128, 48))
    rng = np.random.default_rng(0)
    for i in range(n_views):
        img = rng.integers(0, 255, (540, 960, 3), np.uint8)
        Image.fromarray(img).save(
            os.path.join(city, "footage", f"TestCity_{i:02d}.jpeg"))
    return city


def _cfg(root):
    ds = DatasetConfig(
        name="GOOGLE_EARTH", dir=root, n_cities=1, n_views=2,
        train_crop_size=(192, 96), test_crop_size=(192, 96),
        train_min_pixels=1, proj_size=128, map_size=0, scale=1,
        pin_memory=("Rt", "centers"),
    )
    net = GaussianNetworkConfig(
        scale_factor=0.5, encoder=None, encoder_out_dim=3,
        pos_emd="SIN_COS", sin_cos_freq_bends=2, z_dim=None,
        mlp_hidden_dim=16, dis_n_channel_base=8,
        ptv3=PTv3Config(enabled=False),
    )
    rast = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                            backend="xla")
    tr = TrainConfig(
        max_points=4096, perceptual_loss_layers=("relu_1_1",),
        perceptual_loss_weights=(1.0,),
        discriminator=DiscriminatorOptim(enabled=False),
        n_workers=0,
    )
    return Config(dataset=ds, network=net, rasterizer=rast, train=tr)


class TestGoogleEarthArtifactsToTraining:
    def test_generated_city_trains(self, tmp_path,
                                   small_projection_window):
        _make_city(str(tmp_path))
        cfg = _cfg(str(tmp_path))
        ds = get_dataset(cfg, "GOOGLE_EARTH", "train")
        assert len(ds) == 2  # two views, train split
        item = ds[0]
        assert item["pts"].shape == (cfg.train.max_points, 9)
        assert item["rgb"].shape == (96, 192, 3)
        assert item["proj_hf"].shape == (128, 128, 1)
        loader = DataLoader(ds, batch_size=1, shuffle=False)
        batch = next(loader.epoch(0))
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = make_train_step(trainer)(
            state, batch, jax.random.PRNGKey(1))
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"non-finite {k}"

    def test_val_split_views(self, tmp_path, small_projection_window):
        _make_city(str(tmp_path))
        cfg = _cfg(str(tmp_path))
        ds_val = get_dataset(cfg, "GOOGLE_EARTH", "val")
        # val = views ending in 00 (reference: utils/datasets.py:317-321)
        assert len(ds_val) == 1
