# -*- coding: utf-8 -*-
"""Offline dataset generator: synthetic projections -> full artifact cycle
-> loaded back by the training dataset."""

import os
import pickle

import numpy as np
import pytest

from gaussiancity_tpu.data import dataset_generator as dg


def synthetic_city(city_dir, P=96):
    from PIL import Image

    rng = np.random.default_rng(0)
    ins = np.ones((P, P), np.int16)
    for b in range(3):
        x0, y0 = rng.integers(8, P - 24, 2)
        w0, h0 = rng.integers(8, 16, 2)
        ins[y0: y0 + h0, x0: x0 + w0] = 100 + 2 * b
    td = np.where(ins >= 100, 20, 2).astype(np.int16)
    bu = np.zeros((P, P), np.int16)
    pts = np.ones((P, P), np.int16)
    seg = np.where(ins >= 100, 2, ins).astype(np.int16)
    projections = {"REST": {"INS": ins, "SEG": seg, "TD_HF": td,
                            "BU_HF": bu, "PTS": pts}}
    dg.dump_projections(projections, os.path.join(city_dir, "Projection"))
    return projections


class TestDatasetGenerator:
    def test_projection_roundtrip(self, tmp_path):
        projections = synthetic_city(str(tmp_path))
        loaded = dg.load_projections(str(tmp_path / "Projection"))
        for m in ("INS", "SEG", "TD_HF", "BU_HF", "PTS"):
            np.testing.assert_array_equal(loaded["REST"][m],
                                          projections["REST"][m])

    def test_centers(self, tmp_path):
        projections = synthetic_city(str(tmp_path))
        centers = dg.get_centers_from_projections("GOOGLE_EARTH", projections)
        assert 100 in centers and 101 in centers
        np.testing.assert_array_equal(centers[100], centers[101])
        cx, cy, w, h, d = centers[100]
        assert w > 0 and h > 0 and d == 21

    def test_generate_city_artifacts(self, tmp_path):
        city = tmp_path / "TestCity"
        city.mkdir()
        projections = synthetic_city(str(city))
        pose = {
            "id": 0, "tx": 20.0, "ty": 48.0, "tz": 30.0,
        }
        quat = __import__(
            "gaussiancity_tpu.inference.pipeline",
            fromlist=["get_quat_from_look_at"],
        ).get_quat_from_look_at(
            np.array([20.0, 48.0, 30.0]), np.array([48.0, 48.0, 1.0]))
        pose.update(qx=quat[0], qy=quat[1], qz=quat[2], qw=quat[3])
        dg.save_camera_poses(str(city / "CameraPoses.csv"), [pose])
        dg.generate_city("GOOGLE_EARTH", str(city),
                         vol_shape=(128, 128, 48))
        assert (city / "CENTERS.pkl").exists()
        assert (city / "InstanceImage" / "0000.png").exists()
        assert (city / "Points" / "0000.pkl").exists()
        with open(city / "Points" / "0000.pkl", "rb") as fp:
            data = pickle.load(fp)
        assert set(data.keys()) == {"prj", "vpm", "msk", "pts"}
        pts = data["pts"]
        assert pts.shape[1] == 5 and len(pts) > 0
        # vpm bijectivity (reference: dataset_generator.py:1619-1620)
        assert data["vpm"].max() == len(pts) - 1
        assert len(np.unique(data["vpm"])) == len(pts)
        # visible instances come from the maps
        assert np.isin(np.unique(pts[:, 4]),
                       [1, 100, 101, 102, 103, 104, 105]).all()

    def test_view_frustum_cords(self):
        cords = dg.get_view_frustum_cords(
            np.array([10.0, 10.0]), np.array([200.0, 30.0]), 100, 0.4)
        assert cords.shape == (5, 2)
        # E3 midpoint == cam + dir * patch
        mid = (cords[1] + cords[2]) / 2
        d = np.array([190.0, 20.0])
        d = d / np.linalg.norm(d)
        np.testing.assert_allclose(mid, np.array([10, 10]) + d * 100, atol=1.5)


class TestSkyPoints:
    def test_sky_points(self):
        pts = dg.get_sky_points(
            np.array([[0.0, 0.0], [100.0, 0.0]]), cam_z=20.0,
            cam_fov_y=0.3, patch_size=100, scale=4, class_id=5)
        assert pts.shape[1] == 5
        assert (pts[:, 4] == 5).all()
        assert (pts[:, 3] == 4).all()
        # spans the camera altitude band
        assert pts[:, 2].min() <= 20 <= pts[:, 2].max()
