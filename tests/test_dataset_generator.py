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


class TestCentersVectorized:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        P = 64
        ins = np.ones((P, P), np.int16)
        for b in range(5):
            x0, y0 = rng.integers(2, P - 12, 2)
            w0, h0 = rng.integers(3, 10, 2)
            ins[y0: y0 + h0, x0: x0 + w0] = 100 + 2 * b
        td = rng.integers(1, 30, (P, P)).astype(np.int16)
        projections = {"REST": {"INS": ins, "SEG": ins.copy(), "TD_HF": td,
                                "BU_HF": np.zeros_like(td),
                                "PTS": np.ones_like(td)}}
        centers = dg.get_centers_from_projections("GOOGLE_EARTH", projections)
        for i in np.unique(ins):
            i = int(i)
            if i < 100:
                np.testing.assert_allclose(
                    centers[i], [P / 2, P / 2, P, P, td.max()])
            else:
                ys, xs = np.nonzero(ins == i)
                want = [(xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2,
                        xs.max() - xs.min(), ys.max() - ys.min(),
                        td[ins == i].max() + 1]
                np.testing.assert_allclose(centers[i], want, err_msg=str(i))
                np.testing.assert_array_equal(centers[i], centers[i + 1])

    def test_stuff_height_merges_across_categories(self):
        mk = lambda h: {"INS": np.full((8, 8), 1, np.int16),
                        "SEG": np.full((8, 8), 1, np.int16),
                        "TD_HF": np.full((8, 8), h, np.int16),
                        "BU_HF": np.zeros((8, 8), np.int16),
                        "PTS": np.ones((8, 8), np.int16)}
        centers = dg.get_centers_from_projections(
            "GOOGLE_EARTH", {"REST": mk(5), "FWY": mk(11)})
        assert centers[1][-1] == 11


class TestLocalProjections:
    def _proj(self, P=32):
        return {"SEG": np.arange(P * P, dtype=np.uint16).reshape(P, P) % 7,
                "TD_HF": np.arange(P * P, dtype=np.uint16).reshape(P, P)}

    def test_in_bounds_window(self):
        proj = self._proj()
        cords = np.array([[16, 16], [20, 20], [12, 20]])
        out = dg.get_local_projections(proj, cords, 8)
        cx, cy = 16, 18  # int mean of the three anchors
        np.testing.assert_array_equal(out["tlp"], [cx - 4, cy - 4])
        np.testing.assert_array_equal(
            out["TD_HF"], proj["TD_HF"][cy - 4: cy + 4, cx - 4: cx + 4])
        assert out["SEG"].shape == (8, 8)

    def test_low_edge_zero_pads_both_maps(self):
        proj = self._proj()
        cords = np.array([[1, 1], [3, 2], [2, 3]])
        out = dg.get_local_projections(proj, cords, 8)
        np.testing.assert_array_equal(out["tlp"], [0, 0])
        # window [-2, 6) x [-2, 6): two leading rows/cols of zeros
        assert (out["TD_HF"][:2] == 0).all()
        assert (out["TD_HF"][:, :2] == 0).all()
        np.testing.assert_array_equal(out["TD_HF"][2:, 2:],
                                      proj["TD_HF"][:6, :6])
        # the fixed alignment: SEG gets the same window as TD_HF
        np.testing.assert_array_equal(out["SEG"][2:, 2:].astype(np.int64),
                                      proj["SEG"][:6, :6].astype(np.int64))

    def test_high_edge_clips_and_stretches(self):
        proj = self._proj()
        cords = np.array([[30, 30], [31, 28], [28, 31]])
        out = dg.get_local_projections(proj, cords, 8)
        assert out["TD_HF"].shape == (8, 8)
        # clipped 5x6 source stretched back up: corner value preserved
        assert out["TD_HF"][0, 0] == proj["TD_HF"][25, 25]


class TestLookAtQuat:
    def test_matches_scipy(self):
        import scipy.spatial.transform as sst

        from gaussiancity_tpu.inference.pipeline import get_quat_from_look_at

        rng = np.random.default_rng(3)
        for _ in range(50):
            pos = rng.uniform(-100, 100, 3)
            tgt = rng.uniform(-100, 100, 3)
            if np.linalg.norm((tgt - pos)[:2]) < 1e-3:
                continue
            q = get_quat_from_look_at(pos, tgt)
            f = tgt - pos
            f = f / np.linalg.norm(f)
            r = np.cross([0, 0, 1.0], f)
            r = r / np.linalg.norm(r)
            R = np.stack([f, r, np.cross(f, r)], axis=1)
            q_ref = sst.Rotation.from_matrix(R).as_quat()
            # same rotation up to global sign
            assert (np.allclose(q, q_ref, atol=1e-9)
                    or np.allclose(q, -q_ref, atol=1e-9))

    def test_roundtrip_matrix(self):
        from gaussiancity_tpu.camera import (
            matrix_to_quat_xyzw, quat_xyzw_to_matrix,
        )

        rng = np.random.default_rng(4)
        for _ in range(100):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            R = quat_xyzw_to_matrix(q)
            q2 = matrix_to_quat_xyzw(R)
            assert (np.allclose(q, q2, atol=1e-12)
                    or np.allclose(q, -q2, atol=1e-12))
