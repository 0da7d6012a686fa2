# -*- coding: utf-8 -*-
"""Camera-pose recovery from raw captures (Google Earth json / KITTI-360
calibration+extrinsics) -> CameraPoses rows."""

import json
import math
import os

import numpy as np

from gaussiancity_tpu.data import camera_recovery as cr


def scalar_lnglat2xy(lng, lat, resolution, zoom_level, tile_size=256):
    # the slippy-map formula, written independently per scalar
    n = 2.0 ** zoom_level
    x = (lng + 180.0) / 360.0 * n * tile_size
    y = (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 \
        * n * tile_size
    return x * resolution, y * resolution


class TestWebMercator:
    def test_matches_scalar_formula(self):
        rng = np.random.default_rng(0)
        lng = rng.uniform(-179, 179, 20)
        lat = rng.uniform(-80, 80, 20)
        x, y = cr.lnglat_to_web_mercator_xy(lng, lat, 1.5, 18)
        for i in range(20):
            xs, ys = scalar_lnglat2xy(lng[i], lat[i], 1.5, 18)
            assert abs(x[i] - xs) < 1e-6 and abs(y[i] - ys) < 1e-6

    def test_monotone_axes(self):
        x1, _ = cr.lnglat_to_web_mercator_xy(10.0, 50.0, 1.0)
        x2, _ = cr.lnglat_to_web_mercator_xy(10.1, 50.0, 1.0)
        assert x2 > x1
        _, y1 = cr.lnglat_to_web_mercator_xy(10.0, 50.0, 1.0)
        _, y2 = cr.lnglat_to_web_mercator_xy(10.0, 50.1, 1.0)
        assert y2 < y1  # y grows southward


class TestGoogleEarthRecovery:
    def _city(self, tmp_path, n_frames=4):
        city = tmp_path / "TestCity"
        city.mkdir()
        frames = []
        for i in range(n_frames):
            frames.append({
                "coordinate": {
                    "longitude": 10.0 + i * 1e-4,
                    "latitude": 50.0 + i * 5e-5,
                    "altitude": 300.0 + i,
                },
                "fovVertical": 22.5,
            })
        settings = {"width": 1920, "height": 1080, "cameraFrames": frames}
        with open(city / "TestCity.json", "w") as fp:
            json.dump(settings, fp)
        return str(city), settings

    def test_rig_and_poses(self, tmp_path):
        city, settings = self._city(tmp_path)
        # target at the first frame's ground position
        tx0, ty0 = cr.lnglat_to_web_mercator_xy(10.0, 50.0, 2.0)
        # target offset horizontally: a straight-down look-at is degenerate
        # for any roll-free z-up convention (reference included)
        metadata = {
            "resolution": 2.0,
            "bounds": {"xmin": float(tx0) - 1000, "ymin": float(ty0) - 1000},
            "target": {"x": 700.0, "y": 950.0, "z": 0.0},
        }
        rig, poses = cr.recover_google_earth_poses(city, metadata)
        K = np.array(rig["intrinsics"]).reshape(3, 3)
        focal_expected = 1080 / 2 / np.tan(np.deg2rad(22.5)) * 2.06
        assert np.isclose(K[0, 0], focal_expected)
        assert np.isclose(K[1, 1], focal_expected)
        assert K[0, 2] == 960 and K[1, 2] == 540
        assert rig["sensor_size"] == [1920, 1080]

        assert len(poses) == 4
        # frame 0's web-mercator position is (1000, 1000) in map coords,
        # stored relative to the target
        assert abs(poses[0]["tx"] - 300.0) < 1e-6
        assert abs(poses[0]["ty"] - 50.0) < 1e-6
        assert poses[0]["tz"] == 300.0
        # quaternions are unit and the forward axis points at the target
        from gaussiancity_tpu.camera import quat_xyzw_to_matrix

        for p in poses:
            q = np.array([p["qx"], p["qy"], p["qz"], p["qw"]])
            assert np.isclose(np.linalg.norm(q), 1.0, atol=1e-9)
            fwd = quat_xyzw_to_matrix(q)[:, 0]
            cam = np.array([
                p["tx"] + metadata["target"]["x"],
                p["ty"] + metadata["target"]["y"], p["tz"]])
            want = np.array([700.0, 950.0, 0.0]) - cam
            want /= np.linalg.norm(want)
            np.testing.assert_allclose(fwd, want, atol=1e-9)


class TestKitti360Recovery:
    def test_roundtrip(self, tmp_path):
        root = tmp_path
        seq = root / "data" / "seq00"
        seq.mkdir(parents=True)
        calib = root / "calibration"
        calib.mkdir()
        with open(calib / "perspective.txt", "w") as fp:
            fp.write("P_rect_00: 552.554 0 682.049 0 0 552.554 238.769 0 "
                     "0 0 1 0\n")
            fp.write("S_rect_00: 1408 376\n")

        # two frames with known rotations: [Right|Down|Forward] columns
        rng = np.random.default_rng(1)
        rows = []
        Rts = []
        for f_idx in (0, 10):
            fwd = rng.normal(size=3)
            fwd[2] = 0.1
            fwd /= np.linalg.norm(fwd)
            # OpenCV-style camera axes: right x down = forward (det +1)
            right = np.cross(fwd, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            R_rdf = np.stack([right, down, fwd], axis=-1)
            assert np.isclose(np.linalg.det(R_rdf), 1.0)
            t = rng.uniform(0, 100, 3)
            Rt = np.eye(4)
            Rt[:3, :3] = R_rdf
            Rt[:3, 3] = t
            Rts.append(Rt)
            rows.append(np.concatenate([[f_idx], Rt.reshape(-1)]))
        np.savetxt(seq / "cam0_to_world.txt", np.array(rows))

        metadata = {"bounds": {"xmin": 5.0, "ymin": -3.0, "zmin": 1.0}}
        rig, poses = cr.recover_kitti_360_poses(str(seq), metadata)
        K = np.array(rig["intrinsics"]).reshape(3, 3)
        assert np.isclose(K[0, 2], 1408 - 682.049)  # mirrored cx
        assert rig["sensor_size"] == [1408, 376]

        from gaussiancity_tpu.camera import quat_xyzw_to_matrix

        for p, Rt in zip(poses, Rts):
            q = np.array([p["qx"], p["qy"], p["qz"], p["qw"]])
            R = quat_xyzw_to_matrix(q)
            # columns must be [Forward | Right | Up(=Down, un-negated)]
            R_rdf = Rt[:3, :3]
            np.testing.assert_allclose(R[:, 0], R_rdf[:, 2], atol=1e-9)
            np.testing.assert_allclose(R[:, 1], R_rdf[:, 0], atol=1e-9)
            np.testing.assert_allclose(R[:, 2], R_rdf[:, 1], atol=1e-9)
            want_t = Rt[:3, 3] / cr.KITTI_360_VOXEL_SIZE - [5.0, -3.0, 1.0]
            np.testing.assert_allclose([p["tx"], p["ty"], p["tz"]], want_t,
                                       atol=1e-9)
        assert poses[1]["id"] == 10
