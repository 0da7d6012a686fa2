# -*- coding: utf-8 -*-
"""Offline dataset-generation CLI: raw download -> training artifacts
(reference: scripts/dataset_generator.py main, :1453-1727)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))
import generate_dataset as gd  # noqa: E402

from gaussiancity_tpu.data import dataset_generator as dg  # noqa: E402
from gaussiancity_tpu.data import kitti_ingest as ki  # noqa: E402
from test_kitti_ingest import _bbox_vertices, _xml_annotation  # noqa: E402
from test_osm_ingest import make_capture  # noqa: E402


def _kitti_download(tmp_path):
    """Minimal raw KITTI-360 download: one drive, 3 frames (one without
    a semantic map -> dropped), bbox XML, calibration, poses."""
    from PIL import Image

    drive = "2013_05_28_drive_0000_sync"
    rgb_dir = tmp_path / "data_2d_raw" / drive / "image_00" / "data_rect"
    seg_dir = (tmp_path / "data_2d_semantics" / "train" / drive /
               "image_00" / "semantic")
    pose_dir = tmp_path / "data_poses" / drive
    calib = tmp_path / "calibration"
    bbox_dir = tmp_path / "data_3d_bboxes" / "train_full"
    for d in (rgb_dir, seg_dir, pose_dir, calib, bbox_dir):
        d.mkdir(parents=True)

    img = Image.fromarray(np.zeros((4, 4), np.uint8))
    for f in (0, 10, 20):
        img.save(rgb_dir / ("%010d.png" % f))
    for f in (0, 10):  # frame 20 has no semantic map
        img.save(seg_dir / ("%010d.png" % f))

    # camera at (10, 1, 2) m looking along +y over the scene below
    fwd = np.array([0.0, 1.0, 0.0])
    right = np.array([1.0, 0.0, 0.0])
    down = np.array([0.0, 0.0, -1.0])
    rows = []
    for i, f in enumerate((0, 10, 20)):
        Rt = np.eye(4)
        Rt[:3, :3] = np.stack([right, down, fwd], axis=-1)
        Rt[:3, 3] = [10.0, 1.0 + i, 2.0]
        rows.append(np.concatenate([[f], Rt.reshape(-1)]))
    np.savetxt(pose_dir / "cam0_to_world.txt", np.array(rows))

    (calib / "perspective.txt").write_text(
        "P_rect_00: 552.554 0 682.049 0 0 552.554 238.769 0 0 0 1 0\n"
        "S_rect_00: 1408 376\n")

    cube_f = ki._prism_faces(4)
    bldg = _bbox_vertices(4, 6, 9, offset=(0, 4, 0.5))
    road = _bbox_vertices(20, 3, 0.8, offset=(0, 10, 0.9))
    xml = ("<opencv_storage>"
           + _xml_annotation("object1", "building", bldg, cube_f)
           + _xml_annotation("object2", "road", road, cube_f)
           + "</opencv_storage>")
    (bbox_dir / f"{drive}.xml").write_text(xml)
    return str(tmp_path), drive


class TestReorganize:
    def test_filters_and_idempotent(self, tmp_path):
        root, drive = _kitti_download(tmp_path)
        out = ki.reorganize_kitti_360(root)
        assert out == os.path.join(root, "processed")
        footage = sorted(os.listdir(os.path.join(out, drive, "footage")))
        assert footage == ["0000000000.png", "0000000010.png"]
        poses = np.loadtxt(os.path.join(out, drive, "cam0_to_world.txt"))
        assert np.atleast_2d(poses).shape[0] == 2  # frame 20 dropped
        # DONE marker short-circuits
        os.remove(os.path.join(out, drive, "footage", "0000000000.png"))
        assert ki.reorganize_kitti_360(root) == out
        assert not os.path.exists(
            os.path.join(out, drive, "footage", "0000000000.png"))


class TestGoogleEarthCLI:
    def test_projections_and_poses(self, tmp_path):
        cap, osm = make_capture(tmp_path)
        # camera path json (recover_google_earth_poses input)
        city = os.path.basename(cap)
        frames = [{"coordinate": {"longitude": 10.0, "latitude": 45.0,
                                  "altitude": 120.0 + i},
                   "fovVertical": 22.5}
                  for i in range(3)]
        with open(os.path.join(cap, f"{city}.json"), "w") as fp:
            json.dump({"width": 960, "height": 540,
                       "cameraFrames": frames}, fp)

        gd.main(["-d", "GOOGLE_EARTH", "--data-dir", str(tmp_path),
                 "--osm-dir", osm, "--city", city, "--skip-views"])

        proj_dir = os.path.join(cap, "Projection")
        maps = dg.load_projections(proj_dir)
        P = dg.CONSTANTS["GOOGLE_EARTH"]["MAP_SIZE"]
        assert maps["REST"]["SEG"].shape == (P, P)
        with open(os.path.join(proj_dir, "metadata.json")) as fp:
            meta = json.load(fp)
        assert "target" in meta and "resolution" in meta
        with open(os.path.join(cap, "CameraPoses.csv")) as fp:
            lines = fp.read().splitlines()
        assert len(lines) == 4  # header + 3 frames
        with open(os.path.join(cap, "CameraRig.json")) as fp:
            rig = json.load(fp)
        assert rig["sensor_size"] == [960, 540]


class TestKitti360CLI:
    def test_end_to_end(self, tmp_path):
        root, drive = _kitti_download(tmp_path)
        gd.main(["-d", "KITTI_360", "--data-dir", root, "--city", drive,
                 "--vol-shape", "256", "256", "128"])
        city_dir = os.path.join(root, "processed", drive)
        maps = dg.load_projections(os.path.join(city_dir, "Projection"))
        assert "REST" in maps and maps["REST"]["INS"].max() >= 100
        with open(os.path.join(city_dir, "CameraPoses.csv")) as fp:
            assert len(fp.read().splitlines()) == 3  # header + 2 kept
        pts_dir = os.path.join(city_dir, "Points")
        pkls = sorted(os.listdir(pts_dir))
        assert pkls == ["0000000000.pkl", "0000000010.pkl"]
        import pickle
        with open(os.path.join(pts_dir, pkls[0]), "rb") as fp:
            data = pickle.load(fp)
        assert set(data) == {"prj", "vpm", "msk", "pts"}
        assert len(data["pts"]) > 0
        assert (os.path.exists(os.path.join(
            city_dir, "InstanceImage", "0000000000.png")))
