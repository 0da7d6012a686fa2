# -*- coding: utf-8 -*-
"""Raw Google Earth + OSM ingestion -> projection maps."""

import json
import os

import numpy as np
import pytest

from gaussiancity_tpu.data import osm_ingest as oi
from gaussiancity_tpu.data.dataset_generator import CLASSES, CONSTANTS


class TestInstanceMap:
    def test_components_become_even_ids(self):
        cls = CLASSES["GOOGLE_EARTH"]
        seg = np.full((32, 32), cls["ROAD"], np.uint8)
        seg[2:8, 2:8] = cls["BLDG_FACADE"]
        seg[20:28, 20:30] = cls["BLDG_FACADE"]
        # touching only diagonally -> separate components (4-connectivity)
        seg[8, 8] = cls["BLDG_FACADE"]
        ins, stats = oi.build_instance_map(seg)
        ids = np.unique(ins[seg == cls["BLDG_FACADE"]])
        assert (ids >= 200).all() and (ids % 2 == 0).all()
        assert len(ids) == 3  # diagonal pixel is its own component
        # non-building pixels keep their semantic ids
        assert (ins[seg == cls["ROAD"]] == cls["ROAD"]).all()

    def test_construction_merged_before_labeling(self, tmp_path):
        from PIL import Image

        cls = CLASSES["GOOGLE_EARTH"]
        d = tmp_path / "osm" / "City"
        d.mkdir(parents=True)
        seg = np.full((16, 16), cls["GREEN_LANDS"], np.uint8)
        seg[4:8, 4:8] = cls["CONSTRUCTION"]
        Image.fromarray(seg, mode="L").save(d / "seg.png")
        Image.fromarray(np.full((16, 16), 7, np.uint16)).save(d / "hf.png")
        (d / "metadata.json").write_text(json.dumps(
            {"resolution": 1.0, "bounds": {"xmin": 0, "ymin": 0}}))
        td, seg2, ins, meta = oi.load_osm_city(str(tmp_path / "osm"), "City")
        assert (seg2[4:8, 4:8] == cls["BLDG_FACADE"]).all()
        assert (ins[4:8, 4:8] >= 200).all()


class TestPointStrideMask:
    def test_strides_match_bruteforce(self):
        cls = CLASSES["GOOGLE_EARTH"]
        rng = np.random.default_rng(0)
        seg = rng.choice([cls["NULL"], cls["ROAD"], cls["WATER"],
                          cls["BLDG_FACADE"]], (40, 40))
        got = oi.point_stride_mask(seg)
        # brute force: per class, lattice of its stride
        from gaussiancity_tpu.data.dataset_generator import SCALES

        inv = {v: k for k, v in cls.items()}
        want = np.zeros_like(got)
        for c in np.unique(seg):
            name = inv[int(c)]
            if name == "NULL":
                continue
            stride = SCALES["GOOGLE_EARTH"].get(name, 1)
            lattice = np.zeros_like(got)
            lattice[::stride, ::stride] = True
            want |= lattice & (seg == c)
        np.testing.assert_array_equal(got, want)
        assert not got[seg == cls["NULL"]].any()


class TestRegistry:
    def test_ids_stable_across_captures(self):
        reg = oi.BuildingInstanceRegistry()
        m1 = np.array([[1, 300], [302, 302]])
        r1 = reg.reassign(m1)
        assert r1[0, 0] == 1
        id_300 = r1[0, 1]
        assert id_300 >= 100 and id_300 % 2 == 0
        # second capture sees building 300 again plus a new one
        m2 = np.array([[300, 310]])
        r2 = reg.reassign(m2)
        assert r2[0, 0] == id_300  # stable
        assert r2[0, 1] not in (r1.flatten().tolist())  # fresh even id
        assert r2[0, 1] % 2 == 0


def make_capture(tmp_path, city="TestCity-01-capture"):
    """Synthetic OSM render + Google Earth Studio project pair."""
    from PIL import Image

    cls = CLASSES["GOOGLE_EARTH"]
    P = 4096
    osm_city = "-".join(city.split("-")[:2])
    osm = tmp_path / "osm" / osm_city
    osm.mkdir(parents=True)
    rng = np.random.default_rng(0)
    seg = np.full((P, P), cls["ROAD"], np.uint8)
    for _ in range(20):
        x, y = rng.integers(100, P - 130, 2)
        seg[y: y + 24, x: x + 30] = cls["BLDG_FACADE"]
    hf = np.where(seg == cls["BLDG_FACADE"], 25, 2).astype(np.uint16)
    Image.fromarray(seg, mode="L").save(osm / "seg.png")
    Image.fromarray(hf).save(osm / "hf.png")
    # target lnglat such that the projected xy lands mid-map
    lng, lat = 10.0, 45.0
    x, y = oi.lnglat_to_web_mercator_xy(lng, lat, 1.0)
    meta = {"resolution": 1.0,
            "bounds": {"xmin": float(x) - P / 2, "ymin": float(y) - P / 2}}
    (osm / "metadata.json").write_text(json.dumps(meta))

    cap = tmp_path / city
    cap.mkdir()
    esp = {"scenes": [{"attributes": [
        {"type": "cameraGroup", "attributes": [
            {"type": "cameraTargetEffect", "attributes": [
                {"type": "poi", "attributes": [
                    {"type": "longitudePOI",
                     "value": {"relative": (lng + 180.0) / 360.0}},
                    {"type": "latitudePOI", "value": {"relative": 0.4}},
                    {"type": "altitudePOI", "value": {"relative": 99.0}},
                ]}]}]}]}]}
    (cap / f"{city}.esp").write_text(json.dumps(esp))
    (cap / "metadata.json").write_text(json.dumps(
        {"clat": lat, "elevation": 5}))
    return str(cap), str(tmp_path / "osm")


class TestGoogleEarthProjections:
    def test_full_ingest(self, tmp_path):
        cap, osm = make_capture(tmp_path)
        meta, proj = oi.google_earth_projections(cap, osm, _cache={})
        P = CONSTANTS["GOOGLE_EARTH"]["MAP_SIZE"]
        rest = proj["REST"]
        assert rest["SEG"].shape == (P, P)
        assert rest["INS"].shape == (P, P)
        assert rest["TD_HF"].shape == (P, P)
        # elevation applied
        assert rest["TD_HF"].min() >= 7  # 2 + elevation 5
        # target is the window center
        assert abs(meta["target"]["x"] - 2048.0) < 2
        assert abs(meta["target"]["y"] - 2048.0) < 2
        assert meta["target"]["z"] == 100.0  # altitudePOI + 1
        # buildings got even ids >= 100 and PTS lattice is nonempty
        cls = CLASSES["GOOGLE_EARTH"]
        bldg_ids = np.unique(rest["INS"][rest["SEG"] == cls["BLDG_FACADE"]])
        assert len(bldg_ids) > 0
        assert (bldg_ids >= 100).all() and (bldg_ids % 2 == 0).all()
        assert rest["PTS"].sum() > 0

    def test_feeds_generate_city(self, tmp_path):
        """Ingested projections flow through centers + extrusion +
        visibility (the full offline pipeline on raw inputs)."""
        from gaussiancity_tpu.data import dataset_generator as dg

        cap, osm = make_capture(tmp_path)
        meta, proj = oi.google_earth_projections(cap, osm, _cache={})
        # shrink window for test speed: take a 96^2 crop containing bldgs
        cls = CLASSES["GOOGLE_EARTH"]
        ys, xs = np.nonzero(proj["REST"]["SEG"] == cls["BLDG_FACADE"])
        cy, cx = int(ys[0]), int(xs[0])
        y0 = max(0, cy - 48)
        x0 = max(0, cx - 48)
        small = {"REST": {k: np.ascontiguousarray(
            v[y0: y0 + 96, x0: x0 + 96]).astype(np.int32)
            for k, v in proj["REST"].items()}}
        centers = dg.get_centers_from_projections("GOOGLE_EARTH", small)
        assert any(i >= 100 for i in centers)
        pts = dg.get_points_from_projections("GOOGLE_EARTH", small)
        assert len(pts) > 0 and pts.shape[1] == 5
