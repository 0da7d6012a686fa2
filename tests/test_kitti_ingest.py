# -*- coding: utf-8 -*-
"""KITTI-360 raw ingestion: mesh IO, SAT surface voxelizer (vs a
point-sampling oracle), annotation meshes, and the XML -> projection-map
pipeline (reference: scripts/dataset_generator.py:389-830)."""

import os
import struct
import textwrap

import numpy as np
import pytest

from gaussiancity_tpu.data import kitti_ingest as ki
from gaussiancity_tpu.data.dataset_generator import CLASSES, CONSTANTS


# ---------------------------------------------------------------------------
# voxelizer
# ---------------------------------------------------------------------------

def _sample_triangle(tri, n, rng):
    """Uniform samples on a triangle."""
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a, b, c = tri
    return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b \
        + (r1 * r2)[:, None] * c


class TestVoxelizer:
    def test_axis_aligned_square(self):
        # unit square in the z=0.05 plane, voxel 0.1: exactly the 10x10
        # bottom-layer voxels
        v = np.array([[0, 0, 0.05], [1, 0, 0.05], [1, 1, 0.05],
                      [0, 1, 0.05]])
        f = np.array([[0, 1, 2], [0, 2, 3]])
        vox = ki.voxelize_triangle_mesh(v, f, 0.1)
        assert vox[:, 2].max() == 0
        xy = {(int(a), int(b)) for a, b, _ in vox}
        assert xy == {(i, j) for i in range(10) for j in range(10)}

    def test_thin_wall_is_one_voxel_thick(self):
        # vertical wall at x=0.55 inside voxel column i=5
        v = np.array([[0.55, 0, 0], [0.55, 1, 0], [0.55, 1, 1],
                      [0.55, 0, 1]])
        f = np.array([[0, 1, 2], [0, 2, 3]])
        vox = ki.voxelize_triangle_mesh(v, f, 0.1)
        assert (vox[:, 0] == vox[0, 0]).all()

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_triangles_vs_sampling_oracle(self, seed):
        rng = np.random.default_rng(seed)
        v = rng.random((3, 3)) * 2.0
        f = np.array([[0, 1, 2]])
        vs = 0.1
        vox = {tuple(p) for p in ki.voxelize_triangle_mesh(v, f, vs)}
        # every densely-sampled surface point must land in a marked voxel
        origin = v.min(axis=0)
        samples = _sample_triangle(v, 20000, rng)
        cells = np.floor((samples - origin) / vs - 1e-9).astype(int)
        missing = {tuple(c) for c in cells} - vox
        assert not missing
        # and no marked voxel may be farther than one diagonal from the
        # triangle plane (sanity against over-marking)
        n = np.cross(v[1] - v[0], v[2] - v[0])
        n = n / np.linalg.norm(n)
        centers = (np.array(sorted(vox)) + 0.5) * vs + origin
        dist = np.abs((centers - v[0]) @ n)
        assert dist.max() <= np.sqrt(3) * vs / 2 + 1e-9

    def test_closed_box_marks_surface_not_interior(self):
        v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                      for z in (0, 1)], float)
        f = ki._prism_faces(4)
        # build a real box: bottom ring then top ring in loop order
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        verts = np.concatenate([
            np.concatenate([ring, np.zeros((4, 1))], axis=1),
            np.concatenate([ring, np.ones((4, 1))], axis=1)])
        vox = ki.voxelize_triangle_mesh(verts, f, 0.1)
        occ = np.zeros((10, 10, 10), bool)
        occ[tuple(vox.T)] = True
        assert occ[0].all() and occ[-1].all()      # x faces
        assert occ[:, 0].all() and occ[:, -1].all()
        assert occ[..., 0].all() and occ[..., -1].all()
        assert not occ[5, 5, 5]                    # hollow interior


# ---------------------------------------------------------------------------
# mesh IO
# ---------------------------------------------------------------------------

class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path):
        p = tmp_path / "m.obj"
        p.write_text(textwrap.dedent("""\
            # comment
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            f 1 2 3 4
            f 1//1 2/2/2 3
        """))
        v, f = ki.read_triangle_mesh(str(p))
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(
            f, [[0, 1, 2], [0, 2, 3], [0, 1, 2]])

    def test_ply_ascii(self, tmp_path):
        p = tmp_path / "m.ply"
        p.write_text(textwrap.dedent("""\
            ply
            format ascii 1.0
            element vertex 3
            property float x
            property float y
            property float z
            element face 1
            property list uchar int vertex_indices
            end_header
            0 0 0
            1 0 0
            0 1 0
            3 0 1 2
        """))
        v, f = ki.read_triangle_mesh(str(p))
        np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_ply_binary(self, tmp_path):
        p = tmp_path / "m.ply"
        header = textwrap.dedent("""\
            ply
            format binary_little_endian 1.0
            element vertex 3
            property float x
            property float y
            property float z
            element face 1
            property list uchar int vertex_indices
            end_header
        """).encode()
        body = b"".join(struct.pack("<3f", *xyz)
                        for xyz in [(0, 0, 0), (1, 0, 0), (0, 1, 0)])
        body += struct.pack("<B3i", 3, 0, 1, 2)
        p.write_bytes(header + body)
        v, f = ki.read_triangle_mesh(str(p))
        np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        np.testing.assert_array_equal(f, [[0, 1, 2]])


# ---------------------------------------------------------------------------
# annotation meshes
# ---------------------------------------------------------------------------

def _bbox_vertices(w, d, h, angle=0.0, offset=(0.0, 0.0, 0.0)):
    """KITTI-style 8 bbox corners: (bottom, top) pairs sharing XY."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    xy = np.array([[0, 0], [w, 0], [w, d], [0, d]], float) @ R.T
    out = []
    for p in xy:
        out.append([p[0], p[1], 0.0])
        out.append([p[0], p[1], h])
    return np.asarray(out) + np.asarray(offset)


class TestAnnotationMeshes:
    def test_building_gable(self):
        v = _bbox_vertices(w=4.0, d=10.0, h=9.0, angle=0.3)
        verts, faces = ki.make_building_mesh(v)
        assert verts.shape == (10, 3) and len(faces) == 16
        z = verts[:, 2]
        np.testing.assert_allclose(sorted(set(np.round(z, 6))),
                                   [0.0, 9.0 * 0.666, 9.0])
        # the two ridge points sit at the midpoints of the short edges
        ridge = verts[z == 9.0][:, :2]
        assert np.isclose(np.linalg.norm(ridge[0] - ridge[1]), 10.0)

    def test_car_scaling(self):
        # scaling is per WORLD axis (reference :577-580), so use an
        # axis-aligned box where it equals box-local scaling
        v = _bbox_vertices(w=2.0, d=6.0, h=2.0, offset=(5, 3, 1))
        verts, faces = ki.make_car_mesh(v)
        ext = verts.max(axis=0) - verts.min(axis=0)
        np.testing.assert_allclose(ext, [2 * 0.5, 6 * 0.75, 2 * 0.75])
        # cabin roof is the middle half of the long axis
        z = verts[:, 2]
        roof = verts[np.isclose(z, z.max())]
        assert len(roof) == 4

    def test_tree_replacement_and_fallbacks(self, tmp_path):
        # synthetic cone-ish asset (y-up), normalized by the loader
        asset = tmp_path / "tree.obj"
        asset.write_text("v 0 0 0\nv 1 0 0\nv 1 2 0\nv 0 2 1\nf 1 2 3\n"
                         "f 1 3 4\n")
        assets = ki.TreeAssets(str(tmp_path))
        assert assets and len(assets.meshes) == 1
        av, _ = assets.meshes[0]
        assert av[:, 2].min() == 0.0  # re-axised: z is up, rooted at 0

        rng = np.random.default_rng(0)
        v = _bbox_vertices(w=10.0, d=12.0, h=8.0)
        f = ki._prism_faces(4)
        ring = v[[0, 2, 4, 6], :2]
        verts = np.concatenate([
            np.concatenate([ring, np.zeros((4, 1))], axis=1),
            np.concatenate([ring, np.full((4, 1), 8.0)], axis=1)])
        tv, tf = ki.make_tree_mesh(verts, f, assets, rng)
        assert len(tv) > len(verts)  # replaced by >=2 tree instances
        assert tv[:, 2].min() >= 0.0
        # short vegetation keeps its box
        verts_short = verts.copy()
        verts_short[4:, 2] = 1.0
        sv, sf = ki.make_tree_mesh(verts_short, f, assets, rng)
        assert sv is verts_short and sf is f
        # no assets -> fallback
        nv, nf = ki.make_tree_mesh(verts, f, ki.TreeAssets(None), rng)
        assert nv is verts


# ---------------------------------------------------------------------------
# XML -> projections
# ---------------------------------------------------------------------------

def _xml_annotation(tag, label, verts, faces, fs=0, fe=100, dynamic=0):
    def mat(m):
        m = np.asarray(m, float)
        return (f"<rows>{m.shape[0]}</rows><cols>{m.shape[1]}</cols>"
                f"<data>{' '.join(str(x) for x in m.ravel())}</data>")
    eye = np.eye(4)
    return (f"<{tag}><label>{label}</label><dynamic>{dynamic}</dynamic>"
            f"<start_frame>{fs}</start_frame><end_frame>{fe}</end_frame>"
            f"<transform>{mat(eye)}</transform>"
            f"<vertices>{mat(verts)}</vertices>"
            f"<faces>{mat(faces)}</faces></{tag}>")


@pytest.fixture
def city(tmp_path):
    """Synthetic KITTI-360 layout: one drive with a building, a car, a
    road slab, a dynamic car (skipped), and an unknown label (skipped)."""
    drive = "2013_05_28_drive_0000_sync"
    city_dir = tmp_path / "data_2d_raw" / drive
    bbox_dir = tmp_path / "data_3d_bboxes" / "train_full"
    os.makedirs(city_dir)
    os.makedirs(bbox_dir)
    cube_f = ki._prism_faces(4)

    def box(w, d, h, off):
        v = _bbox_vertices(w, d, h, offset=off)
        ring = v[[0, 2, 4, 6], :2]
        verts = np.concatenate([
            np.concatenate([ring, np.full((4, 1), off[2])], axis=1),
            np.concatenate([ring, np.full((4, 1), off[2] + h)], axis=1)])
        return v, verts

    bldg_bbox, _ = box(4, 6, 9, (0, 0, 0.5))
    car_bbox, _ = box(2, 4, 2, (12, 2, 0.2))
    road_bbox, _ = box(20, 3, 0.8, (0, 10, 0.9))
    xml = "<opencv_storage>"
    xml += _xml_annotation("object1", "building", bldg_bbox, cube_f)
    xml += _xml_annotation("object2", "car", car_bbox, cube_f)
    xml += _xml_annotation("object3", "road", road_bbox, cube_f)
    xml += _xml_annotation("object4", "car", car_bbox, cube_f, dynamic=1)
    xml += _xml_annotation("object5", "trafficSign", car_bbox, cube_f)
    xml += "<nontransform><foo>1</foo></nontransform>"
    xml += "</opencv_storage>"
    (bbox_dir / f"{drive}.xml").write_text(xml)
    return str(city_dir)


class TestPipeline:
    def test_parse_filters_and_counters(self, city):
        drive = os.path.basename(city)
        xml = os.path.join(os.path.dirname(os.path.dirname(city)),
                           "data_3d_bboxes", "train_full", f"{drive}.xml")
        ann = ki.parse_kitti_annotations(xml)
        boxes = [b for group in ann.values() for b in group]
        assert len(boxes) == 3  # dynamic + unknown label dropped
        inst = sorted(b["instance"] for b in boxes)
        assert inst == [CLASSES["KITTI_360"]["ROAD"],
                        CONSTANTS["KITTI_360"]["BLDG_INST_RANGE"][0],
                        CONSTANTS["KITTI_360"]["CAR_INST_RANGE"][0]]

    def test_projections_end_to_end(self, city):
        meta, projs = ki.kitti_360_projections(city)
        assert set(projs) == {"REST"}  # no vegetation in the scene
        maps = projs["REST"]
        assert set(maps) == {"PTS", "INS", "SEG", "TD_HF", "BU_HF"}
        ins, seg, td = maps["INS"], maps["SEG"], maps["TD_HF"]
        cls = CLASSES["KITTI_360"]
        # building interior column: facade instance id, height ~ 9.5/0.1
        bid = CONSTANTS["KITTI_360"]["BLDG_INST_RANGE"][0]
        assert (ins == bid).any()
        assert seg[ins == bid].max() == cls["BLDG_FACADE"]
        assert td[ins == bid].max() >= 90
        # car: instance range + semantic CAR
        cid = CONSTANTS["KITTI_360"]["CAR_INST_RANGE"][0]
        assert (ins == cid).any()
        assert (seg[ins == cid] == cls["CAR"]).all()
        # road got the ground shift: top height stays small
        road = ins == cls["ROAD"]
        assert road.any() and td[road].max() <= 17 - 7 + 1
        # PTS lattice only on non-null pixels
        assert not maps["PTS"][seg == cls["NULL"]].any()

    def test_outlier_filter(self):
        filt = ki.OutlierFilter(threshold=10.0)
        assert filt.accept(np.array([0.0, 0.0]))
        assert filt.accept(np.array([5.0, 5.0]))
        assert not filt.accept(np.array([100.0, 0.0]))
        assert filt.accept(np.array([-8.0, 3.0]))

    def test_merge_offsets(self):
        m1 = {"bounds": {"xmin": 0, "ymin": 0, "zmin": 0}}
        m2 = {"bounds": {"xmin": 5, "ymin": 2, "zmin": 3}}
        p = {"PTS": np.ones((4, 4), bool), "INS": np.ones((4, 4), np.int16),
             "SEG": np.ones((4, 4), np.int16),
             "TD_HF": np.ones((4, 4), np.int16),
             "BU_HF": np.ones((4, 4), np.int16)}
        meta, merged = ki.merge_projections(
            {"A": m1, "B": m2}, {"A": {k: v.copy() for k, v in p.items()},
                                 "B": {k: v.copy() for k, v in p.items()}})
        assert meta["bounds"] == {"xmin": 0, "ymin": 0, "zmin": 0}
        a, b = merged["A"], merged["B"]
        assert a["TD_HF"].shape == b["TD_HF"].shape == (7, 10)
        assert a["TD_HF"][0, 0] == 1 and b["TD_HF"][2, 5] == 1 + 3
        assert b["INS"][2, 5] == 1 and b["INS"][0, 0] == 0
