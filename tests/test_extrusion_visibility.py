# -*- coding: utf-8 -*-
"""Extrusion + visibility tests: jnp dense extruder vs NumPy mirror of the
CPU reference, volume scatter, DDA raycast vs a scalar NumPy DDA."""

import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.ops.extrusion import (
    GOOGLE_EARTH_CLASS_SCALES, SegInsRelation, extrude_points,
    extrude_points_np,
)
from gaussiancity_tpu.ops.visibility import (
    points_to_volume, ray_voxel_intersection,
)


def make_maps(seed=0, H=24, W=24):
    rng = np.random.default_rng(seed)
    ins = np.ones((H, W), np.int32)  # road
    # a building footprint with instance 100 (facade, even)
    ins[6:14, 8:16] = 100
    # water corner
    ins[18:, 18:] = 5
    td = np.full((H, W), 2, np.int32)
    td[6:14, 8:16] = 12  # building height
    bu = np.zeros((H, W), np.int32)
    pts = np.ones((H, W), bool)
    pts[::3, 1::2] = rng.random((len(range(0, H, 3)), len(range(1, W, 2)))) > 0.3
    return ins, td, bu, pts


class TestExtrusion:
    def test_dense_matches_numpy_mirror(self):
        rel = SegInsRelation()
        ins, td, bu, pts = make_maps()
        want = extrude_points_np(ins, td, bu, pts, rel,
                                 GOOGLE_EARTH_CLASS_SCALES)
        got, valid, overflow = extrude_points(
            jnp.asarray(ins), jnp.asarray(td), jnp.asarray(bu),
            jnp.asarray(pts), rel, GOOGLE_EARTH_CLASS_SCALES,
            d_max=16, n_max=4096,
        )
        got = np.asarray(got)[np.asarray(valid)]
        assert int(overflow) == 0
        assert len(got) == len(want), (len(got), len(want))
        np.testing.assert_array_equal(got, want)

    def test_roof_recovery(self):
        rel = SegInsRelation()
        ins, td, bu, pts = make_maps()
        got, valid, _ = extrude_points(
            jnp.asarray(ins), jnp.asarray(td), jnp.asarray(bu),
            jnp.asarray(pts), rel, GOOGLE_EARTH_CLASS_SCALES,
            d_max=16, n_max=4096,
        )
        got = np.asarray(got)[np.asarray(valid)]
        bldg = got[got[:, 4] >= 100]
        # top voxels of the facade get the odd roof id 101
        assert (bldg[:, 4] == 101).any()
        roof = bldg[bldg[:, 4] == 101]
        assert (roof[:, 2] == 12).all()  # only at the top of the column

    def test_overflow_reported(self):
        rel = SegInsRelation()
        ins, td, bu, pts = make_maps()
        _, valid, overflow = extrude_points(
            jnp.asarray(ins), jnp.asarray(td), jnp.asarray(bu),
            jnp.asarray(pts), rel, GOOGLE_EARTH_CLASS_SCALES,
            d_max=16, n_max=8,
        )
        assert int(overflow) > 0
        assert int(np.asarray(valid).sum()) == 8


def numpy_dda(vol, ori, rd, max_steps=500):
    """Scalar mirror of the CUDA DDA (ray_voxel_intersection.cu:96-217)."""
    dims = vol.shape
    axis_int = np.floor(ori).astype(int)
    axis_t = np.empty(3)
    for i in range(3):
        if rd[i] > 0:
            axis_t[i] = (axis_int[i] + 1 - ori[i]) / rd[i]
        elif rd[i] < 0:
            axis_t[i] = (axis_int[i] - ori[i]) / rd[i]
        else:
            axis_t[i] = np.inf
    for _ in range(max_steps):
        if axis_t[0] <= axis_t[1] and axis_t[0] <= axis_t[2]:
            ax = 0
        elif axis_t[1] <= axis_t[2]:
            ax = 1
        else:
            ax = 2
        tnow = axis_t[ax]
        step = 1 if rd[ax] > 0 else -1
        axis_int[ax] += step
        if step > 0 and axis_int[ax] >= dims[ax]:
            return 0, np.inf
        if step < 0 and axis_int[ax] < 0:
            return 0, np.inf
        if step > 0:
            axis_t[ax] = (axis_int[ax] + 1 - ori[ax]) / rd[ax]
        else:
            axis_t[ax] = (axis_int[ax] - ori[ax]) / rd[ax]
        if np.all((axis_int >= 0) & (axis_int < np.asarray(dims))):
            blk = vol[tuple(axis_int)]
            if blk != 0:
                return int(blk), tnow
    return 0, np.inf


class TestVisibility:
    def test_points_to_volume_box_fill(self):
        pts = jnp.asarray([[2, 3, 1], [0, 0, 0]], jnp.int32)
        ids = jnp.asarray([7, 9], jnp.int32)
        scales = jnp.asarray([[2, 2, 2], [1, 1, 1]], jnp.int32)
        vol = np.asarray(points_to_volume(pts, ids, scales, 8, 8, 8))
        # volume[y, x, z]
        assert vol[3, 2, 1] == 7 and vol[4, 3, 2] == 7
        assert vol[5, 2, 1] == 0  # outside the 2-box
        assert vol[0, 0, 0] == 9
        assert vol.sum() == 7 * 8 + 9

    def test_raycast_matches_scalar_dda(self):
        rng = np.random.default_rng(3)
        vol = np.zeros((16, 16, 16), np.int32)
        occ = rng.random((16, 16, 16)) > 0.93
        vol[occ] = rng.integers(1, 100, occ.sum())
        ori = np.array([2.3, 7.7, 8.1], np.float32)
        cam_dir = np.array([1.0, 0.1, -0.2], np.float32)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        H, W = 12, 16
        f = 10.0
        c = (H / 2.0, W / 2.0)
        res = ray_voxel_intersection(
            jnp.asarray(vol), jnp.asarray(ori), jnp.asarray(cam_dir),
            jnp.asarray(up), f, c, (H, W))
        ids = np.asarray(res.voxel_id)
        ts = np.asarray(res.depth)
        rds = np.asarray(res.raydirs)
        for py in range(0, H, 3):
            for px in range(0, W, 5):
                want_id, want_t = numpy_dda(vol, ori, rds[py, px])
                assert ids[py, px] == want_id, (py, px)
                if want_id != 0:
                    np.testing.assert_allclose(ts[py, px], want_t, rtol=1e-5)

    def test_wall_hit(self):
        vol = np.zeros((16, 32, 16), np.int32)
        vol[:, 20, :] = 5  # wall at x=20 (volume [y, x, z])
        res = ray_voxel_intersection(
            jnp.asarray(vol),
            jnp.asarray([8.0, 2.0, 8.0]),  # origin (y, x, z)
            jnp.asarray([0.0, 1.0, 0.0]),  # looking +x
            jnp.asarray([0.0, 0.0, 1.0]),
            20.0, (4.0, 4.0), (8, 8))
        ids = np.asarray(res.voxel_id)
        assert (ids == 5).all()

    def test_raycast_sky_skip_matches_scalar_dda(self):
        # Camera high above the occupied slab: the analytic sky-skip and
        # bit-packed occupancy march must reproduce the naive DDA exactly
        # (incl. upward-pointing rays -> miss, grazing rays, and depth t
        # measured from the true origin).
        rng = np.random.default_rng(7)
        vol = np.zeros((24, 24, 40), np.int32)
        occ = rng.random((24, 24, 6)) > 0.7  # occupied only at z < 6
        vol[:, :, :6][occ] = rng.integers(1, 50, occ.sum())
        ori = np.array([12.2, 11.7, 35.4], np.float32)  # far above ztop
        cam_dir = np.array([0.4, 0.3, -1.0], np.float32)  # looking down
        up = np.array([0.0, 0.0, 1.0], np.float32)
        H, W = 10, 14
        f = 4.0  # wide FoV: some rays point up (miss), some graze
        c = (H / 2.0, W / 2.0)
        res = ray_voxel_intersection(
            jnp.asarray(vol), jnp.asarray(ori), jnp.asarray(cam_dir),
            jnp.asarray(up), f, c, (H, W))
        ids = np.asarray(res.voxel_id)
        ts = np.asarray(res.depth)
        rds = np.asarray(res.raydirs)
        n_hit = 0
        for py in range(H):
            for px in range(W):
                want_id, want_t = numpy_dda(vol, ori, rds[py, px])
                assert ids[py, px] == want_id, (py, px)
                if want_id != 0:
                    n_hit += 1
                    np.testing.assert_allclose(ts[py, px], want_t,
                                               rtol=1e-4)
        assert n_hit > 10  # the scene is actually visible

    def test_survivor_compaction_is_exact(self):
        # The two-phase compacted march must be bit-identical to the
        # single-phase march: compaction only reorders WHEN rays march,
        # never what they test.
        rng = np.random.default_rng(21)
        vol = np.zeros((40, 40, 48), np.int32)
        occ = rng.random((40, 40, 8)) > 0.9
        vol[:, :, :8][occ] = rng.integers(1, 50, occ.sum())
        vol[:, :, 0] = 9  # ground
        ori = np.array([20.2, 3.7, 30.4], np.float32)
        cam_dir = np.array([0.2, 1.0, -0.35], np.float32)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        H, W = 16, 20
        args = (jnp.asarray(vol), jnp.asarray(ori), jnp.asarray(cam_dir),
                jnp.asarray(up), 6.0, (H / 2.0, W / 2.0), (H, W))
        # max_steps = 40+40+48+3 = 131 > 8, so several compaction points
        # genuinely split the march mid-flight
        base = ray_voxel_intersection(*args, compact_after=None)
        for k in (8, 32, 64, (8, 32), (16, 48, 96)):
            two = ray_voxel_intersection(*args, compact_after=k)
            np.testing.assert_array_equal(np.asarray(base.voxel_id),
                                          np.asarray(two.voxel_id))
            np.testing.assert_array_equal(np.asarray(base.depth),
                                          np.asarray(two.depth))
