# -*- coding: utf-8 -*-
"""Offline dataset generator (reference: scripts/dataset_generator.py).

Produces the training artifact schema from per-city projection maps:
``Projection/*.png`` -> per-view ``InstanceImage/%0Nd.png`` +
``Points/%0Nd.pkl`` ({prj: local TD_HF/SEG[/tlp], vpm, msk, pts[N,5]}) +
``CENTERS.pkl`` + ``CameraPoses.csv``.

The raw-OSM / KITTI-xml ingestion half of the reference
(dataset_generator.py:189-440, inherited from CityDreamer's data tooling)
is out of scope for this build: it consumes external map exports.  This
module covers everything downstream of the projection maps, which is what
training/inference parity requires.

TPU-native split: footprint extrusion runs in the native C++ extruder
(falling back to NumPy), visibility (volume scatter + DDA raycast) runs as
an XLA program on the accelerator.
"""

from __future__ import annotations

import csv
import logging
import math
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from gaussiancity_tpu.ops.extrusion import SegInsRelation, extrude_points_np
from gaussiancity_tpu.utils import helpers

# (reference: dataset_generator.py:42-118)
CLASSES = {
    "GOOGLE_EARTH": {
        "NULL": 0, "ROAD": 1, "BLDG_FACADE": 2, "GREEN_LANDS": 3,
        "CONSTRUCTION": 4, "WATER": 5, "ZONE": 6, "BLDG_ROOF": 7,
    },
    "KITTI_360": {
        "NULL": 0, "ROAD": 1, "BLDG_FACADE": 2, "CAR": 3, "VEGETATION": 4,
        "SKY": 5, "ZONE": 6, "BLDG_ROOF": 7,
    },
}
SCALES = {
    "GOOGLE_EARTH": {"ROAD": 2, "BLDG_FACADE": 1, "BLDG_ROOF": 1,
                     "GREEN_LANDS": 2, "CONSTRUCTION": 1, "WATER": 4,
                     "ZONE": 2},
    "KITTI_360": {"ROAD": 2, "BLDG_FACADE": 1, "CAR": 1, "VEGETATION": 1,
                  "SKY": 4, "ZONE": 2, "BLDG_ROOF": 1},
}
CONSTANTS = {
    "GOOGLE_EARTH": {
        "SCALE": 1, "WATER_Z": 0, "MAP_SIZE": 2048, "PATCH_SIZE": 2048,
        "PROJECTION_SIZE": 2048, "BLDG_INST_RANGE": [100, 16384],
        "IMAGE_WIDTH": 960, "IMAGE_HEIGHT": 540,
        "SEG_MAP_PATTERN": "seg/%s_%02d.png",
        "OUT_FILE_NAME_PATTERN": "%04d",
    },
    "KITTI_360": {
        "SCALE": 1, "MAP_SIZE": 0, "PATCH_SIZE": 1280,
        "PROJECTION_SIZE": 2048, "BLDG_INST_RANGE": [100, 10000],
        "CAR_INST_RANGE": [10000, 16384],
        "SEG_MAP_PATTERN": "seg/%010d.png",
        "OUT_FILE_NAME_PATTERN": "%010d",
    },
    "ROOF_INS_OFFSET": 1,
}


def class_scale_table(dataset: str):
    cls = CLASSES[dataset]
    scl = SCALES[dataset]
    table = [1] * len(cls)
    for name, cid in cls.items():
        if name in scl:
            table[cid] = scl[name]
    return tuple(table)


def get_seg_ins_relations(dataset: str) -> SegInsRelation:
    """(reference: dataset_generator.py:984-1005)"""
    c = CONSTANTS[dataset]
    cls = CLASSES[dataset]
    return SegInsRelation(
        bldg_ins_min_id=c["BLDG_INST_RANGE"][0],
        roof_ins_offset=CONSTANTS["ROOF_INS_OFFSET"],
        bldg_facade_semantic_id=cls["BLDG_FACADE"],
        bldg_roof_semantic_id=cls.get("BLDG_ROOF", cls["BLDG_FACADE"]),
        car_ins_min_id=c.get("CAR_INST_RANGE", [32767])[0],
        car_semantic_id=cls.get("CAR", 32767),
    )


def load_projections(proj_dir: str) -> Dict[str, Dict[str, np.ndarray]]:
    """(reference: dataset_generator.py:909-933)"""
    from PIL import Image

    CATEGORIES = ["CAR", "FWY", "VEGT", "REST"]
    MAP_NAMES = ["INS", "SEG", "TD_HF", "BU_HF", "PTS"]
    projections: Dict[str, Dict[str, np.ndarray]] = {}
    for c in CATEGORIES:
        for m in MAP_NAMES:
            fpath = os.path.join(proj_dir, f"{c}-{m}.png")
            if not os.path.exists(fpath):
                continue
            projections.setdefault(c, {})[m] = np.array(
                Image.open(fpath)).astype(np.int16)
    return projections


def dump_projections(projections, proj_dir: str) -> None:
    """(reference: dataset_generator.py:891-906)"""
    from PIL import Image

    os.makedirs(proj_dir, exist_ok=True)
    for c, maps in projections.items():
        for m, arr in maps.items():
            img = Image.fromarray(np.asarray(arr).astype(np.uint16))
            img.save(os.path.join(proj_dir, f"{c}-{m}.png"))


def get_centers_from_projections(dataset: str, projections
                                 ) -> Dict[int, np.ndarray]:
    """Per-instance bounding centers {id: [cx, cy, w, h, max_z]}.

    Buildings get the tight bounding box of their footprint pixels and
    their masked height (+1); stuff classes (roads, water, sky, ...) span
    the full map with the map-wide max height, merged across categories.
    Each facade id is mirrored to its roof id (roof = facade + 1).

    Behavior matches reference scripts/dataset_generator.py:936-981, but
    computed with per-label scatter min/max reductions over the pixel grid
    in one pass instead of a cv2-contour loop per instance.
    """
    bldg_min, bldg_max = CONSTANTS[dataset]["BLDG_INST_RANGE"]
    sky_id = CLASSES[dataset].get("SKY")
    centers: Dict[int, np.ndarray] = {}
    for p in projections.values():
        H, W = p["INS"].shape
        ins_flat = p["INS"].ravel()
        ids, label = np.unique(ins_flat, return_inverse=True)
        n = len(ids)
        # one scatter-reduce per bbox edge / height, all instances at once
        cols = np.tile(np.arange(W), H)
        rows = np.repeat(np.arange(H), W)
        x_lo = np.full(n, W, np.int64)
        x_hi = np.full(n, -1, np.int64)
        y_lo = np.full(n, H, np.int64)
        y_hi = np.full(n, -1, np.int64)
        z_hi = np.full(n, np.iinfo(np.int64).min)
        np.minimum.at(x_lo, label, cols)
        np.maximum.at(x_hi, label, cols)
        np.minimum.at(y_lo, label, rows)
        np.maximum.at(y_hi, label, rows)
        np.maximum.at(z_hi, label, p["TD_HF"].ravel().astype(np.int64))
        map_z = float(p["TD_HF"].max())

        stuff = {int(i) for i in ids if i < bldg_min}
        if sky_id is not None:
            stuff.add(sky_id)
        for i in sorted(stuff):
            z = map_z if i not in centers else max(map_z, centers[i][-1])
            centers[i] = np.array([W / 2, H / 2, W, H, z], np.float32)
        for k in np.flatnonzero(ids >= bldg_min):
            i = int(ids[k])
            centers[i] = np.array(
                [(x_lo[k] + x_hi[k]) / 2, (y_lo[k] + y_hi[k]) / 2,
                 x_hi[k] - x_lo[k], y_hi[k] - y_lo[k], z_hi[k] + 1],
                np.float32)
            if i < bldg_max:
                centers[i + 1] = centers[i]
    return centers


def get_view_frustum_cords(cam_pos, cam_look_at, patch_size: int,
                           fov_rad: float) -> np.ndarray:
    """2D footprint of the view frustum as 5 int16 corner points.

    A ray from the camera at angle ±fov off the look axis crosses the far
    edge (the perpendicular at forward distance ``patch_size``) at lateral
    offset ``patch_size * tan(fov)`` — so the footprint is the rectangle
    spanned by the axis direction ``d`` and its left normal ``n``.

    Rows: 0 the camera, 1-2 the far-edge endpoints (+n, -n), 3-4 their
    mirror images through the rectangle center (= the near-edge endpoints).
    Behavior matches reference scripts/dataset_generator.py:1157-1195,
    re-derived with direction/normal vectors instead of slope-intercept
    case analysis (no vertical/horizontal special cases needed).
    """
    p1 = np.asarray(cam_pos, np.float64)[:2]
    d = np.asarray(cam_look_at, np.float64)[:2] - p1
    d /= np.linalg.norm(d)
    n = np.array([-d[1], d[0]])
    far_mid = p1 + patch_size * d
    half_w = patch_size * math.tan(fov_rad)
    far_a = far_mid + half_w * n
    far_b = far_mid - half_w * n
    center2 = p1 + far_mid  # 2 * rectangle center
    return np.array([p1, far_a, far_b, center2 - far_a, center2 - far_b]
                    ).astype(np.int16)


def get_local_projections(projections, local_cords, map_size: int):
    """Per-view conditioning maps: crop a ``map_size``-square window around
    the view frustum and resize to ``map_size``.

    The window is centered on the integer mean of the camera point and the
    two far-edge corners.  Where it hangs off the low map edge the crop is
    zero-padded; off the high edge it is clipped (and therefore stretched
    by the resize) — matching reference scripts/dataset_generator.py
    :1198-1248.  Deviation: the reference mutates its window bounds while
    padding the first map of its loop, so SEG and TD_HF disagree when the
    window crosses the low edge; here one window is applied to all maps.
    ``tlp`` is the window's top-left corner clamped into the map.
    """
    import cv2

    specs = (("SEG", np.uint8, cv2.INTER_NEAREST),
             ("TD_HF", np.float32, cv2.INTER_AREA))
    local = {}
    for name, dtype, interp in specs:
        full = projections[name]
        if local_cords is None:
            win = full.astype(dtype)
        else:
            anchor = np.asarray([local_cords[0], local_cords[1],
                                 local_cords[2]], np.float64)
            cx, cy = np.mean(anchor, axis=0).astype(np.int32)
            x0, y0 = int(cx) - map_size // 2, int(cy) - map_size // 2
            xs, ys = max(0, x0), max(0, y0)
            win = full[ys: y0 + map_size, xs: x0 + map_size]
            win = np.pad(win, ((ys - y0, 0), (xs - x0, 0))).astype(dtype)
            local["tlp"] = np.array([xs, ys])
        local[name] = cv2.resize(win, (map_size, map_size),
                                 interpolation=interp)
    return local


def get_sky_points(far_plane, cam_z, cam_fov_y, patch_size, scale, class_id):
    """Sky wall: a lattice of SKY-class points along the far-plane edge,
    spanning the vertical band the camera FoV can see.

    One broadcasted (edge-samples x altitudes) grid replaces the
    reference's nested python loops (scripts/dataset_generator.py
    :1334-1351); values and dtype (int16, truncated) are identical.
    """
    a, b = np.asarray(far_plane, np.float64)[:2]
    edge_len = float(np.linalg.norm(b - a))
    steps = np.arange(math.ceil(edge_len / scale), dtype=np.float64)
    xy = a + steps[:, None] * (scale / edge_len) * (b - a)  # [S, 2]
    band = patch_size * math.tan(cam_fov_y)
    zs = np.arange(math.floor(max(0, cam_z - band)),
                   math.ceil(cam_z + band) + 1, scale)  # [Z]
    S, Z = len(steps), len(zs)
    out = np.empty((S, Z, 5), np.float64)
    out[..., 0:2] = xy[:, None, :]
    out[..., 2] = zs[None, :]
    out[..., 3] = scale
    out[..., 4] = class_id
    return out.reshape(-1, 5).astype(np.int16)


def get_points_from_projections(dataset: str, projections,
                                local_cords=None) -> np.ndarray:
    """Extrude all categories (native C++ when available), apply the water
    plane (reference: dataset_generator.py:1251-1272, 1275-1331)."""
    import cv2

    rel = get_seg_ins_relations(dataset)
    table = class_scale_table(dataset)
    water_z = CONSTANTS[dataset].get("WATER_Z", 0)
    try:
        from gaussiancity_tpu.native import extrude_points_native as _ext
    except Exception:
        _ext = None

    out = []
    for c, p in projections.items():
        maps = p
        off_x = off_y = 0
        if local_cords is not None:
            min_x = math.floor(np.min(local_cords[:, 0]))
            max_x = math.ceil(np.max(local_cords[:, 0]))
            min_y = math.floor(np.min(local_cords[:, 1]))
            max_y = math.ceil(np.max(local_cords[:, 1]))
            if min_x < 0:
                max_x -= min_x
                min_x = 0
            if min_y < 0:
                max_y -= min_y
                min_y = 0
            maps = {k: np.ascontiguousarray(
                v[min_y:max_y, min_x:max_x]).astype(np.int16)
                for k, v in p.items()}
            mask = np.zeros_like(maps["PTS"], dtype=np.int16)
            cv2.fillPoly(mask, [np.array(
                local_cords - np.array([min_x, min_y]), dtype=np.int32)], 1)
            maps["PTS"] = maps["PTS"] * mask
            off_x, off_y = min_x, min_y

        include_btm = c != "REST"
        extrude = _ext or extrude_points_np
        pts = extrude(
            np.asarray(maps["INS"], np.int32),
            np.asarray(maps["TD_HF"], np.int32),
            np.asarray(maps["BU_HF"], np.int32),
            np.asarray(maps["PTS"], bool),
            rel, table, include_btm)
        if len(pts):
            pts = np.asarray(pts, np.int32)
            pts[:, 0] += off_x
            pts[:, 1] += off_y
            if c == "REST" and "WATER" in CLASSES[dataset]:
                pts[pts[:, 4] == CLASSES[dataset]["WATER"], 2] = water_z
            out.append(pts)
    return np.concatenate(out, axis=0) if out else np.empty((0, 5), np.int32)


def get_seg_map_from_ins_map(dataset: str, ins_map: np.ndarray) -> np.ndarray:
    """Instance map -> semantic map (bldg even->facade, odd->roof;
    optional car range)."""
    c = CONSTANTS[dataset]
    cls = CLASSES[dataset]
    out = ins_map.astype(np.int64).copy()
    lo, hi = c["BLDG_INST_RANGE"]
    in_bldg = (out >= lo) & (out < hi)
    even = in_bldg & (out % 2 == 0)
    odd = in_bldg & (out % 2 == 1)
    out[even] = cls["BLDG_FACADE"]
    out[odd] = cls["BLDG_ROOF"]
    if "CAR_INST_RANGE" in c:
        lo, hi = c["CAR_INST_RANGE"]
        out[(out >= lo) & (out < hi)] = cls["CAR"]
    return out


def generate_view(dataset: str, projections, cam_pos, cam_quat,
                  vol_shape=(640, 640, 256),
                  seg_map: Optional[np.ndarray] = None):
    """One view: extrusion -> visibility -> vp reindex
    (reference: dataset_generator.py:1545-1686).

    Returns dict {prj, vpm, msk, pts} matching the Points pkl schema.
    """
    import jax.numpy as jnp

    from gaussiancity_tpu.ops import visibility as vis

    c = CONSTANTS[dataset]
    K = None
    fov_x = helpers_intrinsic_fov(dataset, 0)
    cam_look_at = np.asarray(cam_pos[:3], np.float64) + look_dir(cam_quat) * 1000

    frustum = None
    if dataset == "KITTI_360":
        frustum = get_view_frustum_cords(
            cam_pos, cam_look_at, c["PATCH_SIZE"], fov_x / 2)

    local = get_local_projections(
        projections["REST"], frustum, c["PROJECTION_SIZE"])
    points = get_points_from_projections(dataset, projections, frustum)

    # visibility on device
    scales3 = np.repeat(points[:, 3:4], 3, axis=1).astype(np.int32)
    mins = points[:, :3].min(0)
    offsets = np.array([mins[0], mins[1], mins[2] - 1], np.int32)
    Kmat = camera_intrinsics(dataset)
    W, H = sensor_size(dataset)
    vp_map, ins_map = vis.get_visible_points(
        jnp.asarray(points, jnp.int32), jnp.asarray(scales3),
        jnp.asarray(np.asarray(cam_pos, np.float32)),
        jnp.asarray(np.asarray(cam_quat, np.float32)),
        float(Kmat[0, 0]), (float(Kmat[1, 2]), float(Kmat[0, 2])), (H, W),
        vol_shape, jnp.asarray(offsets))
    vp_map = np.asarray(vp_map)
    ins_map = np.asarray(ins_map)
    if dataset == "KITTI_360":
        vp_map = np.fliplr(vp_map)
        ins_map = np.fliplr(ins_map)

    vp_idx = np.sort(np.unique(vp_map))
    vp_idx = vp_idx[vp_idx >= 0]
    points = points[vp_idx]
    vp_map = np.searchsorted(vp_idx, vp_map)
    msk = (get_seg_map_from_ins_map(dataset, ins_map) == seg_map
           if seg_map is not None
           else np.ones_like(ins_map, dtype=bool))
    return {
        "prj": local,
        "vpm": vp_map,
        "msk": msk,
        "pts": points.astype(np.int64),
    }, ins_map


# --- small camera helpers -------------------------------------------------

_DEFAULT_K = {
    "GOOGLE_EARTH": np.array(
        [[1528.1469407006614, 0, 480], [0, 1528.1469407006614, 270],
         [0, 0, 1]]),
    "KITTI_360": np.array(
        [[552.554261, 0, 682.049453], [0, 552.554261, 238.769549],
         [0, 0, 1]]),
}
_SENSORS = {"GOOGLE_EARTH": (960, 540), "KITTI_360": (1408, 376)}


def camera_intrinsics(dataset: str) -> np.ndarray:
    return _DEFAULT_K[dataset]


def sensor_size(dataset: str):
    return _SENSORS[dataset]


def helpers_intrinsic_fov(dataset: str, axis: int) -> float:
    K = _DEFAULT_K[dataset]
    s = _SENSORS[dataset]
    from gaussiancity_tpu.camera import intrinsic_to_fov

    return intrinsic_to_fov(K[axis, axis], s[axis])


def look_dir(cam_quat) -> np.ndarray:
    from gaussiancity_tpu.camera import quat_xyzw_to_matrix

    return quat_xyzw_to_matrix(np.asarray(cam_quat, np.float64))[:, 0]


def save_camera_poses(path: str, cam_poses: List[dict]) -> None:
    with open(path, "w", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=["id", "tx", "ty", "tz",
                                           "qx", "qy", "qz", "qw"])
        w.writeheader()
        w.writerows(cam_poses)


def generate_city(dataset: str, city_dir: str,
                  cam_poses: Optional[List[dict]] = None,
                  vol_shape=(640, 640, 256)) -> None:
    """Process one city directory: Projection/*.png (+ optional seg/ +
    CameraPoses.csv) -> CENTERS.pkl + InstanceImage/ + Points/."""
    from PIL import Image

    proj_dir = os.path.join(city_dir, "Projection")
    projections = load_projections(proj_dir)
    centers = get_centers_from_projections(dataset, projections)
    with open(os.path.join(city_dir, "CENTERS.pkl"), "wb") as fp:
        pickle.dump(centers, fp)

    if cam_poses is None:
        poses_path = os.path.join(city_dir, "CameraPoses.csv")
        with open(poses_path) as fp:
            cam_poses = [dict(r) for r in csv.DictReader(fp)]

    ins_dir = os.path.join(city_dir, "InstanceImage")
    pts_dir = os.path.join(city_dir, "Points")
    os.makedirs(ins_dir, exist_ok=True)
    os.makedirs(pts_dir, exist_ok=True)
    pattern = CONSTANTS[dataset]["OUT_FILE_NAME_PATTERN"]
    for r in cam_poses:
        cam_pos = np.array([float(r["tx"]), float(r["ty"]), float(r["tz"])])
        cam_quat = np.array([float(r["qx"]), float(r["qy"]), float(r["qz"]),
                             float(r["qw"])])
        data, ins_map = generate_view(dataset, projections, cam_pos,
                                      cam_quat, vol_shape)
        name = pattern % int(float(r["id"]))
        Image.fromarray(ins_map.astype(np.uint16)).save(
            os.path.join(ins_dir, f"{name}.png"))
        with open(os.path.join(pts_dir, f"{name}.pkl"), "wb") as fp:
            pickle.dump(data, fp)
        logging.info("view %s: %d points", name, len(data["pts"]))
