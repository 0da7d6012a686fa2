# -*- coding: utf-8 -*-
"""BEV footprint extrusion: projection maps -> shell voxel points.

TPU-native re-design of the reference's extrusion pair
(reference: extensions/footprint_extruder/footprint_extruder.cpp:100-222 —
the CPU point-list extruder, and extensions/voxlib/maps_to_volume.cu — the
fused GPU variant used by the HF demo):

- ``extrude_dense``: fully vectorized jnp over a dense (H, W, D) z-grid —
  no per-pixel z-walk loops.  The per-pixel walk ``k = BU, BU+s, ... <= TD``
  becomes the mask ``(k - BU) % s == 0``; the hollow-shell border test
  becomes shifted-array comparisons per distinct scale value.  Returns a
  boolean emit mask + per-voxel instance ids (with roof-id recovery), from
  which either a padded point list (``extrude_points``) or an id volume is
  derived.
- ``extrude_points_np``: a NumPy mirror of the CPU extruder for offline
  data prep parity (same iteration order: row-major pixels, ascending z —
  footprint_extruder.cpp:176-204).

Semantics mirrored exactly:
  - emit only where PTS mask is set (cpp:181-184)
  - semantic id: < BLDG_INS_MIN_ID -> itself; >= CAR_INS_MIN_ID -> CAR;
    else BLDG_FACADE (cpp:88-98)
  - border test: top-of-column (z > TD - s), bottom (z == BU, when
    include_btm_pts), map edge, or any 8-neighbor at stride s differing in
    INS or TD (cpp:100-136)
  - roof recovery: top-of-column facade voxels get instance += 1
    (cpp:194-198)
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SegInsRelation(NamedTuple):
    """(reference: scripts/dataset_generator.py:984-1005)"""

    bldg_ins_min_id: int = 100
    roof_ins_offset: int = 1
    bldg_facade_semantic_id: int = 2
    bldg_roof_semantic_id: int = 7
    car_ins_min_id: int = 32767
    car_semantic_id: int = 32767


# class-id -> extrusion scale (reference: dataset_generator.py:68-87,
# GOOGLE_EARTH; index = class id per CLASSES table :42-66)
GOOGLE_EARTH_CLASS_SCALES = (1, 2, 1, 2, 1, 4, 2, 1)  # NULL..BLDG_ROOF
KITTI_360_CLASS_SCALES = (1, 2, 1, 1, 1, 4, 2, 1)


def semantic_ids(instance: jnp.ndarray, rel: SegInsRelation) -> jnp.ndarray:
    sem = jnp.where(
        instance >= rel.car_ins_min_id,
        rel.car_semantic_id,
        jnp.where(instance >= rel.bldg_ins_min_id,
                  rel.bldg_facade_semantic_id, instance),
    )
    return sem


def _neighbor_same(m: jnp.ndarray, s: int) -> jnp.ndarray:
    """True where all 8 neighbors at stride s equal the center. Out-of-range
    neighbors never matter: callers force border=True near edges first
    (cpp:131-133)."""
    H, W = m.shape
    pad = jnp.pad(m, s, mode="edge")
    same = jnp.ones((H, W), dtype=bool)
    for dy in (-s, 0, s):
        for dx in (-s, 0, s):
            if dy == 0 and dx == 0:
                continue
            nb = pad[s + dy: s + dy + H, s + dx: s + dx + W]
            same = same & (nb == m)
    return same


def extrude_dense(
    ins_map: jnp.ndarray,  # [H, W] int32 instance ids (densified)
    td_hf: jnp.ndarray,  # [H, W] int32 top-down height field
    bu_hf: jnp.ndarray,  # [H, W] int32 bottom-up height field
    pts_map: jnp.ndarray,  # [H, W] bool point-stride mask
    rel: SegInsRelation,
    class_scales: Sequence[int],
    d_max: int,
    include_btm_pts: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense extrusion. Returns (emit [H, W, D] bool, instance [H, W] int32
    with per-voxel roof recovery applied lazily via ``roof_mask``).

    The returned tuple is (emit_mask, voxel_instance) where voxel_instance
    is [H, W, D] including the roof-id offset for top facade voxels.
    """
    H, W = ins_map.shape
    sem = semantic_ids(ins_map, rel)
    scales_table = jnp.asarray(class_scales, dtype=jnp.int32)
    # semantic ids >= table length (car sentinel 32767) clamp into the table;
    # datasets define CAR inside the table when used.
    sem_c = jnp.clip(sem, 0, len(class_scales) - 1)
    scale = scales_table[sem_c]  # [H, W]

    ks = jnp.arange(d_max, dtype=jnp.int32)[None, None, :]  # [1, 1, D]
    bu = bu_hf[..., None]
    td = td_hf[..., None]
    s3 = scale[..., None]
    on_walk = (ks >= bu) & (ks <= td) & ((ks - bu) % s3 == 0)

    # border tests
    is_top = ks > (td - s3)  # [H, W, D]
    is_btm = (ks == bu) if include_btm_pts else jnp.zeros_like(on_walk)
    yy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :]
    at_edge = (
        (xx < scale) | (xx >= W - scale - 1) | (yy < scale) | (yy >= H - scale - 1)
    )

    # neighbor-difference per distinct scale value, then select per pixel
    distinct = sorted(set(int(s) for s in class_scales))
    nb_same = jnp.ones((H, W), dtype=bool)
    for s in distinct:
        same_s = _neighbor_same(ins_map, s) & _neighbor_same(td_hf, s)
        nb_same = jnp.where(scale == s, same_s, nb_same)

    border = is_top | is_btm | (at_edge | ~nb_same)[..., None]
    emit = pts_map[..., None] & on_walk & border

    roof = is_top & (sem == rel.bldg_facade_semantic_id)[..., None]
    vox_ins = jnp.where(
        roof, ins_map[..., None] + rel.roof_ins_offset, ins_map[..., None]
    )
    vox_ins = jnp.broadcast_to(vox_ins, emit.shape)
    return emit, vox_ins


def extrude_points(
    ins_map, td_hf, bu_hf, pts_map, rel: SegInsRelation,
    class_scales: Sequence[int], d_max: int, n_max: int,
    include_btm_pts: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense extrusion -> padded point list [n_max, 5]
    (x, y, z, scale, instance — the reference's uint16 layout,
    footprint_extruder.cpp:201) + validity mask + overflow count.

    Point order matches the CPU extruder: row-major pixels, ascending z.
    """
    H, W = ins_map.shape
    emit, vox_ins = extrude_dense(
        ins_map, td_hf, bu_hf, pts_map, rel, class_scales, d_max,
        include_btm_pts,
    )
    sem = semantic_ids(ins_map, rel)
    scales_table = jnp.asarray(class_scales, dtype=jnp.int32)
    scale = scales_table[jnp.clip(sem, 0, len(class_scales) - 1)]

    flat_emit = emit.reshape(-1)  # [(H*W*D)] in (y, x, z) row-major order
    n_emitted = jnp.sum(flat_emit.astype(jnp.int32))
    # stable compaction: positions of emitted voxels in order
    pos = jnp.cumsum(flat_emit.astype(jnp.int32)) - 1  # target slot per voxel
    slot = jnp.where(flat_emit, pos, n_max)  # invalid -> dumped slot
    slot = jnp.minimum(slot, n_max)  # overflow also dumped

    D = d_max
    yy = jnp.arange(H, dtype=jnp.int32)[:, None, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    kk = jnp.arange(D, dtype=jnp.int32)[None, None, :]
    attrs = jnp.stack([
        jnp.broadcast_to(xx, emit.shape).reshape(-1),
        jnp.broadcast_to(yy, emit.shape).reshape(-1),
        jnp.broadcast_to(kk, emit.shape).reshape(-1),
        jnp.broadcast_to(scale[..., None], emit.shape).reshape(-1),
        vox_ins.reshape(-1),
    ], axis=-1)  # [(HWD), 5]

    out = jnp.zeros((n_max + 1, 5), dtype=jnp.int32).at[slot].set(attrs)
    out = out[:n_max]
    valid = jnp.arange(n_max) < jnp.minimum(n_emitted, n_max)
    overflow = jnp.maximum(n_emitted - n_max, 0)
    return out, valid, overflow


def extrude_points_np(
    ins_map: np.ndarray, td_hf: np.ndarray, bu_hf: np.ndarray,
    pts_map: np.ndarray, rel: SegInsRelation,
    class_scales: Sequence[int], include_btm_pts: bool = True,
) -> np.ndarray:
    """NumPy mirror of footprint_extruder.cpp (offline host path).
    Returns [N, 5] int arrays (x, y, z, scale, instance)."""
    H, W = ins_map.shape
    ins = ins_map.astype(np.int32)
    td = td_hf.astype(np.int32)
    bu = bu_hf.astype(np.int32)
    sem = np.where(
        ins >= rel.car_ins_min_id, rel.car_semantic_id,
        np.where(ins >= rel.bldg_ins_min_id, rel.bldg_facade_semantic_id, ins),
    )
    table = np.asarray(class_scales, dtype=np.int32)
    scale = table[np.clip(sem, 0, len(table) - 1)]

    def nb_same(m, s):
        pad = np.pad(m, s, mode="edge")
        same = np.ones((H, W), dtype=bool)
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dy == 0 and dx == 0:
                    continue
                same &= pad[s + dy: s + dy + H, s + dx: s + dx + W] == m
        return same

    nbs = np.ones((H, W), dtype=bool)
    for s in sorted(set(int(v) for v in class_scales)):
        nbs_s = nb_same(ins, s) & nb_same(td, s)
        nbs = np.where(scale == s, nbs_s, nbs)

    pts = []
    for i in range(H):
        for j in range(W):
            if not pts_map[i, j]:
                continue
            s = int(scale[i, j])
            iid = int(ins[i, j])
            at_edge = j < s or j >= W - s - 1 or i < s or i >= H - s - 1
            for k in range(int(bu[i, j]), int(td[i, j]) + 1, s):
                is_top = k > td[i, j] - s
                is_btm = include_btm_pts and k == bu[i, j]
                if not (is_top or is_btm or at_edge or not nbs[i, j]):
                    continue
                out_id = iid
                if is_top and sem[i, j] == rel.bldg_facade_semantic_id:
                    out_id += rel.roof_ins_offset
                pts.append((j, i, k, s, out_id))
    return np.asarray(pts, dtype=np.int32).reshape(-1, 5)
