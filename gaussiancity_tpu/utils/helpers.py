# -*- coding: utf-8 -*-
"""Tensor/palette/point-packing helpers (reference: utils/helpers.py).

All device functions are pure jnp over padded fixed-size arrays with masks.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Palettes & instance-id color codec (reference: utils/helpers.py:44-124)
# ---------------------------------------------------------------------------

MAX_N_INSTANCES = 16384


def get_seg_map_palette() -> np.ndarray:
    palette = np.array([[i, i, i] for i in range(256)])
    palette[:9] = np.array(
        [
            [0, 0, 0],       # empty
            [96, 0, 0],      # road
            [96, 96, 0],     # freeway
            [0, 96, 0],      # car
            [0, 96, 96],     # water
            [0, 0, 96],      # sky
            [96, 96, 96],    # ground
            [96, 0, 96],     # building facade
            [255, 0, 255],   # building roof
        ]
    )
    return palette


def get_ins_seg_map_palette(legacy_palette: np.ndarray, random: bool = True,
                            seed: Optional[int] = None) -> np.ndarray:
    if random:
        rng = np.random.default_rng(seed)
        palette = rng.integers(256, size=(MAX_N_INSTANCES, 3)).astype(np.uint8)
        palette[:9] = legacy_palette[:9]
    else:
        palette = np.array(
            [[i % 4 * 64, i * 4 % 256, (i * 4 // 256) % 256]
             for i in range(MAX_N_INSTANCES)],
            dtype=np.uint8,
        )
    return palette


def get_ins_id(img: np.ndarray) -> np.ndarray:
    """RGB-encoded instance ids -> uint16 ids with CRC check
    (reference: utils/helpers.py:96-104)."""
    instances = img[..., 1].astype(np.int64) + img[..., 2].astype(np.int64) * 256
    instances = np.round(instances / 4).astype(np.uint16)
    error_idx = np.round(img[..., 0] / 64).astype(np.uint8) != instances % 4
    instances[error_idx] = 0
    return instances


def get_ins_colors(obj: np.ndarray, random: bool = True,
                   seed: Optional[int] = 0) -> np.ndarray:
    pal = get_ins_seg_map_palette(get_seg_map_palette(), random=random,
                                  seed=seed)
    return pal[np.asarray(obj) % MAX_N_INSTANCES].astype(np.uint8)


# ---------------------------------------------------------------------------
# Point utilities (device)
# ---------------------------------------------------------------------------


def get_one_hot(classes: jnp.ndarray, n_class: int) -> jnp.ndarray:
    """classes [B, N] or [B, N, 1] int -> [B, N, n_class]
    (reference: utils/helpers.py:127-133)."""
    if classes.ndim == 3:
        classes = classes[..., 0]
    return jax.nn.one_hot(classes.astype(jnp.int32), n_class)


def get_z(key, instances: jnp.ndarray, z_dim: Optional[int],
          max_instances: int = MAX_N_INSTANCES) -> Optional[jnp.ndarray]:
    """Per-point style codes: one z ~ N(0,1) per instance id, gathered to
    points.  Dense replacement for the reference's per-instance dict
    (reference: utils/helpers.py:136-155).

    instances: [B, N] int ids. Returns [B, N, z_dim] or None.

    Note: draws a z row per instance-id slot (id mod max_instances), so
    identical ids share a code — same semantics as the reference's unique()
    loop, without data-dependent shapes.  One table draw + row gather:
    a per-point fold_in(key, id) formulation spawns N independent
    threefry streams and cost ~370 ms/step on-chip at the BLDG recipe;
    the [max_instances, z_dim] table is one 16.8 MB PRNG stream (~2 ms)
    and a small-working-set gather.
    """
    if z_dim is None:
        return None
    idx = (instances % max_instances).astype(jnp.int32)
    table = jax.random.normal(key, (max_instances, z_dim))
    return table[idx]


def get_camera_look_at(cam_position, cam_quaternion, step: float = 1000.0):
    """Point `step` units along the camera forward axis
    (reference: utils/helpers.py:162-164)."""
    from gaussiancity_tpu.camera import quat_xyzw_to_matrix

    R = quat_xyzw_to_matrix(np.asarray(cam_quaternion, np.float64))
    return np.asarray(cam_position, np.float64) + R[:, 0] * step


def repeat_pts(pts: jnp.ndarray, repeat: int = 1) -> jnp.ndarray:
    """Tile points with a fractional repeat-index channel appended
    (reference: utils/helpers.py:175-180). pts: [B, N, C]."""
    b, n, _ = pts.shape
    pts_r = jnp.tile(pts, (1, repeat, 1))
    # the index channel cycles 0, 1/r, ... along the tiled point axis
    # (the reference tiles its [repeat] pattern n times, not per block)
    idx = (jnp.arange(repeat, dtype=pts.dtype) / repeat)
    idx = jnp.tile(idx, n)[None, :, None]
    idx = jnp.broadcast_to(idx, (b, n * repeat, 1))
    return jnp.concatenate([pts_r, idx], axis=-1)


def get_projection_uv(xyz: jnp.ndarray, proj_tlp: Optional[jnp.ndarray],
                      proj_size: float) -> jnp.ndarray:
    """[-1, 1] uv of each point on the projection map
    (reference: utils/helpers.py:183-194). xyz: [B, N, 3]."""
    if proj_tlp is None:
        uv = xyz[..., :2]
    else:
        uv = xyz[..., :2] - proj_tlp[:, None, :]
    uv = uv / proj_size
    return uv * 2.0 - 1.0


def get_point_scales(scales: jnp.ndarray, classes: jnp.ndarray,
                     special_z_scale_classes: Sequence[int] = ()) -> jnp.ndarray:
    """[..., 1] isotropic scale -> [..., 3], z-scale forced to 1 for
    road/water/zone classes (reference: utils/helpers.py:197-223)."""
    if classes.ndim == scales.ndim:
        classes = classes[..., 0]
    scales_3d = jnp.repeat(scales, 3, axis=-1)
    if len(special_z_scale_classes):
        special = jnp.isin(
            classes.astype(jnp.int32),
            jnp.asarray(list(special_z_scale_classes), dtype=jnp.int32),
        )
        scales_3d = scales_3d.at[..., 2].set(
            jnp.where(special, 1.0, scales_3d[..., 2])
        )
    return scales_3d


def get_gaussian_points(xyz: jnp.ndarray, scales: jnp.ndarray,
                        attrs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Pack the 14-channel Gaussian point layout, identity rotation,
    opacity 1 unless predicted (reference: utils/helpers.py:226-247).
    xyz [B,N,3], scales [B,N,3] -> [B,N,14]."""
    B, N = xyz.shape[:2]
    rgb = attrs["rgb"]
    if "xyz" in attrs:
        xyz = xyz + attrs["xyz"]
    if "scale" in attrs:
        scales = scales * attrs["scale"]
    opacity = attrs.get(
        "opacity", jnp.ones((B, N, 1), dtype=xyz.dtype)
    )
    rotations = jnp.concatenate(
        [jnp.ones((B, N, 1), xyz.dtype), jnp.zeros((B, N, 3), xyz.dtype)],
        axis=-1,
    )
    return jnp.concatenate([xyz, opacity, scales, rotations, rgb], axis=-1)


def onehot_to_mask(onehot: jnp.ndarray, ignored_classes: Sequence[int] = ()
                   ) -> jnp.ndarray:
    """argmax over channel dim (NHWC), shifting ids past ignored classes
    (reference: utils/helpers.py:167-172)."""
    mask = jnp.argmax(onehot, axis=-1)
    for ic in ignored_classes:
        mask = jnp.where(mask >= ic, mask + 1, mask)
    return mask


def tensor_to_image(t, mode: str):
    """Host-side conversion for logging (reference: utils/helpers.py:314-324).
    Accepts NHWC or CHW jnp/np arrays."""
    arr = np.asarray(t)
    if mode == "RGB":
        if arr.ndim == 3 and arr.shape[0] == 3:
            arr = arr.transpose(1, 2, 0)
        return arr / 2.0 + 0.5
    if mode == "Mask":
        return arr.squeeze()
    raise ValueError(f"Unknown mode: {mode}")


def dump_ptcloud_ply(path: str, xyz: np.ndarray, rgb: np.ndarray,
                     attrs: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Minimal binary-less PLY writer (reference: utils/helpers.py:273-311 —
    without the plyfile dependency)."""
    attrs = attrs or {}
    xyz = np.asarray(xyz, np.float32).copy()
    rgb = np.asarray(rgb)
    cx = (xyz[:, 0].min() + xyz[:, 0].max()) / 2
    cy = (xyz[:, 1].min() + xyz[:, 1].max()) / 2
    xyz[:, 0] -= np.int16(cx)
    xyz[:, 1] -= np.int16(cy)
    keys = sorted(attrs.keys())
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        for k in keys:
            f.write(f"property float {k}\n")
        f.write("end_header\n")
        for i in range(len(xyz)):
            row = [f"{xyz[i,0]:.4f}", f"{xyz[i,1]:.4f}", f"{xyz[i,2]:.4f}",
                   str(int(rgb[i, 0])), str(int(rgb[i, 1])), str(int(rgb[i, 2]))]
            row += [f"{float(attrs[k][i]):.6f}" for k in keys]
            f.write(" ".join(row) + "\n")
