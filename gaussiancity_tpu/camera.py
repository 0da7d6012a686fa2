# -*- coding: utf-8 -*-
"""Camera model for the TPU rasterizer.

Reproduces the reference wrapper's conventions bit-for-bit
(reference: extensions/diff_gaussian_rasterization/__init__.py:326-402):

- ``K -> FoV``:    fov = 2 * atan2(sensor, 2 * focal)
- OpenGL-style projection matrix built from (fx, fy, cx, cy, near, far)
- camera pose given as (position, quaternion (qx, qy, qz, qw)); the rotation
  columns are permuted [F|R|U] -> [R|U|F] before building the w2c matrix
- the full projective transform applied to points is ``P @ w2c`` (the
  reference stores transposed matrices and multiplies row-vectors; here we
  keep plain math convention: column vectors, left-multiplied)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    """Static per-rasterization camera description (all host-side floats /
    small arrays; safe to close over in a jitted function)."""

    img_h: int
    img_w: int
    tan_fovx: float
    tan_fovy: float
    focal_x: float
    focal_y: float
    view_matrix: jnp.ndarray  # [4, 4] w2c
    full_proj: jnp.ndarray  # [4, 4] == P @ w2c
    cam_pos: jnp.ndarray  # [3]


def intrinsic_to_fov(focal_length: float, img_size: float) -> float:
    # reference: dgr/__init__.py:326-331
    return 2.0 * np.arctan2(img_size, 2.0 * focal_length)


def projection_matrix(
    K: np.ndarray, sensor_size: Tuple[int, int], z_near: float, z_far: float
) -> np.ndarray:
    """OpenGL-style projection (reference: dgr/__init__.py:333-347).

    sensor_size is (W, H).
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    W, H = sensor_size
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * fx / W
    P[1, 1] = 2.0 * fy / H
    P[0, 2] = 2.0 * cx / W - 1.0
    P[1, 2] = 2.0 * cy / H - 1.0
    P[2, 2] = -(z_far + z_near) / (z_far - z_near)
    P[3, 2] = -1.0
    P[2, 3] = -2.0 * z_far * z_near / (z_far - z_near)
    return P


def quat_xyzw_to_matrix(q):
    """Rotation matrix from scipy-convention quaternion (x, y, z, w).

    Matches scipy.spatial.transform.Rotation.from_quat(q).as_matrix()
    (used by the reference at dgr/__init__.py:355). Works for numpy or jnp.
    """
    xp = jnp if isinstance(q, jnp.ndarray) else np
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = xp.where(n > 0, 2.0 / n, 0.0) if xp is jnp else (2.0 / n if n > 0 else 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    rows = [
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ]
    if xp is jnp:
        return jnp.stack([jnp.stack(r) for r in rows])
    return np.array(rows, dtype=np.float64)


def matrix_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """Quaternion (x, y, z, w) from a rotation matrix — inverse of
    ``quat_xyzw_to_matrix``.  Shepperd's method: build the quaternion from
    the largest of (trace, R00, R11, R22) for numerical stability; the sign
    convention (w >= 0) matches scipy's ``Rotation.as_quat``.
    """
    R = np.asarray(R, np.float64)
    m00, m11, m22 = R[0, 0], R[1, 1], R[2, 2]
    tr = m00 + m11 + m22
    choices = np.array([tr, m00, m11, m22])
    k = int(np.argmax(choices))
    if k == 0:
        s = 2.0 * np.sqrt(1.0 + tr)
        q = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1], 0.25 * s * s]) / s
    else:
        i = k - 1
        j, l = (i + 1) % 3, (i + 2) % 3
        s = 2.0 * np.sqrt(1.0 + R[i, i] - R[j, j] - R[l, l])
        q = np.empty(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[l] = (R[l, i] + R[i, l]) / s
        q[3] = (R[l, j] - R[j, l]) / s
    if q[3] < 0:
        q = -q
    return q


def world_to_camera(cam_position, cam_quaternion, xp=np):
    """w2c matrix with the reference's [F|R|U] -> [R|U|F] column swap
    (reference: dgr/__init__.py:349-368)."""
    R = quat_xyzw_to_matrix(xp.asarray(cam_quaternion, dtype=xp.float64)
                            if xp is np else cam_quaternion)
    R = R[:, [1, 2, 0]]  # [F|R|U] -> [R|U|F]
    t = xp.asarray(cam_position)
    Rt = xp.zeros((4, 4), dtype=xp.float32) if xp is np else jnp.zeros((4, 4))
    if xp is np:
        Rt[:3, :3] = R.T
        Rt[:3, 3] = -R.T @ np.asarray(cam_position, dtype=np.float64)
        Rt[3, 3] = 1.0
        return Rt.astype(np.float32)
    Rt = jnp.zeros((4, 4), dtype=jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(-R.T @ t)
    Rt = Rt.at[3, 3].set(1.0)
    return Rt


class CameraModel:
    """Shared-intrinsics camera: the TPU analogue of
    GaussianRasterizerWrapper's camera half (reference: dgr/__init__.py:276-402).

    Per-frame extrinsics produce a `CameraParams` consumed by the rasterizer.
    """

    def __init__(
        self,
        K,
        sensor_size: Tuple[int, int],
        z_near: float = 0.01,
        z_far: float = 50000.0,
    ):
        self.K = np.asarray(K, dtype=np.float64).reshape(3, 3)
        self.sensor_size = tuple(int(s) for s in sensor_size)  # (W, H)
        self.z_near = z_near
        self.z_far = z_far
        self.fov_x = intrinsic_to_fov(self.K[0, 0], self.sensor_size[0])
        self.fov_y = intrinsic_to_fov(self.K[1, 1], self.sensor_size[1])
        self.P = projection_matrix(self.K, self.sensor_size, z_near, z_far)

    def params(self, cam_position, cam_quaternion) -> CameraParams:
        """Build CameraParams from pose. Host-side (numpy) path."""
        w2c = world_to_camera(np.asarray(cam_position), np.asarray(cam_quaternion))
        full = self.P @ w2c
        c2w = np.linalg.inv(w2c)
        W, H = self.sensor_size
        return CameraParams(
            img_h=H,
            img_w=W,
            tan_fovx=float(np.tan(self.fov_x * 0.5)),
            tan_fovy=float(np.tan(self.fov_y * 0.5)),
            focal_x=float(W / (2.0 * np.tan(self.fov_x * 0.5))),
            focal_y=float(H / (2.0 * np.tan(self.fov_y * 0.5))),
            view_matrix=jnp.asarray(w2c, dtype=jnp.float32),
            full_proj=jnp.asarray(full, dtype=jnp.float32),
            cam_pos=jnp.asarray(c2w[:3, 3], dtype=jnp.float32),
        )

    def params_traced(self, cam_position, cam_quaternion) -> CameraParams:
        """Build CameraParams from traced (device) pose arrays — jittable."""
        w2c = world_to_camera(cam_position, cam_quaternion, xp=jnp)
        full = jnp.asarray(self.P) @ w2c
        # cam_pos = -R^T t of w2c == inverse translation
        R = w2c[:3, :3]
        t = w2c[:3, 3]
        cam_pos = -R.T @ t
        W, H = self.sensor_size
        return CameraParams(
            img_h=H,
            img_w=W,
            tan_fovx=float(np.tan(self.fov_x * 0.5)),
            tan_fovy=float(np.tan(self.fov_y * 0.5)),
            focal_x=float(W / (2.0 * np.tan(self.fov_x * 0.5))),
            focal_y=float(H / (2.0 * np.tan(self.fov_y * 0.5))),
            view_matrix=w2c,
            full_proj=full,
            cam_pos=cam_pos,
        )
