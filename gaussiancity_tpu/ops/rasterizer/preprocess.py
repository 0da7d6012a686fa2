# -*- coding: utf-8 -*-
"""Per-Gaussian preprocessing: projection, EWA 2D covariance, conic, radius.

Pure JAX, fully differentiable — this replaces the reference's
``preprocessCUDA`` kernel and its hand-written backward
(reference: cuda_rasterizer/forward.cu:68-233, backward.cu:140-425).
On TPU the closed-form math autodiffs; no custom kernel is needed here.

TPU layout note: all internal math runs on separate [N] component vectors
(structure-of-arrays) — [N, 3]-shaped elementwise math would waste 42/43 of
every vector register to lane padding.  The packed [N, 16] ``attrs16``
output matches the blend kernels' attribute-row order so the binning gather
is one row-gather.

All functions operate on padded fixed-size arrays with an explicit
validity mask, so every shape is static under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiancity_tpu.camera import CameraParams


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space state (component vectors, all [N])."""

    mx: jnp.ndarray
    my: jnp.ndarray
    conic_a: jnp.ndarray
    conic_b: jnp.ndarray
    conic_c: jnp.ndarray
    opacity: jnp.ndarray
    color_r: jnp.ndarray
    color_g: jnp.ndarray
    color_b: jnp.ndarray
    depth: jnp.ndarray
    radius: jnp.ndarray  # int32 pixel radius (0 => culled)
    valid: jnp.ndarray  # bool — survives culling

    @property
    def mean2d(self) -> jnp.ndarray:  # [N, 2] compatibility view
        return jnp.stack([self.mx, self.my], axis=-1)

    @property
    def conic(self) -> jnp.ndarray:  # [N, 3]
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], axis=-1)

    @property
    def color(self) -> jnp.ndarray:  # [N, 3]
        return jnp.stack([self.color_r, self.color_g, self.color_b], axis=-1)

    def attrs16(self) -> jnp.ndarray:
        """[N, 16] packed rows: mx, my, ca, cb, cc, op, cr, cg, cb2,
        radius, 0*6 — the blend kernels' ATTR layout (blend_pallas.py).
        Row 9 (radius, exact small ints in f32, stop-gradient) feeds the
        16x16 reference-block gate (BlendConsts.ref_gate)."""
        N = self.mx.shape[0]
        zeros = jnp.zeros((N,), dtype=self.mx.dtype)
        return jnp.stack(
            [self.mx, self.my, self.conic_a, self.conic_b, self.conic_c,
             self.opacity, self.color_r, self.color_g, self.color_b,
             self.radius.astype(self.mx.dtype),
             zeros, zeros, zeros, zeros, zeros, zeros], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices from wxyz quaternions [N, 4] (NOT normalized,
    matching the reference: forward.cu:119)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0):
    """World-space 3D covariance Sigma = R S S^T R^T as six [N] component
    vectors (xx, xy, xz, yy, yz, zz) (reference: forward.cu:110-144)."""
    r, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    sx = scales[..., 0] * scale_modifier
    sy = scales[..., 1] * scale_modifier
    sz = scales[..., 2] * scale_modifier
    # rotation matrix rows (standard wxyz convention)
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - r * z)
    r02 = 2.0 * (x * z + r * y)
    r10 = 2.0 * (x * y + r * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - r * x)
    r20 = 2.0 * (x * z - r * y)
    r21 = 2.0 * (y * z + r * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    # M = R diag(s); Sigma = M M^T
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    c_xx = m00 * m00 + m01 * m01 + m02 * m02
    c_xy = m00 * m10 + m01 * m11 + m02 * m12
    c_xz = m00 * m20 + m01 * m21 + m02 * m22
    c_yy = m10 * m10 + m11 * m11 + m12 * m12
    c_yz = m10 * m20 + m11 * m21 + m12 * m22
    c_zz = m20 * m20 + m21 * m21 + m22 * m22
    return c_xx, c_xy, c_xz, c_yy, c_yz, c_zz


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    # reference: auxiliary.h:32-34
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    colors: jnp.ndarray,
    valid_in: jnp.ndarray,
    cam: CameraParams,
    scale_modifier: float = 1.0,
    near_z: float = 0.2,
) -> Preprocessed:
    """Full preprocess for N padded Gaussians (reference: forward.cu:147-233).

    Differentiable w.r.t. means3d, opacities, scales, quats, colors.
    """
    px, py, pz = means3d[..., 0], means3d[..., 1], means3d[..., 2]

    # full projective transform (hom = P@w2c @ [p,1])
    FP = cam.full_proj
    hx = FP[0, 0] * px + FP[0, 1] * py + FP[0, 2] * pz + FP[0, 3]
    hy = FP[1, 0] * px + FP[1, 1] * py + FP[1, 2] * pz + FP[1, 3]
    hw = FP[3, 0] * px + FP[3, 1] * py + FP[3, 2] * pz + FP[3, 3]
    p_w = 1.0 / (hw + 1e-7)

    V = cam.view_matrix
    tx = V[0, 0] * px + V[0, 1] * py + V[0, 2] * pz + V[0, 3]
    ty = V[1, 0] * px + V[1, 1] * py + V[1, 2] * pz + V[1, 3]
    tz = V[2, 0] * px + V[2, 1] * py + V[2, 2] * pz + V[2, 3]

    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = compute_cov3d(
        scales, quats, scale_modifier)

    # EWA 2D covariance (reference: forward.cu:68-105)
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    txc = jnp.clip(tx / tz, -limx, limx) * tz
    tyc = jnp.clip(ty / tz, -limy, limy) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    J00 = cam.focal_x * inv_z
    J02 = -cam.focal_x * txc * inv_z2
    J11 = cam.focal_y * inv_z
    J12 = -cam.focal_y * tyc * inv_z2
    W00, W01, W02 = V[0, 0], V[0, 1], V[0, 2]
    W10, W11, W12 = V[1, 0], V[1, 1], V[1, 2]
    W20, W21, W22 = V[2, 0], V[2, 1], V[2, 2]
    # M = J @ W (rows 0 and 1)
    a0 = J00 * W00 + J02 * W20
    a1 = J00 * W01 + J02 * W21
    a2 = J00 * W02 + J02 * W22
    b0 = J11 * W10 + J12 * W20
    b1 = J11 * W11 + J12 * W21
    b2 = J11 * W12 + J12 * W22
    # Sigma @ a and Sigma @ b
    Sa0 = c_xx * a0 + c_xy * a1 + c_xz * a2
    Sa1 = c_xy * a0 + c_yy * a1 + c_yz * a2
    Sa2 = c_xz * a0 + c_yz * a1 + c_zz * a2
    cov_xx = a0 * Sa0 + a1 * Sa1 + a2 * Sa2 + 0.3
    cov_xy = b0 * Sa0 + b1 * Sa1 + b2 * Sa2
    Sb0 = c_xx * b0 + c_xy * b1 + c_xz * b2
    Sb1 = c_xy * b0 + c_yy * b1 + c_yz * b2
    Sb2 = c_xz * b0 + c_yz * b1 + c_zz * b2
    cov_yy = b0 * Sb0 + b1 * Sb1 + b2 * Sb2 + 0.3

    det = cov_xx * cov_yy - cov_xy * cov_xy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic_a = cov_yy * inv_det
    conic_b = -cov_xy * inv_det
    conic_c = cov_xx * inv_det

    mid = 0.5 * (cov_xx + cov_yy)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = jax.lax.stop_gradient(radius).astype(jnp.int32)

    mx = ndc_to_pix(hx * p_w, cam.img_w)
    my = ndc_to_pix(hy * p_w, cam.img_h)

    valid = valid_in & (tz > near_z) & (det != 0.0) & (radius > 0)
    radius = jnp.where(valid, radius, 0)

    return Preprocessed(
        mx=mx, my=my,
        conic_a=conic_a, conic_b=conic_b, conic_c=conic_c,
        opacity=opacities,
        color_r=colors[..., 0], color_g=colors[..., 1],
        color_b=colors[..., 2],
        depth=tz,
        radius=radius,
        valid=valid,
    )
