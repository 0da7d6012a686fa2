# -*- coding: utf-8 -*-
"""Per-Gaussian preprocessing: projection, EWA 2D covariance, conic, radius.

Pure JAX, fully differentiable — this replaces the reference's
``preprocessCUDA`` kernel and its hand-written backward
(reference: cuda_rasterizer/forward.cu:68-233, backward.cu:140-425).
On TPU the closed-form math autodiffs; no custom kernel is needed here.

All functions operate on padded fixed-size arrays [N, ...] with an explicit
validity mask, so every shape is static under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiancity_tpu.camera import CameraParams


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space state (all [N, ...])."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    color: jnp.ndarray  # [N, 3]
    opacity: jnp.ndarray  # [N]
    depth: jnp.ndarray  # [N] camera-space z
    radius: jnp.ndarray  # [N] int32 pixel radius (0 => culled)
    valid: jnp.ndarray  # [N] bool — survives culling


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices from wxyz quaternions [N, 4] (NOT normalized,
    matching the reference which skips normalization:
    forward.cu:119 — the GaussianCity pipeline always passes (1,0,0,0))."""
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
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance Sigma = R S S^T R^T, upper-triangular packed
    [N, 6] as (xx, xy, xz, yy, yz, zz) (reference: forward.cu:110-144)."""
    R = quat_to_rotmat(quats)  # [N, 3, 3]
    S = scales * scale_modifier  # [N, 3]
    M = R * S[..., None, :]  # R @ diag(S)
    Sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [Sigma[..., 0, 0], Sigma[..., 0, 1], Sigma[..., 0, 2],
         Sigma[..., 1, 1], Sigma[..., 1, 2], Sigma[..., 2, 2]],
        axis=-1,
    )


def compute_cov2d(
    mean3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    view: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA splatting 2D covariance [N, 3] = (cov_xx, cov_xy, cov_yy), with the
    +0.3 low-pass filter (reference: forward.cu:68-105)."""
    W = view[:3, :3]
    t = mean3d @ W.T + view[:3, 3]  # camera-space points [N, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # Jacobian of perspective projection (rows: du, dv)
    # J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    J00 = focal_x * inv_z
    J02 = -focal_x * tx * inv_z2
    J11 = focal_y * inv_z
    J12 = -focal_y * ty * inv_z2

    # M = J @ W  (2x3 per gaussian)
    M0 = J00[..., None] * W[0] + J02[..., None] * W[2]  # [N, 3]
    M1 = J11[..., None] * W[1] + J12[..., None] * W[2]  # [N, 3]

    # Sigma (3x3 symmetric) from packed cov3d
    c = cov3d
    Sig = jnp.stack(
        [jnp.stack([c[..., 0], c[..., 1], c[..., 2]], -1),
         jnp.stack([c[..., 1], c[..., 3], c[..., 4]], -1),
         jnp.stack([c[..., 2], c[..., 4], c[..., 5]], -1)],
        axis=-2,
    )  # [N, 3, 3]

    SigM0 = jnp.einsum("nij,nj->ni", Sig, M0)
    cxx = jnp.einsum("ni,ni->n", M0, SigM0) + 0.3
    cxy = jnp.einsum("ni,ni->n", M1, SigM0)
    SigM1 = jnp.einsum("nij,nj->ni", Sig, M1)
    cyy = jnp.einsum("ni,ni->n", M1, SigM1) + 0.3
    return jnp.stack([cxx, cxy, cyy], axis=-1)


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
    N = means3d.shape[0]
    ones = jnp.ones((N, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1) @ cam.full_proj.T  # [N, 4]
    p_w = 1.0 / (hom[..., 3] + 1e-7)
    p_proj = hom[..., :3] * p_w[..., None]

    view = cam.view_matrix
    p_view_z = means3d @ view[2, :3] + view[2, 3]

    cov3d = compute_cov3d(scales, quats, scale_modifier)
    cov2d = compute_cov2d(
        means3d, cov3d, view, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy
    )

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack(
        [cov2d[..., 2] * inv_det, -cov2d[..., 1] * inv_det, cov2d[..., 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    # NOTE: stop_gradient on the radius path — the reference treats the tile
    # rect as non-differentiable integer state.
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = jax.lax.stop_gradient(radius).astype(jnp.int32)

    mean2d = jnp.stack(
        [ndc_to_pix(p_proj[..., 0], cam.img_w), ndc_to_pix(p_proj[..., 1], cam.img_h)],
        axis=-1,
    )

    valid = (
        valid_in
        & (p_view_z > near_z)
        & (det != 0.0)
        & (radius > 0)
    )
    radius = jnp.where(valid, radius, 0)

    return Preprocessed(
        mean2d=mean2d,
        conic=conic,
        color=colors,
        opacity=opacities,
        depth=p_view_z,
        radius=radius,
        valid=valid,
    )
