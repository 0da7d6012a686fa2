# -*- coding: utf-8 -*-
"""Spherical-harmonics color evaluation for the rasterizer.

TPU-native equivalent of the reference's ``computeColorFromSH``
(reference: cuda_rasterizer/forward.cu:20-66; constants auxiliary.h:22-30).
The hand-written SH backward (backward.cu:375-425, including the
view-direction -> mean chain through ``dnormvdv``) is replaced by JAX
autodiff of this closed form; the clamp gating (``clamped`` flags zeroing
dL/dcolor for negative channels, backward.cu:375-380) falls out of the
``jnp.where(pre < 0, 0, pre)`` formulation exactly: channels clamped in
the forward receive zero cotangent.

GaussianCity itself always passes precomputed colors
(reference: dgr/__init__.py:413-414 ``shs=None, colors_precomp=...``), so
this path exists for rasterizer feature parity, not for the city models.

Layout: SH coefficients are [N, M, 3] with M = (deg+1)^2 coefficients per
channel, matching the torch wrapper's ``shs`` tensor
(dgr/__init__.py:250-266).
"""

from __future__ import annotations

import jax.numpy as jnp

# auxiliary.h:22-30
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh_colors(
    shs: jnp.ndarray,  # [N, M, 3] with M >= (deg+1)^2
    means3d: jnp.ndarray,  # [N, 3]
    campos: jnp.ndarray,  # [3]
    deg: int,
) -> jnp.ndarray:
    """Per-Gaussian RGB from SH along the normalized view direction.

    Returns [N, 3] colors, clamped to >= 0 (forward.cu:60-66).
    SoA component math ([N] vectors) per the repo's TPU layout rules.
    """
    if not 0 <= deg <= 3:
        raise ValueError(f"sh degree must be in [0, 3], got {deg}")
    if shs.shape[1] < num_sh_coeffs(deg):
        raise ValueError(
            f"shs has {shs.shape[1]} coefficients; degree {deg} needs "
            f"{num_sh_coeffs(deg)}")

    d = means3d - campos[None, :]
    # normalize; guard the (culled / padded) zero-direction case
    inv_len = 1.0 / jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-12)
    x = d[:, 0] * inv_len
    y = d[:, 1] * inv_len
    z = d[:, 2] * inv_len

    result = SH_C0 * shs[:, 0]
    if deg > 0:
        result = (result
                  - SH_C1 * y[:, None] * shs[:, 1]
                  + SH_C1 * z[:, None] * shs[:, 2]
                  - SH_C1 * x[:, None] * shs[:, 3])
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + (SH_C2[0] * xy)[:, None] * shs[:, 4]
                  + (SH_C2[1] * yz)[:, None] * shs[:, 5]
                  + (SH_C2[2] * (2.0 * zz - xx - yy))[:, None] * shs[:, 6]
                  + (SH_C2[3] * xz)[:, None] * shs[:, 7]
                  + (SH_C2[4] * (xx - yy))[:, None] * shs[:, 8])
    if deg > 2:
        result = (result
                  + (SH_C3[0] * y * (3.0 * xx - yy))[:, None] * shs[:, 9]
                  + (SH_C3[1] * xy * z)[:, None] * shs[:, 10]
                  + (SH_C3[2] * y * (4.0 * zz - xx - yy))[:, None] * shs[:, 11]
                  + (SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy))[:, None]
                  * shs[:, 12]
                  + (SH_C3[4] * x * (4.0 * zz - xx - yy))[:, None] * shs[:, 13]
                  + (SH_C3[5] * z * (xx - yy))[:, None] * shs[:, 14]
                  + (SH_C3[6] * x * (xx - 3.0 * yy))[:, None] * shs[:, 15])

    pre = result + 0.5
    # clamp with exact reference grad gating: pre < 0 -> zero gradient,
    # pre == 0 passes gradient (clamped flag is `result.x < 0`)
    return jnp.where(pre < 0.0, 0.0, pre)
