# -*- coding: utf-8 -*-
"""Differentiable Gaussian rasterization — public API.

The TPU-native analogue of ``GaussianRasterizer`` /
``GaussianRasterizerWrapper`` (reference:
extensions/diff_gaussian_rasterization/__init__.py:218-427).  One function,
``rasterize``, runs preprocess -> binning -> gather -> tile blend -> image
assembly, fully under jit with static shapes; ``rasterize_points14`` accepts
the reference's packed 14-channel point layout
(xyz, opacity, scale3, quat4, rgb3 — dgr/__init__.py:315,404-420).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiancity_tpu.camera import CameraModel, CameraParams
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import binning, blend, preprocess


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [3, H, W]
    final_T: jnp.ndarray  # [H, W]
    radii: jnp.ndarray  # [N] int32
    n_dropped_pairs: jnp.ndarray  # scalar int32 binning overflow diagnostics
    n_truncated: jnp.ndarray  # scalar int32
    # Slots carrying gradient beyond cfg.grad_capacity (0 = the bounded
    # backward scatter is exact; see RasterizerConfig.grad_capacity).
    n_grad_truncated: jnp.ndarray = jnp.zeros((), jnp.int32)


def _assemble_image(
    tiles: jnp.ndarray, n_ty: int, n_tx: int, th: int, tw: int, H: int, W: int
) -> jnp.ndarray:
    """[T, TH, TW, C] -> [C, H, W] (crop off tile padding)."""
    C = tiles.shape[-1]
    img = tiles.reshape(n_ty, n_tx, th, tw, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_ty * th, n_tx * tw, C)
    return img[:H, :W].transpose(2, 0, 1)


def rasterize(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    colors: Optional[jnp.ndarray],
    cam: CameraParams,
    cfg: RasterizerConfig = RasterizerConfig(),
    valid: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    shs: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    window: Optional[Tuple] = None,
) -> RenderOutput:
    """Render N (padded) Gaussians to a [3, H, W] image.

    Differentiable w.r.t. means3d, opacities, scales, quats, colors/shs, bg.
    Exactly one of ``colors`` ([N, 3] precomputed) and ``shs``
    ([N, M, 3] spherical-harmonics coefficients, evaluated along the view
    direction at ``sh_degree``) must be given, mirroring the reference's
    ``colors_precomp`` / ``shs`` contract (dgr/__init__.py:236-243).

    ``window=(x0, y0, Wc, Hc)`` renders only that sensor window (origins
    may be traced scalars; Wc/Hc must be static):  the per-Gaussian
    preprocess stays on the FULL sensor camera — identical projection,
    EWA, culling — and the screen means are shifted by the integer origin
    before binning, so every window pixel blends the same values as the
    corresponding full-render pixel (the reference crops AFTER rendering
    the full sensor, utils/helpers.py:250-270; rendering the crop
    directly skips the ~2x pixels the crop throws away).
    """
    N = means3d.shape[0]
    if (colors is None) == (shs is None):
        raise ValueError(
            "exactly one of colors and shs must be provided")
    if colors is None:
        from gaussiancity_tpu.ops.rasterizer import sh as _sh

        colors = _sh.eval_sh_colors(shs, means3d, cam.cam_pos, sh_degree)
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    if bg is None:
        bg = jnp.zeros((3,), dtype=jnp.float32)

    prep = preprocess.preprocess(
        means3d, opacities, scales, quats, colors, valid, cam,
        scale_modifier=scale_modifier, near_z=cfg.near_z,
    )
    img_h, img_w = cam.img_h, cam.img_w
    origin_f = jnp.zeros((2,), jnp.float32)
    bin_prep = prep
    if window is not None:
        # binning sees window-local means (crop tile grid); the blend
        # keeps SENSOR coordinates and shifts its pixel origins instead,
        # so dx/dy — and the 16x16 ref-gate blocks — are bitwise equal to
        # the full-sensor render's.
        x0, y0, wc, hc = window
        wx0 = jnp.asarray(x0).astype(jnp.float32)
        wy0 = jnp.asarray(y0).astype(jnp.float32)
        origin_f = jnp.stack([wx0, wy0])
        bin_prep = prep._replace(mx=prep.mx - wx0, my=prep.my - wy0)
        img_w, img_h = int(wc), int(hc)
    bins = binning.bin_gaussians(
        bin_prep,
        img_h,
        img_w,
        tile_h=cfg.tile_h,
        tile_w=cfg.tile_w,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        tile_capacity=cfg.tile_capacity,
        tiers=cfg.bin_tiers,
        visible_cap=cfg.visible_cap,
        gate16=cfg.ref_tile16_gate,
        gate_origin=origin_f if window is not None else None,
    )

    n_ty, n_tx = binning.tile_grid(img_h, img_w, cfg.tile_h, cfg.tile_w)
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    consts = blend.BlendConsts(
        tile_h=cfg.tile_h,
        tile_w=cfg.tile_w,
        alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max,
        t_eps=cfg.transmittance_eps,
        unroll=cfg.chunk,
        backend=backend,
        n_tx=n_tx,
        ref_gate=cfg.ref_tile16_gate,
    )
    idx = bins.gauss_index  # [T, K]
    n_grad_truncated = jnp.zeros((), jnp.int32)
    if backend == "pallas":
        # Fast path: one row-gather of the packed [N, 16] attributes into
        # the paged [T, NC, 16, page] kernel layout, with the backward's
        # slot space bounded by cfg.grad_capacity (blend.blend_gathered).
        from gaussiancity_tpu.ops.rasterizer import blend_pallas

        page = cfg.page or blend_pallas.default_page()
        T_tiles, K = idx.shape
        assert K % page == 0, "tile_capacity must be a multiple of the page"
        attrs = prep.attrs16()  # [N, 16]
        # idx rides as f32 (exact ints < 2^24) so the custom VJP can
        # return a zero cotangent for it.
        assert N < 2 ** 24, "idx rides the custom VJP as exact f32"
        tiles_out, tiles_T, n_grad_truncated = blend.blend_gathered(
            consts, cfg.grad_capacity, cfg.grad_budget, page, attrs,
            idx.astype(jnp.float32), bins.counts.astype(jnp.float32),
            origin_f, bg)
    else:
        mean2d_g = prep.mean2d[idx]
        conic_g = prep.conic[idx]
        color_g = prep.color[idx]
        opacity_g = prep.opacity[idx]
        if cfg.ref_tile16_gate:
            # kvalid carries radius-or-0 for the 16x16 ref gate
            # (BlendConsts.ref_gate doc)
            kvalid = jnp.where(bins.kmask, prep.radius[idx], 0
                               ).astype(jnp.float32)
        else:
            kvalid = bins.kmask.astype(jnp.float32)
        tid = jnp.arange(n_ty * n_tx, dtype=jnp.int32)
        x0f = ((tid % n_tx) * cfg.tile_w).astype(jnp.float32) + origin_f[0]
        y0f = ((tid // n_tx) * cfg.tile_h).astype(jnp.float32) + origin_f[1]
        tiles_out, tiles_T = blend.blend_tiles(
            consts, mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f,
            bg)
    image = _assemble_image(
        tiles_out, n_ty, n_tx, cfg.tile_h, cfg.tile_w, img_h, img_w
    )
    final_T = _assemble_image(
        tiles_T[..., None], n_ty, n_tx, cfg.tile_h, cfg.tile_w,
        img_h, img_w,
    )[0]
    return RenderOutput(
        image=image,
        final_T=final_T,
        radii=prep.radius,
        n_dropped_pairs=bins.n_dropped_pairs,
        n_truncated=bins.n_truncated,
        n_grad_truncated=n_grad_truncated,
    )


def mark_visible(means3d: jnp.ndarray, cam: CameraParams,
                 near_z: float = 0.2) -> jnp.ndarray:
    """Frustum visibility mask per point (reference:
    rasterize_points.cu markVisible / auxiliary.h in_frustum: camera-space
    z > 0.2)."""
    V = cam.view_matrix
    z = means3d @ V[2, :3] + V[2, 3]
    return z > near_z


def unpack_points14(points: jnp.ndarray):
    """Split the packed 14-channel point layout (dgr/__init__.py:404-420)."""
    assert points.shape[-1] == 14, "points must have 14 channels"
    xyz = points[..., 0:3]
    opacity = points[..., 3]
    scales = points[..., 4:7]
    quats = points[..., 7:11]
    rgbs = points[..., 11:14]
    return xyz, opacity, scales, quats, rgbs


def rasterize_points14(
    points: jnp.ndarray,
    cam: CameraParams,
    cfg: RasterizerConfig = RasterizerConfig(),
    valid: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    window: Optional[Tuple] = None,
) -> RenderOutput:
    xyz, opacity, scales, quats, rgbs = unpack_points14(points)
    return rasterize(xyz, opacity, scales, quats, rgbs, cam, cfg, valid, bg,
                     window=window)


class GaussianRasterizerWrapper:
    """Camera-owning convenience wrapper, mirroring the reference's
    ``GaussianRasterizerWrapper`` (dgr/__init__.py:276-427): shared K /
    sensor size, per-call (position, quaternion xyzw), optional lr/ud flips
    applied to the rendered image."""

    def __init__(
        self,
        K,
        sensor_size: Tuple[int, int],
        flip_lr: bool = True,
        flip_ud: bool = False,
        z_near: float = 0.01,
        z_far: float = 50000.0,
        cfg: RasterizerConfig = RasterizerConfig(),
    ):
        self.camera = CameraModel(K, sensor_size, z_near, z_far)
        self.flip_lr = flip_lr
        self.flip_ud = flip_ud
        self.cfg = cfg

    def __call__(
        self,
        points: jnp.ndarray,
        cam_position,
        cam_quaternion,
        valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cam = self.camera.params(cam_position, cam_quaternion)
        out = rasterize_points14(points, cam, self.cfg, valid=valid)
        img = out.image
        if self.flip_lr:
            img = img[:, :, ::-1]
        if self.flip_ud:
            img = img[:, ::-1, :]
        return img
