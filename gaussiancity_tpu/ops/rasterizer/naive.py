# -*- coding: utf-8 -*-
"""Naive O(N * pixels) reference renderer — the correctness oracle.

Implements the exact sequential per-pixel semantics of the reference's tile
renderer (forward.cu:238-346) without tiling: Gaussians are globally stably
sorted by depth (matching the per-tile order: the (tile, depth) lex sort
breaks depth ties by Gaussian index, exactly like the global stable sort
does), and each pixel blends front-to-back with the same eligibility,
alpha clamping and early-termination rules.  A Gaussian only touches pixels
whose tile lies inside its screen rect — also mirrored here, because that is
observable behaviour of the tiled algorithm.

Written as straightforward differentiable jnp (lax.scan over Gaussians);
autodiff of this function is the gradient oracle for the custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiancity_tpu.camera import CameraParams
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import binning, preprocess


def naive_render(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    colors: jnp.ndarray,
    cam: CameraParams,
    cfg: RasterizerConfig = RasterizerConfig(),
    valid=None,
    bg=None,
    scale_modifier: float = 1.0,
):
    N = means3d.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    if bg is None:
        bg = jnp.zeros((3,), dtype=jnp.float32)

    prep = preprocess.preprocess(
        means3d, opacities, scales, quats, colors, valid, cam,
        scale_modifier=scale_modifier, near_z=cfg.near_z,
    )
    # ref_tile16_gate: the observable rect test happens at the
    # reference's 16x16 block grid (config.h:15), not at this repo's
    # compute-tile shape — mirror whichever the config renders with.
    gate_h = 16 if cfg.ref_tile16_gate else cfg.tile_h
    gate_w = 16 if cfg.ref_tile16_gate else cfg.tile_w
    x_min, y_min, x_max, y_max, area, pvalid = binning.compute_rects(
        jax.lax.stop_gradient(prep.mean2d), prep.radius, prep.valid,
        cam.img_h, cam.img_w, gate_h, gate_w,
    )

    # Global stable depth sort (ties by index == the tiled order).
    depth_key = jax.lax.stop_gradient(
        jnp.where(pvalid, prep.depth, jnp.inf)
    ).astype(jnp.float32)
    order = jnp.argsort(depth_key, stable=True)

    H, W = cam.img_h, cam.img_w
    ix = jnp.arange(W, dtype=jnp.float32)[None, :]
    iy = jnp.arange(H, dtype=jnp.float32)[:, None]
    tile_x = (jnp.arange(W, dtype=jnp.int32) // gate_w)[None, :]
    tile_y = (jnp.arange(H, dtype=jnp.int32) // gate_h)[:, None]

    xs = (
        prep.mean2d[order],
        prep.conic[order],
        prep.color[order],
        prep.opacity[order],
        pvalid[order],
        x_min[order], x_max[order], y_min[order], y_max[order],
    )

    def step(carry, x):
        T_acc, C_acc, done = carry
        m2d, con, col, op, pv, xm, xM, ym, yM = x
        in_rect = (tile_x >= xm) & (tile_x < xM) & (tile_y >= ym) & (tile_y < yM)
        dx = m2d[0] - ix
        dy = m2d[1] - iy
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        eligible = pv & in_rect & (power <= 0.0) & (alpha >= cfg.alpha_min)
        test_T = T_acc * (1.0 - alpha)
        live = eligible & jnp.logical_not(done)
        blend_m = live & (test_T >= cfg.transmittance_eps)
        newly_done = live & (test_T < cfg.transmittance_eps)
        w = jnp.where(blend_m, alpha * T_acc, 0.0)
        C_acc = C_acc + w[..., None] * col[None, None, :]
        T_acc = jnp.where(blend_m, test_T, T_acc)
        done = done | newly_done
        return (T_acc, C_acc, done), None

    T0 = jnp.ones((H, W), dtype=jnp.float32)
    C0 = jnp.zeros((H, W, 3), dtype=jnp.float32)
    done0 = jnp.zeros((H, W), dtype=bool)
    (final_T, C, _), _ = jax.lax.scan(step, (T0, C0, done0), xs)
    image = (C + final_T[..., None] * bg[None, None, :]).transpose(2, 0, 1)
    return image, final_T
