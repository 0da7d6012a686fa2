# -*- coding: utf-8 -*-
"""Mesh-sharded rasterization for giant scenes (SURVEY.md §7 step 8).

Shards BOTH the Gaussian primitives and the image over the mesh 'tile'
axis: each device preprocesses its own Gaussian shard, all-gathers the
compact per-Gaussian screen-space attributes over ICI (16 f32/Gaussian —
far smaller than raw model outputs), then bins and blends only its own
horizontal band of the image.  The backward transposes the all_gather into
a reduce-scatter automatically (shard_map autodiff), so Gaussian gradients
flow back to their owning shard without materializing the full set
anywhere.

This is the TPU-native answer to BASELINE configs 4-5 (multi-million-
Gaussian city frames on a v5e-8 / multi-host slice): per-device work —
preprocess N/d Gaussians, sort only the pairs touching H/d image rows,
blend H/d rows — all scale ~1/d, and the single collective rides ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gaussiancity_tpu.camera import CameraParams
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import binning, blend, preprocess


def _band_rasterize(
    means3d, opacities, scales, quats, colors, valid, bg,
    cam: CameraParams, cfg: RasterizerConfig, axis: str, n_dev: int,
):
    """Runs inside shard_map: inputs are per-device Gaussian shards;
    returns this device's image band [3, H/d, W]."""
    prep = preprocess.preprocess(
        means3d, opacities, scales, quats, colors, valid, cam,
        near_z=cfg.near_z)

    # Compact screen-space state -> ONE all_gather over the mesh axis.
    # attrs16 rows 0-8 are the blend attributes (mx, my already rows 0-1);
    # the spare rows 9-11 carry depth / radius / valid so the whole
    # per-Gaussian state rides a single collective (16 f32/Gaussian).
    attrs16 = prep.attrs16()
    packed = attrs16.at[:, 9].set(prep.depth)
    packed = packed.at[:, 10].set(prep.radius.astype(attrs16.dtype))
    packed = packed.at[:, 11].set(prep.valid.astype(attrs16.dtype))
    g_attrs = jax.lax.all_gather(packed, axis, tiled=True)  # [N, 16]
    g_mx = g_attrs[:, 0]
    g_my = g_attrs[:, 1]
    g_depth = g_attrs[:, 9]
    g_radius = g_attrs[:, 10].astype(jnp.int32)
    g_valid = g_attrs[:, 11] > 0.5

    H, W = cam.img_h, cam.img_w
    # Pad the band grid so ANY sensor height shards: each device renders a
    # tile-aligned band of ceil(H / (tile_h * n_dev)) tile rows; bands
    # beyond H are padding the caller crops off (960x540 on 8 devices ->
    # 8 bands of 72 rows, last 36 rows cropped).
    band_h = -(-H // (cfg.tile_h * n_dev)) * cfg.tile_h
    band_y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)

    # Bin with band-local y (band tile grid); the blend keeps SENSOR
    # coordinates and shifts its pixel origins instead (api.rasterize's
    # window pattern), so dx/dy — and the 16x16 ref-gate blocks — are
    # bitwise equal to an unsharded render's.
    band_prep = preprocess.Preprocessed(
        mx=g_mx, my=g_my - band_y0,
        conic_a=g_attrs[:, 2], conic_b=g_attrs[:, 3], conic_c=g_attrs[:, 4],
        opacity=g_attrs[:, 5],
        color_r=g_attrs[:, 6], color_g=g_attrs[:, 7], color_b=g_attrs[:, 8],
        depth=g_depth, radius=g_radius, valid=g_valid,
    )
    origin_f = jnp.stack([jnp.float32(0.0), band_y0])
    bins = binning.bin_gaussians(
        band_prep, band_h, W, cfg.tile_h, cfg.tile_w,
        cfg.max_tiles_per_gaussian, cfg.tile_capacity,
        tiers=cfg.bin_tiers, visible_cap=cfg.visible_cap,
        gate16=cfg.ref_tile16_gate, gate_origin=origin_f)

    n_ty, n_tx = binning.tile_grid(band_h, W, cfg.tile_h, cfg.tile_w)
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    consts = blend.BlendConsts(
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
        unroll=cfg.chunk, backend=backend, n_tx=n_tx,
        ref_gate=cfg.ref_tile16_gate)

    idx = bins.gauss_index
    # sensor-coordinate attribute rows: clear the transport-only rows
    # 9-11, then restore radius to row 9 (the ref gate reads it there)
    attrs_band = g_attrs.at[:, 9:12].set(0.0)
    attrs_band = attrs_band.at[:, 9].set(g_radius.astype(attrs_band.dtype))
    if backend == "pallas":
        from gaussiancity_tpu.ops.rasterizer import blend_pallas

        page = blend_pallas.default_page()
        T_tiles, K = idx.shape
        gathered = attrs_band[idx.reshape(-1)]
        attrs_paged = gathered.reshape(T_tiles, K // page, page, 16)
        attrs_paged = attrs_paged.transpose(0, 1, 3, 2)
        tiles_out, _ = blend.blend_tiles_packed(
            consts, attrs_paged, bins.counts.astype(jnp.float32), origin_f,
            bg)
    else:
        if cfg.ref_tile16_gate:
            kvalid = jnp.where(bins.kmask, g_radius[idx], 0
                               ).astype(jnp.float32)
        else:
            kvalid = bins.kmask.astype(jnp.float32)
        tid = jnp.arange(n_ty * n_tx, dtype=jnp.int32)
        x0f = ((tid % n_tx) * cfg.tile_w).astype(jnp.float32)
        y0f = ((tid // n_tx) * cfg.tile_h).astype(jnp.float32) + band_y0
        tiles_out, _ = blend.blend_tiles(
            consts,
            jnp.stack([attrs_band[idx][..., 0], attrs_band[idx][..., 1]], -1),
            attrs_band[idx][..., 2:5],
            attrs_band[idx][..., 6:9],
            attrs_band[idx][..., 5],
            kvalid, x0f, y0f, bg)

    img = tiles_out.reshape(n_ty, n_tx, cfg.tile_h, cfg.tile_w, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        n_ty * cfg.tile_h, n_tx * cfg.tile_w, 3)
    return img[:band_h, :W].transpose(2, 0, 1)  # [3, band_h, W]


def make_sharded_rasterizer(mesh, cam: CameraParams,
                            cfg: RasterizerConfig = RasterizerConfig(),
                            axis: str = "tile"):
    """Returns a jitted fn(means3d, opacities, scales, quats, colors,
    valid, bg) -> image [3, H, W], with Gaussians sharded over ``axis``
    and the image bands distributed the same way.  Any sensor height
    works: the band grid is tile-padded and cropped here."""
    n_dev = mesh.shape[axis]
    H = cam.img_h

    fn = functools.partial(_band_rasterize, cam=cam, cfg=cfg, axis=axis,
                           n_dev=n_dev)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )

    def render(*args):
        return sharded(*args)[:, :H]

    return render
