# -*- coding: utf-8 -*-
"""Mesh-sharded inference composition (BASELINE configs 4-5; reference:
scripts/inference.py:426-507 runs the per-class generators on ONE GPU).

The compact per-frame composition (class buckets -> per-class generators
-> rasterize) scales over a device mesh in two pieces:

- **Per-class attribute prediction** is sharded over the POINT axis with
  ``jax.jit`` + ``NamedSharding``: each device evaluates its own slice of
  the class slab with replicated parameters.  The REST generator (hash
  grid + scene code + MLP) is pointwise, so XLA inserts no collectives
  beyond the replicated-table reads; the BLDG generator's PTv3 contains
  global sorts (serialization, pooling), for which XLA's SPMD
  partitioner inserts the required collectives automatically — exact,
  though the sorts themselves don't scale linearly.  The FLOP-heavy
  stages (attention, MLPs, hash-grid gathers) do.
- **Rasterization** uses :mod:`gaussiancity_tpu.parallel.sharded_raster`
  — Gaussians AND image bands sharded, one ``all_gather`` of the compact
  16-float screen-space attributes over ICI.

Parity: the sharded frame equals the single-device compact frame
bit-for-bit on CPU (tests/test_sharded_raster.py::TestShardedFrame).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gaussiancity_tpu.camera import CameraParams
from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.parallel.sharded_raster import make_sharded_rasterizer


def unpack_points14(gs_pts: jnp.ndarray):
    """[N, 14] packed Gaussian points -> rasterizer operand tuple
    (helpers.get_gaussian_points layout: xyz, opacity, scale3, quat4,
    rgb3 — reference dgr/__init__.py:315,404-420)."""
    return (gs_pts[:, 0:3], gs_pts[:, 3], gs_pts[:, 4:7],
            gs_pts[:, 7:11], gs_pts[:, 11:14])


def make_sharded_frame(mesh, pipe, cam: CameraParams,
                       cfg: RasterizerConfig, axis: str = "tile"):
    """Returns ``frame(buckets, proj_hf, proj_seg, proj_tlp, style_lut,
    bg) -> image [3, H, W]`` with per-class attr prediction sharded over
    the point axis and the rasterizer tile-sharded over the same mesh
    axis.  ``pipe`` is an :class:`InferencePipeline` (its jittable
    ``predict_attrs_single`` stage is reused verbatim — the sharding is
    purely an annotation, so outputs match the single-device path).
    ``buckets``: name -> (pts9 [S, 9] device array, count) with S a
    multiple of the mesh axis size."""
    n_dev = mesh.shape[axis]
    shard_pts = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    attrs_fns = {}
    for name in pipe.models:
        attrs_fns[name] = jax.jit(
            functools.partial(pipe.predict_attrs_single, name),
            # (params, pts9, pts_mask, proj_hf, proj_seg, proj_tlp, lut)
            in_shardings=(repl, shard_pts, shard_pts, repl, repl, repl,
                          repl),
            out_shardings=shard_pts,
        )
    raster = jax.jit(make_sharded_rasterizer(mesh, cam, cfg, axis=axis))
    params_map = {name: p for name, (_, p) in pipe.models.items()}

    def frame(buckets, proj_hf, proj_seg, style_lut, bg):
        gs_parts, mask_parts = [], []
        for name in pipe.models:
            pts9_c, n_c = buckets[name]
            slab = pts9_c.shape[0]
            assert slab % n_dev == 0, (
                f"{name} slab {slab} must divide over {n_dev} devices")
            mask_c = jnp.arange(slab) < jnp.asarray(n_c, jnp.int32)
            gs_parts.append(attrs_fns[name](
                params_map[name], pts9_c, mask_c, proj_hf, proj_seg,
                None, style_lut))
            mask_parts.append(mask_c)
        gs = jnp.concatenate(gs_parts, axis=0)
        mask = jnp.concatenate(mask_parts, axis=0)
        means, opacity, scales, quats, colors = unpack_points14(gs)
        return raster(means, opacity, scales, quats, colors, mask, bg)

    return frame
