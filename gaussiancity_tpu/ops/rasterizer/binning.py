# -*- coding: utf-8 -*-
"""Tile binning: map preprocessed Gaussians to fixed-capacity per-tile lists.

TPU-native replacement for the reference's dynamic pipeline
``InclusiveSum -> duplicateWithKeys -> DeviceRadixSort -> identifyTileRanges``
(reference: cuda_rasterizer/rasterizer_impl.cu:64-283).  Everything here is
static-shape: each Gaussian is expanded into at most ``max_tiles_per_gaussian``
(tile, depth) pairs, all pairs are lexicographically sorted with
``jax.lax.sort`` (stable — ties keep pair order, like the reference's stable
LSB radix sort), and each tile keeps its nearest ``tile_capacity`` entries.

TPU layout: all per-Gaussian state is [N] component vectors and the pair
expansion is [D, N] (N on lanes) — never [N, small].

Overflow policy (principled, per SURVEY.md §7): per-tile truncation keeps the
*nearest* K Gaussians (sort is front-to-back); per-Gaussian truncation drops
the trailing tiles of its row-major rect.  Both overflow counts are returned
so callers can assert/log when capacities are exceeded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiancity_tpu.ops.rasterizer.preprocess import Preprocessed


class TileBins(NamedTuple):
    gauss_index: jnp.ndarray  # [T, K] int32 index into the Gaussian arrays
    kmask: jnp.ndarray  # [T, K] bool — slot holds a real entry
    counts: jnp.ndarray  # [T] int32
    n_dropped_pairs: jnp.ndarray  # scalar int32 — rect tiles beyond the cap
    n_truncated: jnp.ndarray  # scalar int32 — per-tile entries beyond capacity


def tile_grid(img_h: int, img_w: int, tile_h: int, tile_w: int):
    n_ty = -(-img_h // tile_h)
    n_tx = -(-img_w // tile_w)
    return n_ty, n_tx


def compute_rects_c(mx, my, radius, valid, img_h, img_w, tile_h, tile_w):
    """Component-vector tile rects (reference: auxiliary.h:36-46 getRect)."""
    n_ty, n_tx = tile_grid(img_h, img_w, tile_h, tile_w)
    r = radius.astype(mx.dtype)
    x_min = jnp.clip(jnp.floor((mx - r) / tile_w), 0, n_tx).astype(jnp.int32)
    y_min = jnp.clip(jnp.floor((my - r) / tile_h), 0, n_ty).astype(jnp.int32)
    x_max = jnp.clip(jnp.floor((mx + r + tile_w - 1) / tile_w), 0,
                     n_tx).astype(jnp.int32)
    y_max = jnp.clip(jnp.floor((my + r + tile_h - 1) / tile_h), 0,
                     n_ty).astype(jnp.int32)
    area = (x_max - x_min) * (y_max - y_min)
    valid = valid & (area > 0)
    return x_min, y_min, x_max, y_max, jnp.where(valid, area, 0), valid


def compute_rects(mean2d, radius, valid, img_h, img_w, tile_h, tile_w):
    """[N, 2] compatibility wrapper (used by the naive oracle)."""
    return compute_rects_c(mean2d[..., 0], mean2d[..., 1], radius, valid,
                           img_h, img_w, tile_h, tile_w)


def bin_gaussians(
    prep: Preprocessed,
    img_h: int,
    img_w: int,
    tile_h: int = 8,
    tile_w: int = 128,
    max_tiles_per_gaussian: int = 32,
    tile_capacity: int = 1024,
) -> TileBins:
    """Build fixed-capacity per-tile Gaussian lists, front-to-back.

    All inputs are treated as non-differentiable integer state.
    """
    mx = jax.lax.stop_gradient(prep.mx)
    my = jax.lax.stop_gradient(prep.my)
    depth = jax.lax.stop_gradient(prep.depth)

    n_ty, n_tx = tile_grid(img_h, img_w, tile_h, tile_w)
    num_tiles = n_ty * n_tx
    N = mx.shape[0]
    D = max_tiles_per_gaussian
    K = tile_capacity

    x_min, y_min, x_max, y_max, area, valid = compute_rects_c(
        mx, my, prep.radius, prep.valid, img_h, img_w, tile_h, tile_w)
    rect_w = x_max - x_min

    # Expand each Gaussian into up to D (tile, depth) pairs, [D, N] layout,
    # row-major over its rect (y-major like duplicateWithKeys,
    # rasterizer_impl.cu:64-99).
    j = jnp.arange(D, dtype=jnp.int32)[:, None]  # [D, 1]
    rw = jnp.maximum(rect_w, 1)[None, :]  # [1, N]
    ty = y_min[None, :] + j // rw  # [D, N]
    tx = x_min[None, :] + j % rw
    pair_valid = valid[None, :] & (j < area[None, :])
    tile_id = jnp.where(pair_valid, ty * n_tx + tx, num_tiles).astype(jnp.int32)

    n_dropped = jnp.sum(jnp.maximum(area - D, 0)).astype(jnp.int32)

    # Single-int32-key sort: pack (tile, depth-rank).  The global depth
    # rank (stable argsort of depth) gives each Gaussian a unique order
    # key, so (tile << bits) | rank reproduces the reference's
    # (tile, depth, duplication-order) ordering exactly — ties in depth
    # break by original index like the stable LSB radix sort
    # (rasterizer_impl.cu:252-260) — with one int key instead of a
    # 3-operand lexicographic sort.
    rank_bits = max((N - 1).bit_length(), 1)
    tile_bits = (num_tiles + 1).bit_length()
    if rank_bits + tile_bits <= 31:
        order_by_depth = jnp.argsort(depth, stable=True).astype(jnp.int32)
        rank = jnp.zeros((N,), jnp.int32).at[order_by_depth].set(
            jnp.arange(N, dtype=jnp.int32))
        key = (tile_id << rank_bits) | rank[None, :]
        pair_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (D, N))
        key_s, idx_s = jax.lax.sort(
            (key.reshape(-1), pair_idx.reshape(-1)), num_keys=1)
        tile_s = key_s >> rank_bits
    else:  # fall back to the lexicographic sort for huge scenes
        pair_depth = jnp.broadcast_to(depth[None, :], (D, N)).astype(
            jnp.float32)
        pair_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (D, N))
        tile_s, _, idx_s = jax.lax.sort(
            (tile_id.reshape(-1), pair_depth.reshape(-1),
             pair_idx.reshape(-1)), num_keys=2, is_stable=True)

    # Per-tile ranges via binary search (replaces identifyTileRanges,
    # rasterizer_impl.cu:101-124).
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    full_counts = ends - starts
    counts = jnp.minimum(full_counts, K)
    n_truncated = jnp.sum(jnp.maximum(full_counts - K, 0)).astype(jnp.int32)

    k = jnp.arange(K, dtype=jnp.int32)
    gather_pos = jnp.minimum(starts[:, None] + k[None, :], D * N - 1)
    gauss_index = idx_s.at[gather_pos].get(
        mode="promise_in_bounds")  # [T, K]
    kmask = k[None, :] < counts[:, None]
    gauss_index = jnp.where(kmask, gauss_index, 0)

    return TileBins(
        gauss_index=gauss_index,
        kmask=kmask,
        counts=counts,
        n_dropped_pairs=n_dropped,
        n_truncated=n_truncated,
    )
