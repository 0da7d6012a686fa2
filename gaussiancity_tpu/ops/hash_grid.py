# -*- coding: utf-8 -*-
"""Multiresolution hash-grid positional encoding (instant-NGP style).

TPU-native replacement for the reference's ``grid_encoder`` CUDA extension
(reference: extensions/grid_encoder/grid_encoder_ext.cu:51-249,
__init__.py:125-193).  The trilinear (2^D-corner) interpolation is a plain
XLA gather + weighted sum; its backward is XLA's deterministic scatter-add —
no custom kernel required (SURVEY.md §7).

Faithful semantics:
  - inputs in [-bound, bound] are mapped to [0, 1]; out-of-bound points
    produce zeros (grid_encoder_ext.cu:113-139)
  - per-level scale = 2^(log2(desired/base) / (L-1)); level scale factor
    ``exp2(l * log2(s)) * base - 1``; resolution = ceil(scale) + 1
  - dense indexing while the level's corner count fits the table, else
    XOR-prime fast_hash (grid_encoder_ext.cu:51-93); per-level tables are
    rounded up to a multiple of 8 and capped at 2^log2_hashmap_size
  - align_corners=False: pos = x * scale + 0.5

Note: the reference's table-size loop uses the *constructor default*
``per_level_scale=2`` while the kernel uses the computed scale
(__init__.py:142-163); we use the computed scale consistently for both.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# grid_encoder_ext.cu:59-61
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)


def level_params(
    in_channels: int,
    n_levels: int,
    base_resolution: int,
    desired_resolution: int,
    log2_hashmap_size: int,
) -> Tuple[float, Sequence[int], Sequence[int], Sequence[int], int]:
    """Static per-level table layout. Returns (per_level_scale, offsets,
    resolutions, hashed flags, total_rows)."""
    per_level_scale = 2.0 ** (
        math.log2(desired_resolution / base_resolution) / (n_levels - 1)
    )
    max_params = 2 ** log2_hashmap_size
    offsets, resolutions, hashed = [], [], []
    offset = 0
    S = math.log2(per_level_scale)
    for lvl in range(n_levels):
        scale = (2.0 ** (lvl * S)) * base_resolution - 1.0
        resolution = int(np.ceil(scale)) + 1
        corners = (resolution + 1) ** in_channels
        params_in_level = min(max_params, corners)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)
        offsets.append(offset)
        resolutions.append(resolution)
        # dense iff the full corner lattice fits the (rounded) table
        hashed.append(corners > params_in_level)
        offset += params_in_level
    return per_level_scale, offsets, resolutions, hashed, offset


def _corner_offsets(D: int) -> np.ndarray:
    """[2^D, D] binary corner enumeration."""
    idx = np.arange(2 ** D, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(D, dtype=np.uint32)[None, :]) & 1).astype(
        np.uint32
    )


def hash_encode(
    inputs: jnp.ndarray,  # [N, D] in [-bound, bound]
    embeddings: jnp.ndarray,  # [total_rows, C]
    in_channels: int,
    n_levels: int,
    base_resolution: int,
    desired_resolution: int,
    log2_hashmap_size: int,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Returns [N, n_levels * C]. Differentiable w.r.t. embeddings and inputs."""
    D = in_channels
    per_level_scale, offsets, resolutions, hashed, total = level_params(
        D, n_levels, base_resolution, desired_resolution, log2_hashmap_size
    )
    x01 = (inputs + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # [N]
    S = math.log2(per_level_scale)
    corners_np = _corner_offsets(D)  # [2^D, D] static 0/1

    # SoA per-dimension components ([N, 2^D, D]-shaped math would waste
    # most of every vector register to lane padding).
    x01_d = [x01[:, d] for d in range(D)]

    outs = []
    for lvl in range(n_levels):
        scale = (2.0 ** (lvl * S)) * base_resolution - 1.0
        resolution = resolutions[lvl]
        hashmap_size = (list(offsets) + [total])[lvl + 1] - offsets[lvl]
        grid_d, frac_d = [], []
        for d in range(D):
            pos = x01_d[d] * scale + 0.5  # align_corners=False
            g = jnp.floor(pos)
            grid_d.append(g.astype(jnp.int32))
            frac_d.append(pos - g)

        # per-corner index + weight, [2^D, N] (corners on the major axis)
        C2 = 1 << D
        w = jnp.ones((C2, x01.shape[0]), dtype=x01.dtype)
        if hashed[lvl]:
            idx = jnp.zeros((C2, x01.shape[0]), dtype=jnp.uint32)
            for d in range(D):
                bit = jnp.asarray(corners_np[:, d].astype(np.uint32))[:, None]
                pc = grid_d[d].astype(jnp.uint32)[None, :] + bit
                idx = idx ^ (pc * jnp.uint32(_PRIMES[d]))
                w = w * jnp.where(bit == 0, 1.0 - frac_d[d][None, :],
                                  frac_d[d][None, :])
            idx = (idx % jnp.uint32(hashmap_size)).astype(jnp.int32)
        else:
            stride = 1
            idx = jnp.zeros((C2, x01.shape[0]), dtype=jnp.int32)
            for d in range(D):
                bit = jnp.asarray(corners_np[:, d].astype(np.int32))[:, None]
                pc = grid_d[d][None, :] + bit
                idx = idx + pc * stride
                stride *= resolution + 1
                w = w * jnp.where(bit == 0, 1.0 - frac_d[d][None, :],
                                  frac_d[d][None, :])
            idx = idx % hashmap_size
        idx = idx + offsets[lvl]
        vals = embeddings[idx]  # [2^D, N, C]
        out = jnp.sum(vals * w[..., None], axis=0)  # [N, C]
        outs.append(out)

    out = jnp.concatenate(outs, axis=-1)  # [N, L*C]
    return jnp.where(oob[:, None], 0.0, out)


class GridEncoder(nn.Module):
    """Flax module owning the hash table (reference: grid_encoder
    __init__.py:125-193; init uniform(-1e-4, 1e-4))."""

    in_channels: int
    n_levels: int = 16
    lvl_channels: int = 8
    desired_resolution: int = 2048
    base_resolution: int = 16
    log2_hashmap_size: int = 19

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.lvl_channels

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        _, _, _, _, total = level_params(
            self.in_channels, self.n_levels, self.base_resolution,
            self.desired_resolution, self.log2_hashmap_size,
        )
        embeddings = self.param(
            "embeddings",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1e-4, maxval=1e-4
            ),
            (total, self.lvl_channels),
        )
        prefix = inputs.shape[:-1]
        flat = inputs.reshape(-1, self.in_channels)
        out = hash_encode(
            flat, embeddings, self.in_channels, self.n_levels,
            self.base_resolution, self.desired_resolution,
            self.log2_hashmap_size, bound,
        )
        return out.reshape(*prefix, self.output_dim)
