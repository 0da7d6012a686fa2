# -*- coding: utf-8 -*-
"""Space-filling-curve point serialization (PTv3).

TPU-native replacement for the reference's serializers
(reference: models/pt_v3.py:95-340): supports the same five orders —
``cord`` (coordinate-lexicographic decimal packing), ``z`` / ``z-trans``
(Morton), ``hilbert`` / ``hilbert-trans`` (Skilling transform).

Differences by design:
  - vectorized bit-twiddling in int32 instead of the 256-entry LUT trick
    (models/pt_v3.py:44-92) — the LUT exists to work around slow scalar
    loops on GPU; on TPU the unrolled interleave is pure vector ops
  - int32 codes, depth <= 10 (30 bits): batch is handled by vmap, not by
    packing batch bits above the code (models/pt_v3.py:113-116), and
    GaussianCity's normalized rel_xyz coordinates quantize to < 2^9 cells
  - padded/invalid points get the maximum code so a stable argsort moves
    them to the end
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

INVALID_CODE = jnp.iinfo(jnp.int32).max


def grid_coords(coord: jnp.ndarray, grid_size: float,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Quantize to grid cells: trunc((coord - min) / grid_size)
    (reference: models/pt_v3.py:395-404). Invalid points excluded from the
    min. coord: [N, 3]."""
    big = jnp.float32(3.4e38)
    masked = jnp.where(valid[:, None], coord, big)
    cmin = jnp.min(masked, axis=0)
    g = jnp.trunc((coord - cmin) / grid_size).astype(jnp.int32)
    return jnp.where(valid[:, None], g, 0)


def cord_encode(g: jnp.ndarray, grid_size: float) -> jnp.ndarray:
    """Coordinate-lexicographic code: x/gs^2 + y/gs + z, truncated to int
    (reference: models/pt_v3.py:119-127). GaussianCity's primary order."""
    x = g[:, 0].astype(jnp.float32)
    y = g[:, 1].astype(jnp.float32)
    z = g[:, 2].astype(jnp.float32)
    code = x / (grid_size ** 2) + y / grid_size + z
    return code.astype(jnp.int32)


def _part_1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are two zero bits between each
    (Morton component), int32."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.int32(0x30000FF)
    v = (v | (v << 8)) & jnp.int32(0x300F00F)
    v = (v | (v << 4)) & jnp.int32(0x30C30C3)
    v = (v | (v << 2)) & jnp.int32(0x9249249)
    return v


def z_order_encode(g: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """Morton code, bit layout matching the reference LUT (x highest:
    key = ... x_i y_i z_i ...; models/pt_v3.py:44-92 builds EX=x<<2 etc)."""
    assert depth <= 10
    x = _part_1by2(g[:, 0])
    y = _part_1by2(g[:, 1])
    z = _part_1by2(g[:, 2])
    return (x << 2) | (y << 1) | z


def hilbert_encode(g: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """Hilbert curve index via the Skilling transform
    (reference: models/pt_v3.py:176-340): gray-code untangling of the
    transposed representation followed by Morton packing."""
    assert depth <= 10
    x = g[:, 0].astype(jnp.int32)
    y = g[:, 1].astype(jnp.int32)
    z = g[:, 2].astype(jnp.int32)

    # Skilling's inverse transform on (x, y, z) — unrolled over bits.
    for i in range(depth - 1, 0, -1):
        q = jnp.int32(1 << i)
        p = q - 1
        # axis 0
        m = (x & q) != 0
        x = jnp.where(m, x ^ p, x)
        # axis 1
        m = (y & q) != 0
        x2 = jnp.where(m, x ^ p, x)
        t = (x ^ y) & p
        x3 = jnp.where(m, x2, x2 ^ t)
        y = jnp.where(m, y, y ^ t)
        x = x3
        # axis 2
        m = (z & q) != 0
        x2 = jnp.where(m, x ^ p, x)
        t = (x ^ z) & p
        x3 = jnp.where(m, x2, x2 ^ t)
        z = jnp.where(m, z, z ^ t)
        x = x3

    # Gray decode
    y = y ^ x
    z = z ^ y
    t = jnp.zeros_like(x)
    for i in range(depth - 1, 0, -1):
        q = jnp.int32(1 << i)
        t = jnp.where((z & q) != 0, t ^ (q - 1), t)
    x = x ^ t
    y = y ^ t
    z = z ^ t

    # Morton-pack the transposed bits (x major)
    return (_part_1by2(x) << 2) | (_part_1by2(y) << 1) | _part_1by2(z)


def encode(g: jnp.ndarray, grid_size: float, order: str,
           depth: int = 10) -> jnp.ndarray:
    """Dispatch like Serializator.encode (models/pt_v3.py:95-117)."""
    if order == "cord":
        return cord_encode(g, grid_size)
    if order == "z":
        return z_order_encode(g, depth)
    if order == "z-trans":
        return z_order_encode(g[:, jnp.array([1, 0, 2])], depth)
    if order == "hilbert":
        return hilbert_encode(g, depth)
    if order == "hilbert-trans":
        return hilbert_encode(g[:, jnp.array([1, 0, 2])], depth)
    raise NotImplementedError(order)


def serialize(coord: jnp.ndarray, valid: jnp.ndarray, grid_size: float,
              orders: Tuple[str, ...], depth: int = 10):
    """Per-sample serialization (reference: Point.serialization,
    models/pt_v3.py:386-445).

    Returns (grid_coord [N,3], codes [O,N], order [O,N], inverse [O,N]):
    codes with invalid points at INVALID_CODE; ``order`` a stable argsort
    per order; ``inverse`` its inverse permutation.
    """
    g = grid_coords(coord, grid_size, valid)
    codes = []
    for o in orders:
        c = encode(g, grid_size, o, depth)
        codes.append(jnp.where(valid, c, INVALID_CODE))
    codes = jnp.stack(codes)  # [O, N]
    order = jnp.argsort(codes, axis=1, stable=True)
    N = coord.shape[0]
    ar = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), codes.shape)
    inverse = jnp.zeros_like(order).at[
        jnp.arange(codes.shape[0])[:, None], order
    ].set(ar)
    return g, codes, order.astype(jnp.int32), inverse.astype(jnp.int32)
