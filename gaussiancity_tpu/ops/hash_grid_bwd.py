# -*- coding: utf-8 -*-
"""TPU backward for the hash-grid embedding table (sorted one-hot MXU
reduction instead of XLA scatter-add).

XLA's TPU scatter-add lowers to a serial per-row update loop (~90 ns per
8-float row): the REST recipe's 8.4M corner-updates per step cost ~730 ms
— the entire train step.  This module replaces it with the TPU-native
pipeline (reference semantics: grid_encoder_ext.cu:141-249 backward):

1. per-level `lax.sort` of (row, position) — batched over levels;
2. one row-gather of the update payload into sorted order (XLA);
3. a Pallas kernel, gridded over (level, table-tile), that streams each
   tile's contiguous sorted slice and reduces duplicates with a one-hot
   matmul on the MXU:
   ``acc[TR, C] += OH[TR, U] @ u_chunk[U, C]`` (contraction on the lane
   axis of both operands) — duplicate rows are summed by the matmul.

Layout rules this obeys (Mosaic): DMA lane extents must be 128-aligned
and sublane extents 8-aligned, so the sorted payload is stored
channel-major ``[L, SUB, Mpad]`` (positions on lanes; channels on
sublanes 0..C-1 with the key row at the next 8-aligned sublane) and
chunk starts are rounded down to 128.  Both the round-down overlap and
the fixed-size tail read are harmless: keys outside the tile produce
all-zero one-hot rows.  Keys ride in the payload as exact f32 integers
(< 2^24), so each chunk is ONE contiguous ``[SUB, U]`` DMA.  There is no
per-tile capacity: skewed/dense levels just run more chunks — no update
is ever dropped.  The MXU matmul itself runs as two native bf16 passes
(exact one-hot x hi/lo-split payload), giving ~f32 accuracy.

The sorted slice boundaries come from `searchsorted` (scalar-prefetched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Table-tile rows per grid program and updates per chunk (swept on-chip:
# (512, 1024) 78.6 ms vs (512, 512) 84.8 at the REST shape).  On CPU
# (interpret mode) keep them tiny so unrolled/interp loops stay fast.
TR_TPU, U_TPU = 512, 1024
TR_CPU, U_CPU = 32, 32
_ALIGN = 128  # lane alignment for chunk starts


def _tile_sizes():
    if jax.default_backend() == "tpu":
        return TR_TPU, U_TPU
    return TR_CPU, U_CPU


def _bwd_kernel(U: int, TR: int, C: int, Ca: int,
                starts_ref,  # scalar prefetch [L * (T + 1)] int32
                uaug_ref,  # ANY [L, SUB, Mpad] f32 (channels 0..C-1,
                #            key at row Ca; sorted along lanes)
                out_ref,  # VMEM [1, 1, C, TR]
                ubuf_ref,  # VMEM scratch [SUB, U]
                sem_ref,  # DMA semaphore
                ):
    l = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    m0 = starts_ref[l * (T + 1) + t]
    m1 = starts_ref[l * (T + 1) + t + 1]
    m0a = (m0 // _ALIGN) * _ALIGN  # aligned start (overlap rows are inert)
    count = m1 - m0a
    base = (t * TR).astype(jnp.float32)

    # (int iota then cast: Mosaic rejects f32 iota)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TR, U), 0).astype(
        jnp.float32)

    def chunk_body(j, acc):
        dma = pltpu.make_async_copy(
            uaug_ref.at[l, :, pl.ds(m0a + j * U, U)],
            ubuf_ref,
            sem_ref,
        )
        dma.start()
        dma.wait()
        chunk = ubuf_ref[:]  # [SUB, U]
        local = chunk[Ca:Ca + 1, :] - base  # [1, U] f32 exact ints
        oh = (rows == local).astype(jnp.bfloat16)  # [TR, U] exact 0/1
        vals = chunk[0:C, :]  # [C, U]
        # The MXU runs f32 matmuls as a single demoted bf16 pass here
        # (xla_allow_excess_precision); the one-hot operand is exact in
        # bf16, so a hi/lo split of the payload recovers ~f32 accuracy
        # with two native bf16 passes (error ~2^-16 relative).
        v_hi = vals.astype(jnp.bfloat16)
        v_lo = (vals - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))  # contract the U lane axis of both
        return (acc
                + jax.lax.dot_general(oh, v_hi, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(oh, v_lo, dn,
                                      preferred_element_type=jnp.float32))

    acc0 = jnp.zeros((TR, C), dtype=jnp.float32)
    acc = jax.lax.fori_loop(0, pl.cdiv(count, U), chunk_body, acc0)
    out_ref[0, 0] = acc.T  # [C, TR] (lane dim = TR, 128-aligned)


def scatter_rows_sorted(
    uaug: jnp.ndarray,  # [L, SUB, Mpad]: channels 0..C-1, key at row Ca
    starts: jnp.ndarray,  # [L, T + 1] int32 tile boundaries
    n_rows: int,  # R_max (tiled table rows per level)
    n_channels: int,
    interpret: bool = False,
    tile_sizes=None,  # optional (TR, U) override
) -> jnp.ndarray:
    """Returns per-level dense grads [L, T, C, TR] (row r of level l is
    [l, r // TR, :, r % TR])."""
    L, SUB, Mpad = uaug.shape
    C, Ca = n_channels, -(-n_channels // 8) * 8
    assert SUB == Ca + 8
    TR, U = tile_sizes or _tile_sizes()
    assert n_rows % TR == 0
    assert Mpad % _ALIGN == 0 and Mpad % U == 0
    T = n_rows // TR

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, TR), lambda l, t, *_: (l, t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, U), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_bwd_kernel, U, TR, C, Ca),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((L, T, C, TR), jnp.float32)],
        interpret=interpret or jax.default_backend() != "tpu",
    )(starts.reshape(-1), uaug)
    return out


def hash_grad_embeddings(
    idx: jnp.ndarray,  # [L, NC, N] int32 LEVEL-LOCAL rows
    w: jnp.ndarray,  # [L, NC, N] f32 corner weights
    g_l: jnp.ndarray,  # [L, N, C] f32 upstream grads (oob already zeroed)
    n_rows: int,  # R_max: rows per level in the [L, R_max, C] table
    tile_sizes=None,  # optional (TR, U) override (see _tile_sizes)
) -> jnp.ndarray:
    """Dense [L, n_rows, C] embedding gradient via sort + MXU one-hot."""
    L, NC, N = idx.shape
    C = g_l.shape[-1]
    M = NC * N
    TR, U = tile_sizes or _tile_sizes()
    r_max = -(-n_rows // TR) * TR  # round up to tile multiple
    T = r_max // TR
    # pad so fixed-size aligned chunk DMAs stay in bounds
    pad_to = max(U, _ALIGN)
    Mpad = -(-(M + pad_to) // pad_to) * pad_to

    keys = idx.reshape(L, M)
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (L, M))
    # Carry the corner weight THROUGH the sort and gather the (small)
    # [N, C] grad rows afterwards: building w*g in original order and
    # reordering it costs an 8.4M-row gather from a 268MB array (~120 ms
    # on-chip); the per-level [N, C] gather below hits a ~512KB working
    # set instead.
    sk, sp, sw = lax.sort((keys, pos, w.reshape(L, M)), dimension=1,
                          num_keys=1)
    n_sorted = sp % N  # reshape order of idx/w is m = corner * N + point
    g_sorted = jnp.stack([g_l[lvl][n_sorted[lvl]] for lvl in range(L)])
    u_sorted = sw[:, :, None] * g_sorted  # [L, M, C]
    # channel-major [L, SUB, Mpad] with 8-aligned sublane layout:
    # channels 0..C-1, key at row Ca, rest zero.  Sentinel keys are
    # beyond every tile -> all-zero one-hot rows.
    Ca = -(-C // 8) * 8
    SUB = Ca + 8
    uT = u_sorted.transpose(0, 2, 1)  # [L, C, M]
    parts = [uT]
    if Ca > C:
        parts.append(jnp.zeros((L, Ca - C, M), uT.dtype))
    parts.append(sk.astype(jnp.float32)[:, None, :])
    parts.append(jnp.zeros((L, SUB - Ca - 1, M), uT.dtype))
    uaug = jnp.concatenate(parts, axis=1)  # [L, SUB, M]
    pad = jnp.zeros((L, SUB, Mpad - M), uaug.dtype).at[:, Ca, :].set(
        float(2 ** 23))
    uaug = jnp.concatenate([uaug, pad], axis=2)

    bounds = jnp.arange(T + 1, dtype=jnp.int32) * TR
    starts = jax.vmap(lambda a: jnp.searchsorted(a, bounds))(sk)
    starts = starts.astype(jnp.int32)

    tiles = scatter_rows_sorted(uaug, starts, r_max, C,
                                tile_sizes=(TR, U))  # [L, T, C, TR]
    per_level = tiles.transpose(0, 1, 3, 2).reshape(L, r_max, C)
    return per_level[:, :n_rows]
