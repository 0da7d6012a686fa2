# -*- coding: utf-8 -*-
"""Pallas TPU kernels for tile-local alpha blending (fwd + bwd).

Same contract and exact same sequential semantics as ``blend.py`` (which is
the portable XLA fallback and correctness oracle); this version runs one grid
program per pixel tile, keeps the (T, C) blend state in vregs, streams the
per-tile Gaussian list chunk-by-chunk from VMEM, and — unlike the XLA scan —
**terminates the k-loop early** per tile once the tile's Gaussian count is
exhausted or every pixel is saturated, which is where the reference's CUDA
kernel gets its speed (forward.cu:282-336).

Gradients are written per (tile, slot) and reduced to per-Gaussian grads by
the caller's gather-transpose — deterministic, no atomics
(vs. backward.cu:547-578).

Tile geometry is (tile_h, tile_w) = (8, 128) by default: exactly one f32
vreg per per-pixel quantity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiancity_tpu.ops.rasterizer.blend import BlendConsts


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(consts: BlendConsts, n_tx: int,
                counts_ref,  # SMEM [T] int32 (scalar prefetch)
                m2d_ref, con_ref, col_ref, op_ref,  # VMEM [1, K, c]
                out_ref, t_ref, nc_ref,  # VMEM [1, 3, TH, TW], [1, TH, TW], [1, TH, TW]
                ):
    TH, TW = consts.tile_h, consts.tile_w
    CK = consts.unroll
    K = m2d_ref.shape[1]
    pid = pl.program_id(0)
    count = counts_ref[pid]

    x0 = ((pid % n_tx) * TW).astype(jnp.float32)
    y0 = ((pid // n_tx) * TH).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.float32, (TH, TW), 1)
    py = y0 + jax.lax.broadcasted_iota(jnp.float32, (TH, TW), 0)

    def chunk_body(state):
        k0, T_acc, C_r, C_g, C_b, nc, done = state
        m2d = m2d_ref[0, pl.ds(k0, CK), :]  # [CK, 2]
        con = con_ref[0, pl.ds(k0, CK), :]  # [CK, 3]
        col = col_ref[0, pl.ds(k0, CK), :]  # [CK, 3]
        op = op_ref[0, pl.ds(k0, CK)]  # [CK]
        for j in range(CK):
            k = k0 + j
            dx = m2d[j, 0] - px
            dy = m2d[j, 1] - py
            ca, cb, cc = con[j, 0], con[j, 1], con[j, 2]
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(consts.alpha_max, op[j] * jnp.exp(power))
            eligible = (
                (k < count)
                & (power <= 0.0)
                & (alpha >= consts.alpha_min)
            )
            test_T = T_acc * (1.0 - alpha)
            live = eligible & jnp.logical_not(done)
            blend_m = live & (test_T >= consts.t_eps)
            done = done | (live & (test_T < consts.t_eps))
            w = jnp.where(blend_m, alpha * T_acc, 0.0)
            C_r = C_r + w * col[j, 0]
            C_g = C_g + w * col[j, 1]
            C_b = C_b + w * col[j, 2]
            T_acc = jnp.where(blend_m, test_T, T_acc)
            nc = jnp.where(blend_m, k + 1, nc)
        return (k0 + CK, T_acc, C_r, C_g, C_b, nc, done)

    def chunk_cond(state):
        k0, T_acc, *_rest, done = state
        return (k0 < count) & jnp.logical_not(jnp.all(done))

    zero = jnp.zeros((TH, TW), dtype=jnp.float32)
    init = (
        jnp.int32(0),
        jnp.ones((TH, TW), dtype=jnp.float32),
        zero, zero, zero,
        jnp.zeros((TH, TW), dtype=jnp.int32),
        jnp.zeros((TH, TW), dtype=jnp.bool_),
    )
    _, T_acc, C_r, C_g, C_b, nc, _ = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )
    out_ref[0, 0] = C_r
    out_ref[0, 1] = C_g
    out_ref[0, 2] = C_b
    t_ref[0] = T_acc
    nc_ref[0] = nc


def blend_tiles_pallas_fwd(
    consts: BlendConsts,
    n_tx: int,
    mean2d_g: jnp.ndarray,  # [T, K, 2]
    conic_g: jnp.ndarray,  # [T, K, 3]
    color_g: jnp.ndarray,  # [T, K, 3]
    opacity_g: jnp.ndarray,  # [T, K]
    counts: jnp.ndarray,  # [T] int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (C [T,3,TH,TW] — WITHOUT background, final_T [T,TH,TW],
    n_contrib [T,TH,TW])."""
    T_tiles, K, _ = mean2d_g.shape
    TH, TW = consts.tile_h, consts.tile_w
    assert K % consts.unroll == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, TH, TW), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((T_tiles, 3, TH, TW), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, TH, TW), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, TH, TW), jnp.int32),
    ]
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, consts, n_tx),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )
    C, final_T, nc = fn(counts, mean2d_g, conic_g, color_g, opacity_g)
    return C, final_T, nc


def _bwd_kernel(consts: BlendConsts, n_tx: int,
                counts_ref,  # SMEM [T]
                m2d_ref, con_ref, col_ref, op_ref,  # VMEM [1, K, c]
                gout_ref,  # VMEM [1, 3, TH, TW]
                bgg_ref,  # VMEM [1, TH, TW]  (bg·g + g_T)
                ft_ref,  # VMEM [1, TH, TW] final_T
                nc_ref,  # VMEM [1, TH, TW] n_contrib
                dm2d_ref, dcon_ref, dcol_ref, dop_ref,  # VMEM [1, K, c] outputs
                ):
    TH, TW = consts.tile_h, consts.tile_w
    CK = consts.unroll
    K = m2d_ref.shape[1]
    pid = pl.program_id(0)
    count = counts_ref[pid]

    x0 = ((pid % n_tx) * TW).astype(jnp.float32)
    y0 = ((pid // n_tx) * TH).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.float32, (TH, TW), 1)
    py = y0 + jax.lax.broadcasted_iota(jnp.float32, (TH, TW), 0)

    g_r = gout_ref[0, 0]
    g_g = gout_ref[0, 1]
    g_b = gout_ref[0, 2]
    bg_dot_g = bgg_ref[0]
    final_T = ft_ref[0]
    nc = nc_ref[0]

    # Zero all grad slots first (the loop may early-exit).
    dm2d_ref[0] = jnp.zeros((K, 2), dtype=jnp.float32)
    dcon_ref[0] = jnp.zeros((K, 3), dtype=jnp.float32)
    dcol_ref[0] = jnp.zeros((K, 3), dtype=jnp.float32)
    dop_ref[0] = jnp.zeros((K,), dtype=jnp.float32)

    # Start at the last chunk that can contain a contributor.
    n_chunks = (count + CK - 1) // CK

    def chunk_body(state):
        ci, T_cur, ar_r, ar_g, ar_b, la, lc_r, lc_g, lc_b = state
        k0 = ci * CK
        m2d = m2d_ref[0, pl.ds(k0, CK), :]
        con = con_ref[0, pl.ds(k0, CK), :]
        col = col_ref[0, pl.ds(k0, CK), :]
        op = op_ref[0, pl.ds(k0, CK)]

        d_m2d_rows = []
        d_con_rows = []
        d_col_rows = []
        d_op_rows = []
        for j in reversed(range(CK)):
            k = k0 + j
            dx = m2d[j, 0] - px
            dy = m2d[j, 1] - py
            ca, cb, cc = con[j, 0], con[j, 1], con[j, 2]
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = jnp.exp(power)
            alpha = jnp.minimum(consts.alpha_max, op[j] * G)
            ok = (
                (k < count)
                & (k < nc)
                & (power <= 0.0)
                & (alpha >= consts.alpha_min)
            )
            okf = ok.astype(jnp.float32)
            one_m_alpha = jnp.where(ok, 1.0 - alpha, 1.0)
            T_cur = T_cur / one_m_alpha

            ar_r = jnp.where(ok, la * lc_r + (1.0 - la) * ar_r, ar_r)
            ar_g = jnp.where(ok, la * lc_g + (1.0 - la) * ar_g, ar_g)
            ar_b = jnp.where(ok, la * lc_b + (1.0 - la) * ar_b, ar_b)

            w_pix = okf * alpha * T_cur
            d_col_rows.append(jnp.stack([
                jnp.sum(w_pix * g_r), jnp.sum(w_pix * g_g),
                jnp.sum(w_pix * g_b)]))

            dL_dalpha = T_cur * (
                (col[j, 0] - ar_r) * g_r
                + (col[j, 1] - ar_g) * g_g
                + (col[j, 2] - ar_b) * g_b
            )
            dL_dalpha = okf * (dL_dalpha - (final_T / one_m_alpha) * bg_dot_g)

            la = jnp.where(ok, alpha, la)
            lc_r = jnp.where(ok, col[j, 0], lc_r)
            lc_g = jnp.where(ok, col[j, 1], lc_g)
            lc_b = jnp.where(ok, col[j, 2], lc_b)

            dL_dG = op[j] * dL_dalpha
            gdx = G * dx
            gdy = G * dy
            d_m2d_rows.append(jnp.stack([
                jnp.sum(dL_dG * (-gdx * ca - gdy * cb)),
                jnp.sum(dL_dG * (-gdy * cc - gdx * cb)),
            ]))
            d_con_rows.append(jnp.stack([
                jnp.sum(-0.5 * gdx * dx * dL_dG),
                jnp.sum(-gdx * dy * dL_dG),
                jnp.sum(-0.5 * gdy * dy * dL_dG),
            ]))
            d_op_rows.append(jnp.sum(G * dL_dalpha))

        # rows were appended j = CK-1 .. 0; reverse to slot order.
        dm2d_ref[0, pl.ds(k0, CK), :] = jnp.stack(d_m2d_rows[::-1])
        dcon_ref[0, pl.ds(k0, CK), :] = jnp.stack(d_con_rows[::-1])
        dcol_ref[0, pl.ds(k0, CK), :] = jnp.stack(d_col_rows[::-1])
        dop_ref[0, pl.ds(k0, CK)] = jnp.stack(d_op_rows[::-1])
        return (ci - 1, T_cur, ar_r, ar_g, ar_b, la, lc_r, lc_g, lc_b)

    def chunk_cond(state):
        return state[0] >= 0

    zero = jnp.zeros((TH, TW), dtype=jnp.float32)
    init = (n_chunks - 1, final_T, zero, zero, zero, zero, zero, zero, zero)
    jax.lax.while_loop(chunk_cond, chunk_body, init)


def blend_tiles_pallas_bwd(
    consts: BlendConsts,
    n_tx: int,
    mean2d_g, conic_g, color_g, opacity_g,
    counts,
    g_out,  # [T, 3, TH, TW]
    bg_dot_g,  # [T, TH, TW]
    final_T,  # [T, TH, TW]
    n_contrib,  # [T, TH, TW]
):
    T_tiles, K, _ = mean2d_g.shape
    TH, TW = consts.tile_h, consts.tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, 3, TH, TW), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, K), lambda i, *_: (i, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((T_tiles, K, 2), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, K, 3), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, K, 3), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, K), jnp.float32),
    ]
    fn = pl.pallas_call(
        functools.partial(_bwd_kernel, consts, n_tx),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )
    return fn(counts, mean2d_g, conic_g, color_g, opacity_g,
              g_out, bg_dot_g, final_T, n_contrib)
