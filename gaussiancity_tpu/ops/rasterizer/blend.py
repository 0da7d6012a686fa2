# -*- coding: utf-8 -*-
"""Tile-local front-to-back alpha blending with a deterministic custom VJP.

Replaces the reference's ``renderCUDA`` forward and backward kernels
(reference: cuda_rasterizer/forward.cu:238-346, backward.cu:427-581) with
static-shape XLA scans.  The backward reproduces the reference's exact
gradient semantics — back-to-front re-traversal with transmittance
reconstruction ``T <- T / (1 - alpha)`` and the ``accum_rec`` suffix-color
recurrence — but produces per-(tile, slot) gradients that flow back to
per-Gaussian gradients through JAX's (deterministic) gather transpose,
instead of CUDA ``atomicAdd``.

The sequential per-pixel semantics mirrored exactly:
  - a slot is *eligible* iff it holds a real entry, ``power <= 0`` and
    ``alpha >= 1/255`` (forward.cu:308-319)
  - an eligible slot *blends* iff the pixel is not done and
    ``T * (1 - alpha) >= 1e-4``; otherwise it marks the pixel done
    (forward.cu:320-324)
  - backward only visits slots ``k < n_contrib`` (backward.cu:509-513) and
    applies no gradient gating on the 0.99 alpha clamp (backward.cu:525-529),
    matching the reference.

A Pallas TPU kernel implementing the same contract lives in
``blend_pallas.py``; this XLA version is the portable fallback and the
correctness oracle for it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BlendConsts(NamedTuple):
    tile_h: int
    tile_w: int
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.99
    t_eps: float = 1e-4
    unroll: int = 8
    backend: str = "xla"  # "xla" | "pallas"
    n_tx: int = 1  # tiles per row (pallas backend derives origins from it)
    # Reference 16x16-block gating (config.h:15 BLOCK_X/Y): a Gaussian
    # touches a pixel only if the pixel's 16x16 block lies in its
    # getRect() bbox.  Makes the render bit-comparable to the reference
    # CUDA renderer and independent of this repo's own tile shape.  The
    # XLA path reads the radius from ``kvalid`` (which then carries
    # radius-or-0 instead of 1-or-0); the Pallas path from attrs row 9.
    ref_gate: bool = False


def _rect16_gate(m2d, radius, bx16, by16):
    """Reference 16x16-block rect membership (auxiliary.h:36-46 getRect):
    [T, TH, TW] bool from per-slot mean/radius and pixel-block planes."""
    xlo = jnp.floor((m2d[:, 0] - radius) * 0.0625)[:, None, None]
    xhi = jnp.floor((m2d[:, 0] + radius + 15.0) * 0.0625)[:, None, None]
    ylo = jnp.floor((m2d[:, 1] - radius) * 0.0625)[:, None, None]
    yhi = jnp.floor((m2d[:, 1] + radius + 15.0) * 0.0625)[:, None, None]
    return ((bx16 >= xlo) & (bx16 < xhi) & (by16 >= ylo) & (by16 < yhi))


def _pixel_grids(consts: BlendConsts, x0f: jnp.ndarray, y0f: jnp.ndarray):
    TH, TW = consts.tile_h, consts.tile_w
    iy = jnp.arange(TH, dtype=jnp.float32)
    ix = jnp.arange(TW, dtype=jnp.float32)
    py = y0f[:, None, None] + iy[None, :, None]  # [T, TH, 1]
    px = x0f[:, None, None] + ix[None, None, :]  # [T, 1, TW]
    return px, py


def _to_k_major(a: jnp.ndarray) -> jnp.ndarray:
    """[T, K, ...] -> [K, T, ...] for use as scan xs."""
    return jnp.moveaxis(a, 1, 0)


def _blend_fwd_impl(
    consts: BlendConsts,
    mean2d_g: jnp.ndarray,  # [T, K, 2]
    conic_g: jnp.ndarray,  # [T, K, 3]
    color_g: jnp.ndarray,  # [T, K, 3]
    opacity_g: jnp.ndarray,  # [T, K]
    kvalid: jnp.ndarray,  # [T, K] float32 0/1
    x0f: jnp.ndarray,  # [T] float32 tile pixel origin x
    y0f: jnp.ndarray,  # [T]
    bg: jnp.ndarray,  # [3]
):
    T_tiles, K = kvalid.shape
    TH, TW = consts.tile_h, consts.tile_w
    px, py = _pixel_grids(consts, x0f, y0f)
    bx16 = jnp.floor(px * 0.0625) if consts.ref_gate else None
    by16 = jnp.floor(py * 0.0625) if consts.ref_gate else None

    xs = (
        _to_k_major(mean2d_g),
        _to_k_major(conic_g),
        _to_k_major(color_g),
        _to_k_major(opacity_g),
        _to_k_major(kvalid),
    )

    def step(carry, x):
        T_acc, C_acc, done, nc, k = carry
        m2d, con, col, op, kv = x  # [T,2],[T,3],[T,3],[T],[T]
        dx = m2d[:, 0][:, None, None] - px
        dy = m2d[:, 1][:, None, None] - py
        ca = con[:, 0][:, None, None]
        cb = con[:, 1][:, None, None]
        cc = con[:, 2][:, None, None]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(
            consts.alpha_max, op[:, None, None] * jnp.exp(power)
        )
        eligible = (kv > 0)[:, None, None] & (power <= 0.0) & (alpha >= consts.alpha_min)
        if consts.ref_gate:  # kv carries the radius (blend_pallas doc)
            eligible &= _rect16_gate(m2d, kv, bx16, by16)
        test_T = T_acc * (1.0 - alpha)
        live = eligible & jnp.logical_not(done)
        blend = live & (test_T >= consts.t_eps)
        newly_done = live & (test_T < consts.t_eps)
        w = jnp.where(blend, alpha * T_acc, 0.0)
        C_acc = C_acc + w[..., None] * col[:, None, None, :]
        T_acc = jnp.where(blend, test_T, T_acc)
        done = done | newly_done
        nc = jnp.where(blend, k + 1, nc)
        return (T_acc, C_acc, done, nc, k + 1), None

    T0 = jnp.ones((T_tiles, TH, TW), dtype=jnp.float32)
    C0 = jnp.zeros((T_tiles, TH, TW, 3), dtype=jnp.float32)
    done0 = jnp.zeros((T_tiles, TH, TW), dtype=bool)
    nc0 = jnp.zeros((T_tiles, TH, TW), dtype=jnp.int32)
    (final_T, C, _, n_contrib, _), _ = jax.lax.scan(
        step, (T0, C0, done0, nc0, jnp.int32(0)), xs, unroll=consts.unroll
    )
    out = C + final_T[..., None] * bg[None, None, None, :]
    return out, final_T, n_contrib


def _blend_bwd_impl(
    consts: BlendConsts,
    mean2d_g,
    conic_g,
    color_g,
    opacity_g,
    kvalid,
    x0f,
    y0f,
    bg,
    final_T,
    n_contrib,
    g_out,  # [T, TH, TW, 3] cotangent of `out`
    g_T,  # [T, TH, TW] cotangent of `final_T` output
):
    T_tiles, K = kvalid.shape
    px, py = _pixel_grids(consts, x0f, y0f)
    bx16 = jnp.floor(px * 0.0625) if consts.ref_gate else None
    by16 = jnp.floor(py * 0.0625) if consts.ref_gate else None

    # dL/dbg = sum_pix T_final * g  (out = C + T_final * bg)
    d_bg = jnp.einsum("thw,thwc->c", final_T, g_out)
    # bg also couples alpha gradients: d out/d alpha via T_final, plus the
    # explicit final_T output cotangent.
    bg_dot_g = jnp.einsum("c,thwc->thw", bg, g_out) + g_T

    xs = (
        _to_k_major(mean2d_g)[::-1],
        _to_k_major(conic_g)[::-1],
        _to_k_major(color_g)[::-1],
        _to_k_major(opacity_g)[::-1],
        _to_k_major(kvalid)[::-1],
    )

    def step(carry, x):
        T_cur, accum_rec, last_alpha, last_color, k = carry
        m2d, con, col, op, kv = x
        dx = m2d[:, 0][:, None, None] - px
        dy = m2d[:, 1][:, None, None] - py
        ca = con[:, 0][:, None, None]
        cb = con[:, 1][:, None, None]
        cc = con[:, 2][:, None, None]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(power)
        alpha = jnp.minimum(consts.alpha_max, op[:, None, None] * G)
        ok = (
            (kv > 0)[:, None, None]
            & (k < n_contrib)
            & (power <= 0.0)
            & (alpha >= consts.alpha_min)
        )
        if consts.ref_gate:
            ok &= _rect16_gate(m2d, kv, bx16, by16)
        okf = ok.astype(jnp.float32)
        one_m_alpha = jnp.where(ok, 1.0 - alpha, 1.0)
        T_cur = T_cur / one_m_alpha  # T before blending this slot

        # accum_rec recurrence (backward.cu:536-541)
        accum_rec = jnp.where(
            ok[..., None],
            last_alpha[..., None] * last_color
            + (1.0 - last_alpha[..., None]) * accum_rec,
            accum_rec,
        )
        col_b = col[:, None, None, :]  # [T,1,1,3]
        # dL/dcolor of this slot: sum over pixels of alpha*T*g
        w_pix = okf * alpha * T_cur  # [T,TH,TW]
        d_col = jnp.einsum("thw,thwc->tc", w_pix, g_out)

        dL_dalpha = T_cur * jnp.einsum(
            "thwc,thwc->thw", col_b - accum_rec, g_out
        )
        dL_dalpha = dL_dalpha - (final_T / one_m_alpha) * bg_dot_g
        dL_dalpha = okf * dL_dalpha

        last_alpha = jnp.where(ok, alpha, last_alpha)
        last_color = jnp.where(ok[..., None], jnp.broadcast_to(
            col_b, last_color.shape), last_color)

        # alpha = min(0.99, op*G): no clamp gating, matching backward.cu:525
        dL_dG = op[:, None, None] * dL_dalpha
        gdx = G * dx
        gdy = G * dy
        d_mx = jnp.sum(dL_dG * (-gdx * ca - gdy * cb), axis=(1, 2))
        d_my = jnp.sum(dL_dG * (-gdy * cc - gdx * cb), axis=(1, 2))
        d_ca = jnp.sum(-0.5 * gdx * dx * dL_dG, axis=(1, 2))
        d_cb = jnp.sum(-gdx * dy * dL_dG, axis=(1, 2))
        d_cc = jnp.sum(-0.5 * gdy * dy * dL_dG, axis=(1, 2))
        d_op = jnp.sum(G * dL_dalpha, axis=(1, 2))

        ys = (
            jnp.stack([d_mx, d_my], axis=-1),
            jnp.stack([d_ca, d_cb, d_cc], axis=-1),
            d_col,
            d_op,
        )
        return (T_cur, accum_rec, last_alpha, last_color, k - 1), ys

    TH, TW = consts.tile_h, consts.tile_w
    carry0 = (
        final_T,
        jnp.zeros((T_tiles, TH, TW, 3), dtype=jnp.float32),
        jnp.zeros((T_tiles, TH, TW), dtype=jnp.float32),
        jnp.zeros((T_tiles, TH, TW, 3), dtype=jnp.float32),
        jnp.int32(K - 1),
    )
    _, (d_m2d, d_con, d_col, d_op) = jax.lax.scan(
        step, carry0, xs, unroll=consts.unroll
    )
    # ys are stacked k-major in reverse order: flip and move to [T, K, ...]
    d_m2d = jnp.moveaxis(d_m2d[::-1], 0, 1)
    d_con = jnp.moveaxis(d_con[::-1], 0, 1)
    d_col = jnp.moveaxis(d_col[::-1], 0, 1)
    d_op = jnp.moveaxis(d_op[::-1], 0, 1)
    return d_m2d, d_con, d_col, d_op, d_bg


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_tiles(
    consts: BlendConsts,
    mean2d_g: jnp.ndarray,
    conic_g: jnp.ndarray,
    color_g: jnp.ndarray,
    opacity_g: jnp.ndarray,
    kvalid: jnp.ndarray,
    x0f: jnp.ndarray,
    y0f: jnp.ndarray,
    bg: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blend per-tile gathered Gaussians (portable XLA path; the Pallas
    fast path is ``blend_tiles_packed``). Returns (out [T,TH,TW,3],
    final_T [T,TH,TW])."""
    out, final_T, _ = _blend_fwd_impl(
        consts, mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f, bg
    )
    return out, final_T


def _blend_tiles_fwd(consts, mean2d_g, conic_g, color_g, opacity_g, kvalid,
                     x0f, y0f, bg):
    out, final_T, n_contrib = _blend_fwd_impl(
        consts, mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f, bg
    )
    res = (mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f, bg,
           final_T, n_contrib)
    return (out, final_T), res


def _blend_tiles_bwd(consts, res, cts):
    (mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f, bg,
     final_T, n_contrib) = res
    g_out, g_T = cts
    d_m2d, d_con, d_col, d_op, d_bg = _blend_bwd_impl(
        consts, mean2d_g, conic_g, color_g, opacity_g, kvalid, x0f, y0f,
        bg, final_T, n_contrib, g_out, g_T,
    )
    zeros_kv = jnp.zeros_like(kvalid)
    zeros_x0 = jnp.zeros_like(x0f)
    zeros_y0 = jnp.zeros_like(y0f)
    return (d_m2d, d_con, d_col, d_op, zeros_kv, zeros_x0, zeros_y0, d_bg)


blend_tiles.defvjp(_blend_tiles_fwd, _blend_tiles_bwd)


# ---------------------------------------------------------------------------
# Packed fast path (Pallas backend): one [T, NC, 16, page] attribute tensor
# straight from the binning row-gather — no per-field gathers or packing.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_tiles_packed(
    consts: BlendConsts,
    attrs_paged: jnp.ndarray,  # [T, NC, 16, page]
    counts_f: jnp.ndarray,  # [T] float32 (int semantics)
    origin_f: jnp.ndarray,  # [2] float32 (wx0, wy0) window pixel origin
    bg: jnp.ndarray,  # [3]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out [T, TH, TW, 3] incl. background, final_T [T, TH, TW])."""
    out, final_T, _ = _packed_fwd(consts, attrs_paged, counts_f, origin_f, bg)
    return out, final_T


def _packed_fwd(consts, attrs_paged, counts_f, origin_f, bg):
    from gaussiancity_tpu.ops.rasterizer import blend_pallas

    counts = counts_f.astype(jnp.int32)
    C, final_T, n_contrib = blend_pallas.blend_tiles_pallas_fwd(
        consts, consts.n_tx, attrs_paged, counts, origin_f)
    out = jnp.moveaxis(C, 1, -1) + final_T[..., None] * bg[None, None, None, :]
    return out, final_T, n_contrib


def _packed_fwd_rule(consts, attrs_paged, counts_f, origin_f, bg):
    out, final_T, n_contrib = _packed_fwd(consts, attrs_paged, counts_f,
                                          origin_f, bg)
    return (out, final_T), (attrs_paged, counts_f, origin_f, bg, final_T,
                            n_contrib)


def _packed_bwd_rule(consts, res, cts):
    from gaussiancity_tpu.ops.rasterizer import blend_pallas

    attrs_paged, counts_f, origin_f, bg, final_T, n_contrib = res
    g_out, g_T = cts
    counts = counts_f.astype(jnp.int32)
    d_bg = jnp.einsum("thw,thwc->c", final_T, g_out)
    bg_dot_g = jnp.einsum("c,thwc->thw", bg, g_out) + g_T
    grads = blend_pallas.blend_tiles_pallas_bwd(
        consts, consts.n_tx, attrs_paged, counts,
        jnp.moveaxis(g_out, -1, 1), bg_dot_g, final_T, n_contrib, origin_f)
    return (grads, jnp.zeros_like(counts_f), jnp.zeros_like(origin_f), d_bg)


blend_tiles_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)


# ---------------------------------------------------------------------------
# Gather + blend with a bounded backward slot space.
#
# Alpha blending saturates front-to-back: in city scenes the transmittance
# hits t_eps after a few dozen Gaussians, so slots past the tile's deepest
# n_contrib provably receive ZERO gradient (the reference backward visits
# only k < n_contrib, backward.cu:509-513).  The gather's automatic VJP
# would still scatter-add every one of the T*K padded slot rows into the
# [N, 16] gradient table — the single most expensive stage of the measured
# fwd+bwd breakdown.  This custom VJP scatters only the first
# ``grad_capacity`` slots per tile and reports exactness through the
# forward's ``n_grad_truncated`` output: when it is 0 (every tile's
# min(count, max n_contrib) fits), gradients are bit-identical to the
# unbounded scatter.
# ---------------------------------------------------------------------------


def _gather_pack(attrs16: jnp.ndarray, idx: jnp.ndarray, page: int):
    """[N, 16], [T, K] -> [T, K/page, 16, page] paged kernel layout."""
    T_tiles, K = idx.shape
    gathered = attrs16.at[idx.reshape(-1)].get(
        mode="promise_in_bounds")  # [T*K, 16]
    return gathered.reshape(T_tiles, K // page, page, 16).transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def blend_gathered(
    consts: BlendConsts,
    grad_capacity: int,  # 0 = unbounded (scatter all K slots)
    grad_budget: int,  # >0: compacted scatter over this many total rows
    page: int,  # slot-page size (0 = backend default)
    attrs16: jnp.ndarray,  # [N, 16] packed per-Gaussian attributes
    idx_f: jnp.ndarray,  # [T, K] float32 (int semantics, < 2^24)
    counts_f: jnp.ndarray,  # [T] float32 (int semantics)
    origin_f: jnp.ndarray,  # [2] float32 (wx0, wy0) window pixel origin
    bg: jnp.ndarray,  # [3]
):
    """Returns (out [T, TH, TW, 3] incl. background, final_T [T, TH, TW],
    n_grad_truncated scalar int32)."""
    out, final_T, n_contrib, attrs_paged = _gathered_fwd(
        consts, attrs16, idx_f, counts_f, origin_f, bg, page)
    return out, final_T, _grad_trunc_count(
        counts_f, n_contrib, grad_capacity, grad_budget, idx_f.shape[1],
        attrs_paged.shape[3])


def _grad_slots(grad_capacity: int, K: int) -> int:
    return K if grad_capacity <= 0 else min(K, grad_capacity)


def _k_hi(counts_f, n_contrib, grad_capacity, K):
    """Per-tile deepest slot carrying gradient, clipped to the cap."""
    k_hi = jnp.minimum(counts_f.astype(jnp.int32),
                       jnp.max(n_contrib, axis=(1, 2)))
    return jnp.minimum(k_hi, _grad_slots(grad_capacity, K))


def _grad_trunc_count(counts_f, n_contrib, grad_capacity, grad_budget, K,
                      page):
    """Slots that carry gradient but fall past grad_capacity/grad_budget.
    The compacted scatter consumes whole PAGES per tile (contiguous
    dynamic-slice reads), so the budget check is page-rounded."""
    kb = _grad_slots(grad_capacity, K)
    k_hi = jnp.minimum(counts_f.astype(jnp.int32),
                       jnp.max(n_contrib, axis=(1, 2)))
    trunc = jnp.sum(jnp.maximum(k_hi - kb, 0))
    if grad_budget > 0:
        kh = jnp.minimum(k_hi, kb)
        total = jnp.sum(-(-kh // page) * page)
        # the scatter enumerates floor(budget / page) whole pages
        budget_eff = (grad_budget // page) * page
        trunc = trunc + jnp.maximum(total - budget_eff, 0)
    return trunc.astype(jnp.int32)


def _gathered_fwd(consts, attrs16, idx_f, counts_f, origin_f, bg, page):
    from gaussiancity_tpu.ops.rasterizer import blend_pallas

    page = page or blend_pallas.default_page()
    idx = idx_f.astype(jnp.int32)
    attrs_paged = _gather_pack(attrs16, idx, page)
    counts = counts_f.astype(jnp.int32)
    C, final_T, n_contrib = blend_pallas.blend_tiles_pallas_fwd(
        consts, consts.n_tx, attrs_paged, counts, origin_f)
    out = jnp.moveaxis(C, 1, -1) + final_T[..., None] * bg[None, None, None, :]
    return out, final_T, n_contrib, attrs_paged


def _gathered_fwd_rule(consts, grad_capacity, grad_budget, page, attrs16,
                       idx_f, counts_f, origin_f, bg):
    out, final_T, n_contrib, attrs_paged = _gathered_fwd(
        consts, attrs16, idx_f, counts_f, origin_f, bg, page)
    n_trunc = _grad_trunc_count(counts_f, n_contrib, grad_capacity,
                                grad_budget, idx_f.shape[1],
                                attrs_paged.shape[3])
    res = (attrs16.shape[0], attrs_paged, idx_f, counts_f, origin_f, bg,
           final_T, n_contrib)
    return (out, final_T, n_trunc), res


def _gathered_bwd_rule(consts, grad_capacity, grad_budget, page, res, cts):
    from gaussiancity_tpu.ops.rasterizer import blend_pallas

    (N, attrs_paged, idx_f, counts_f, origin_f, bg, final_T,
     n_contrib) = res
    g_out, g_T, _ = cts  # n_grad_truncated is a diagnostic int: no tangent
    counts = counts_f.astype(jnp.int32)
    d_bg = jnp.einsum("thw,thwc->c", final_T, g_out)
    bg_dot_g = jnp.einsum("c,thwc->thw", bg, g_out) + g_T
    grads = blend_pallas.blend_tiles_pallas_bwd(
        consts, consts.n_tx, attrs_paged, counts,
        jnp.moveaxis(g_out, -1, 1), bg_dot_g, final_T, n_contrib, origin_f)
    k_hi = _k_hi(counts_f, n_contrib, grad_capacity, grads.shape[1]
                 * grads.shape[3])
    d_attrs16 = scatter_packed_grads(grad_capacity, grad_budget, N, grads,
                                     idx_f.astype(jnp.int32), k_hi)
    return (d_attrs16, jnp.zeros_like(idx_f), jnp.zeros_like(counts_f),
            jnp.zeros_like(origin_f), d_bg)


def _reduce_rows_mxu(keys, rows, N):
    """Sum ``rows`` [M, R] into ``out`` [N, R] by ``keys`` [M] int32.

    XLA's TPU scatter-add is a serial per-row loop — at the headline
    shape this stage measured 3.95 ms, the LARGEST rasterizer stage
    (VERDICT r4 item 2).  This reuses the sorted one-hot MXU reduction
    (ops/hash_grid_bwd.py, vs the reference's free-form atomicAdd at
    backward.cu:547-578): deterministic AND faster.  Rows with key == N
    land beyond the last table tile and are dropped."""
    from gaussiancity_tpu.ops import hash_grid_bwd

    M = keys.shape[0]
    return hash_grid_bwd.hash_grad_embeddings(
        keys.reshape(1, 1, M), jnp.ones((1, 1, M), jnp.float32),
        rows[None], n_rows=N)[0]


def scatter_packed_grads(grad_capacity, grad_budget, N, grads, idx, k_hi):
    """Reduce per-(tile, slot) packed grads [T, NC, R, page] to
    per-Gaussian rows [N, R] through the binning index (the VJP transpose
    of the binning gather).  ``k_hi`` [T] bounds each tile's
    gradient-carrying slots (see _k_hi)."""
    T_tiles, NC, R, page = grads.shape
    K = NC * page
    if grad_budget > 0:
        # Compacted scatter: enumerate only the PAGES of (tile, k)
        # positions with k < k_hi — the slots that can carry gradient —
        # into a static budget of rows.  The ragged concat uses the
        # scatter-ones + cumsum trick (no searchsorted); pages are read
        # with batched dynamic_slice (contiguous — an element gather here
        # measured ~80x slower, CLAUDE.md rules); overflow beyond the
        # budget is reported by the forward's n_grad_truncated.
        BP = grad_budget // page
        pages_t = -(-k_hi // page)  # [T]
        poff = jnp.cumsum(pages_t) - pages_t  # exclusive [T]
        total_p = poff[-1] + pages_t[-1]
        marks = jnp.zeros((BP,), jnp.int32).at[poff[1:]].add(
            1, mode="drop")  # zero-depth tiles stack marks: .add, not .set
        p = jnp.arange(BP, dtype=jnp.int32)
        t_of_p = jnp.cumsum(marks)
        q_of_p = p - poff.at[t_of_p].get(mode="promise_in_bounds")
        vpage = p < total_p
        t_c = jnp.where(vpage, t_of_p, 0)
        q_c = jnp.where(vpage, q_of_p, 0)
        row0 = t_c * K + q_c * page  # [BP] page start rows
        # slot-major rows first: indexing the lane (page) axis per row is
        # a lane-gather, ~8x slower than a row gather (CLAUDE.md rules)
        g_flat = grads.transpose(0, 1, 3, 2).reshape(T_tiles * K, R)
        g_pages = jax.vmap(lambda s: jax.lax.dynamic_slice(
            g_flat, (s, 0), (page, R)))(row0)  # [BP, page, R]
        i_pages = jax.vmap(lambda s: jax.lax.dynamic_slice(
            idx.reshape(-1), (s,), (page,)))(row0)  # [BP, page]
        khi_c = k_hi.at[t_c].get(mode="promise_in_bounds")
        rvalid = vpage[:, None] & (
            q_c[:, None] * page + jnp.arange(page)[None, :]
            < khi_c[:, None])
        rows = jnp.where(rvalid[..., None], g_pages, 0.0).reshape(-1, R)
        if jax.default_backend() == "tpu":
            d_attrs16 = _reduce_rows_mxu(
                jnp.where(rvalid, i_pages, N).reshape(-1), rows, N)
        else:
            d_attrs16 = jnp.zeros((N, R), jnp.float32).at[
                jnp.where(rvalid, i_pages, 0).reshape(-1)].add(
                rows, mode="promise_in_bounds")
    else:
        kb = _grad_slots(grad_capacity, K)
        ncb = -(-kb // page)  # slice whole pages
        g_rows = grads[:, :ncb].transpose(0, 1, 3, 2).reshape(
            T_tiles * ncb * page, R)
        d_attrs16 = jnp.zeros((N, R), jnp.float32).at[
            idx[:, : ncb * page].reshape(-1)].add(
            g_rows, mode="promise_in_bounds")
    return d_attrs16


blend_gathered.defvjp(_gathered_fwd_rule, _gathered_bwd_rule)
