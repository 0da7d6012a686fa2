# -*- coding: utf-8 -*-
"""Pallas TPU kernels for tile-local alpha blending (fwd + bwd).

Same contract and exact sequential semantics as the XLA scan in ``blend.py``
(the portable fallback and correctness oracle), but one grid program per
pixel tile with the (T, C) blend state held in vregs, and **early exit**: the
k-loop stops at the tile's Gaussian count or when every pixel saturates —
where the reference CUDA kernel gets its speed (forward.cu:238-346).

Layout: per-tile Gaussian attributes are packed [T, NC, 16, 128] — the K
slot axis is split into NC chunks of 128 slots; each chunk is one (16, 128)
f32 VMEM tile (attribute rows on sublanes, slots on lanes), so the dynamic
k-loop indexes whole pages and never needs an unaligned lane slice.
Rows: 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6..8 rgb
(9..15 spare).  Gradients are returned in the same layout.

Square spatial tiles on rectangular vregs: the per-pixel state is held in
(8, 128) f32 vregs (the VPU shape), but the SPATIAL tile it represents is
(tile_h, tile_w) with tile_h * tile_w == 1024 — e.g. the default 32x32 —
via the strip mapping  px = x0 + lane % TW,  py = y0 + 8*(lane // TW) +
sublane  (``strips = 128 // TW`` horizontal strips of 8 rows stacked on
the lane axis).  Every slot instruction still blends 1024 pixels, but a
square tile covers ~1.4x fewer tiles per (near-isotropic) Gaussian than
the naive 8x128 vreg-shaped tile, cutting the pair count through binning,
gather and both blend passes by the same factor (the reference uses 16x16
tiles for the same reason, config.h:15).  ``strips == 1`` reproduces the
plain vreg-shaped layout exactly.  Kernel outputs/cotangents cross the
wrapper in vreg layout and are (de)remapped there — three cheap XLA
transposes per call, never inside the kernel.

Within a chunk, slots are processed in groups of ``SUB`` (static lane
slices): the expensive math (exp, conic quadratic) is vectorized over
(SUB, TH, TW); only the cheap transmittance recurrence runs sequentially.

Gradients are per (tile, slot) and reduced to per-Gaussian by the caller's
gather transpose — deterministic, no atomics (vs. backward.cu:547-578).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiancity_tpu.ops.rasterizer.blend import BlendConsts

ATTR_ROWS = 16
N_GRAD_ROWS = 9
SUB = 8  # slots vectorized per inner group


def default_page() -> int:
    # 128-slot pages = one (16, 128) f32 VMEM tile on TPU; interpret mode
    # (CPU tests) uses small pages to keep the unrolled body compilable.
    return 128 if jax.default_backend() == "tpu" else 16
ROW_MX, ROW_MY, ROW_CA, ROW_CB, ROW_CC, ROW_OP, ROW_CR, ROW_CG, ROW_CB2 = range(9)
ROW_RD = 9  # screen radius (int-valued f32) — feeds the 16x16 ref gate
ROW_GM = 10  # per-(tile, slot) 16x16-block gate bitmask (stamped by the
#              wrappers from ROW_MX/MY/RD; see _stamp_gate_mask)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _strips(tile_h: int, tile_w: int) -> int:
    """Horizontal 8-row strips stacked on the lane axis (1 = plain layout)."""
    if tile_w < 128 and 128 % tile_w == 0 and tile_h == 8 * (128 // tile_w):
        return 128 // tile_w
    return 1


def _vreg_shape(consts: BlendConsts):
    s = _strips(consts.tile_h, consts.tile_w)
    return (8, 128) if s > 1 else (consts.tile_h, consts.tile_w)


def _vreg_to_spatial(x: jnp.ndarray, consts: BlendConsts) -> jnp.ndarray:
    """[..., 8, 128] vreg layout -> [..., TH, TW] spatial tile."""
    s = _strips(consts.tile_h, consts.tile_w)
    if s == 1:
        return x
    lead = x.shape[:-2]
    x = x.reshape(*lead, 8, s, consts.tile_w)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, consts.tile_h, consts.tile_w)


def _spatial_to_vreg(x: jnp.ndarray, consts: BlendConsts) -> jnp.ndarray:
    """[..., TH, TW] spatial tile -> [..., 8, 128] vreg layout."""
    s = _strips(consts.tile_h, consts.tile_w)
    if s == 1:
        return x
    lead = x.shape[:-2]
    x = x.reshape(*lead, s, 8, consts.tile_w)
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, 8, 128)


def _pixel_iotas(consts: BlendConsts, x0, y0):
    """Spatial pixel coordinate planes in vreg layout, f32 (VS, VL)."""
    VS, VL = _vreg_shape(consts)
    s = _strips(consts.tile_h, consts.tile_w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (VS, VL), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (VS, VL), 0)
    if s == 1:
        px_i, py_i = lane, sub
    else:
        px_i = lane % consts.tile_w
        py_i = 8 * (lane // consts.tile_w) + sub
    return x0 + px_i.astype(jnp.float32), y0 + py_i.astype(jnp.float32)


def pack_attrs(mean2d_g, conic_g, color_g, opacity_g, page=None) -> jnp.ndarray:
    """[T,K,2],[T,K,3],[T,K,3],[T,K] -> [T, K/page, 16, page] packed f32."""
    page = page or default_page()
    T, K, _ = mean2d_g.shape
    assert K % page == 0, "tile_capacity must be a multiple of the page size"
    rows = [
        mean2d_g[..., 0], mean2d_g[..., 1],
        conic_g[..., 0], conic_g[..., 1], conic_g[..., 2],
        opacity_g,
        color_g[..., 0], color_g[..., 1], color_g[..., 2],
    ]
    packed = jnp.stack(rows, axis=1)  # [T, 9, K]
    pad = jnp.zeros((T, ATTR_ROWS - len(rows), K), dtype=jnp.float32)
    packed = jnp.concatenate([packed.astype(jnp.float32), pad], axis=1)
    # [T, 16, K] -> [T, 16, NC, page] -> [T, NC, 16, page]
    packed = packed.reshape(T, ATTR_ROWS, K // page, page)
    return packed.transpose(0, 2, 1, 3)


def unpack_grads(g: jnp.ndarray):
    """[T, NC, 16, 128] -> (d_mean2d [T,K,2], d_conic [T,K,3],
    d_color [T,K,3], d_opacity [T,K])."""
    T, NC, _, page = g.shape
    g = g.transpose(0, 2, 1, 3).reshape(T, ATTR_ROWS, NC * page)
    d_m2d = jnp.stack([g[:, ROW_MX], g[:, ROW_MY]], axis=-1)
    d_con = jnp.stack([g[:, ROW_CA], g[:, ROW_CB], g[:, ROW_CC]], axis=-1)
    d_col = jnp.stack([g[:, ROW_CR], g[:, ROW_CG], g[:, ROW_CB2]], axis=-1)
    d_op = g[:, ROW_OP]
    return d_m2d, d_con, d_col, d_op


def _slot_values(consts, attrs, j, k, count, px, py, gate=None):
    """Per-slot alpha/eligibility. ``attrs`` is the (16, CHUNK) chunk value;
    ``j`` a static lane index. All per-pixel math on (VS, VL) vregs; slot
    attributes are scalar lane extracts. Returns (alpha_e [VS,VL] with
    ineligible pixels zeroed, G, dx, dy).

    ``gate`` = the per-pixel block BITPLANE (int32 [VS, VL], bit index =
    the pixel's 16x16 sensor block within the tile's covered block grid;
    see _gate_bitplane) enables the reference's 16x16-block rect test:
    the CUDA renderer only lets a Gaussian touch pixels whose 16x16
    block lies inside its getRect() bbox (rasterizer_impl.cu:64-99 +
    auxiliary.h:36-46), so fringe pixels with alpha >= 1/255 just
    OUTSIDE the bbox blend iff their block is inside.  The per-slot rect
    test is precomputed into a bitmask (attrs row ROW_GM, stamped by
    _stamp_gate_mask): the in-loop cost drops from 4 vector compares +
    3 ands to one and + one compare.  Gating makes the render
    bit-comparable to the reference (and independent of this kernel's
    own tile shape)."""
    mx = attrs[ROW_MX, j]
    my = attrs[ROW_MY, j]
    ca = attrs[ROW_CA, j]
    cb = attrs[ROW_CB, j]
    cc = attrs[ROW_CC, j]
    op = attrs[ROW_OP, j]
    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(consts.alpha_max, op * G)
    eligible = (k < count) & (power <= 0.0) & (alpha >= consts.alpha_min)
    if gate is not None:
        gm = attrs[ROW_GM, j].astype(jnp.int32)  # exact small int in f32
        eligible &= (gate & gm) != 0
    alpha_e = jnp.where(eligible, alpha, 0.0)
    return alpha_e, G, dx, dy


def _gate_bitplane(consts, px, py, x0, y0):
    """Per-pixel block BITPLANE for the 16x16 ref gate: int32 (VS, VL)
    with the single bit (bxi + nbx*byi) set, where (bxi, byi) is the
    pixel's 16x16 sensor block relative to the tile's base block.
    Integer shift, NOT exp2: f32 exp2(15.0) truncates to 32767 under
    astype(int32) (exp2 is not exact at integer inputs)."""
    nbx = (consts.tile_w - 1) // 16 + 2  # covered blocks incl. straddle
    bxi = (jnp.floor(px * 0.0625) - jnp.floor(x0 * 0.0625)).astype(
        jnp.int32)
    byi = (jnp.floor(py * 0.0625) - jnp.floor(y0 * 0.0625)).astype(
        jnp.int32)
    return jnp.left_shift(jnp.int32(1), bxi + nbx * byi)


def _stamp_gate_mask(consts: BlendConsts, n_tx: int, attrs: jnp.ndarray,
                     origin) -> jnp.ndarray:
    """Precompute the reference 16x16-block rect test into a per-(tile,
    slot) bitmask (attrs row ROW_GM): bit (bxi + nbx*byi) is set iff
    sensor block (bx0 + bxi, by0 + byi) of tile t lies inside the
    slot's getRect() bbox (same f32 formulas as the previous in-loop
    test — all quantities exact small ints; mask < 2^18 is f32-exact).
    Turns the per-slot in-loop gate from 4 compares + 3 ands into one
    and + one compare (measured ~2 ms fwd + 2 ms bwd per train render
    at the headline scene before this)."""
    T, NC, _, CHUNK = attrs.shape
    TW, TH = consts.tile_w, consts.tile_h
    # covered 16x16 blocks per axis incl. the unaligned straddle (an
    # 8-row tile at y0 = 12 touches two block rows); max mask bit is
    # nbx*nby - 1 <= 17 (8x128 tiles), so the f32 mask stays exact
    nbx, nby = (TW - 1) // 16 + 2, (TH - 1) // 16 + 2
    ti = jnp.arange(T, dtype=jnp.int32)
    x0 = (ti % n_tx).astype(jnp.float32) * TW + origin[0]
    y0 = (ti // n_tx).astype(jnp.float32) * TH + origin[1]
    bx0 = jnp.floor(x0 * 0.0625)[:, None, None]
    by0 = jnp.floor(y0 * 0.0625)[:, None, None]
    mx = attrs[:, :, ROW_MX]
    my = attrs[:, :, ROW_MY]
    rd = attrs[:, :, ROW_RD]
    xlo = jnp.floor((mx - rd) * 0.0625)
    xhi = jnp.floor((mx + rd + 15.0) * 0.0625)
    ylo = jnp.floor((my - rd) * 0.0625)
    yhi = jnp.floor((my + rd + 15.0) * 0.0625)
    mask = jnp.zeros_like(mx)
    for byi in range(nby):
        for bxi in range(nbx):
            bx = bx0 + float(bxi)
            by = by0 + float(byi)
            inr = (bx >= xlo) & (bx < xhi) & (by >= ylo) & (by < yhi)
            mask = mask + inr.astype(jnp.float32) * float(
                1 << (bxi + nbx * byi))
    return attrs.at[:, :, ROW_GM].set(mask)


def _fwd_kernel(consts: BlendConsts, n_tx: int,
                counts_ref,  # scalar prefetch [T] int32
                origin_ref,  # scalar prefetch [2] f32 window origin
                attrs_ref,  # VMEM [1, NC, 16, 128]
                out_ref,  # VMEM [1, 3, TH, TW]
                t_ref,  # VMEM [1, TH, TW]
                nc_ref,  # VMEM [1, TH, TW] int32
                ):
    TH, TW = consts.tile_h, consts.tile_w
    VS, VL = _vreg_shape(consts)
    CHUNK = attrs_ref.shape[3]
    pid = pl.program_id(0)
    count = counts_ref[pid]

    # window renders shift the PIXEL origin (sensor coords), never the
    # means — dx stays bitwise equal to the full-sensor render's
    x0 = ((pid % n_tx) * TW).astype(jnp.float32) + origin_ref[0]
    y0 = ((pid // n_tx) * TH).astype(jnp.float32) + origin_ref[1]
    px, py = _pixel_iotas(consts, x0, y0)
    gate = (_gate_bitplane(consts, px, py, x0, y0)
            if consts.ref_gate else None)

    def chunk_body(state):
        ci, T_acc, C_r, C_g, C_b, nc, done = state
        attrs = attrs_ref[0, ci]  # (16, CHUNK)
        k_base = ci * CHUNK
        for j in range(CHUNK):
            k = k_base + j
            a_j, _, _, _ = _slot_values(consts, attrs, j, k, count, px, py,
                                        gate)
            test_T = T_acc * (1.0 - a_j)
            # ``done`` is carried as a f32 0/1 mask (Mosaic cannot yield i1
            # vectors from loops).
            live = (a_j > 0.0) & (done == 0.0)
            blend_m = live & (test_T >= consts.t_eps)
            done = jnp.where(live & (test_T < consts.t_eps), 1.0, done)
            w = jnp.where(blend_m, a_j * T_acc, 0.0)
            C_r = C_r + w * attrs[ROW_CR, j]
            C_g = C_g + w * attrs[ROW_CG, j]
            C_b = C_b + w * attrs[ROW_CB2, j]
            T_acc = jnp.where(blend_m, test_T, T_acc)
            nc = jnp.where(blend_m, k + 1, nc)
        return (ci + 1, T_acc, C_r, C_g, C_b, nc, done)

    def chunk_cond(state):
        ci = state[0]
        done = state[6]
        return (ci * CHUNK < count) & (jnp.min(done) == 0.0)

    zero = jnp.zeros((VS, VL), dtype=jnp.float32)
    init = (
        jnp.int32(0),
        jnp.ones((VS, VL), dtype=jnp.float32),
        zero, zero, zero,
        jnp.zeros((VS, VL), dtype=jnp.int32),
        jnp.zeros((VS, VL), dtype=jnp.float32),
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
    attrs: jnp.ndarray,  # [T, NC, 16, 128] packed
    counts: jnp.ndarray,  # [T] int32
    origin=None,  # [2] f32 (wx0, wy0) sensor origin of the render window
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (C [T,3,TH,TW] — WITHOUT background, final_T [T,TH,TW],
    n_contrib [T,TH,TW] int32), spatial layout."""
    T_tiles, NC, _, CHUNK = attrs.shape
    VS, VL = _vreg_shape(consts)
    if origin is None:
        origin = jnp.zeros((2,), jnp.float32)
    if consts.ref_gate:
        attrs = _stamp_gate_mask(consts, n_tx, attrs, origin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, NC, ATTR_ROWS, CHUNK), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, VS, VL), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, VS, VL), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, VS, VL), lambda i, *_: (i, 0, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((T_tiles, 3, VS, VL), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, VS, VL), jnp.float32),
        jax.ShapeDtypeStruct((T_tiles, VS, VL), jnp.int32),
    ]
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, consts, n_tx),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )
    C, final_T, n_contrib = fn(counts, origin, attrs)
    return (_vreg_to_spatial(C, consts), _vreg_to_spatial(final_T, consts),
            _vreg_to_spatial(n_contrib, consts))


def _bwd_kernel(consts: BlendConsts, n_tx: int,
                counts_ref,  # scalar prefetch [T]
                origin_ref,  # scalar prefetch [2] f32 window origin
                attrs_ref,  # VMEM [1, NC, 16, 128]
                gout_ref,  # VMEM [1, 3, TH, TW]
                bgg_ref,  # VMEM [1, TH, TW]  (bg . g + g_T)
                ft_ref,  # VMEM [1, TH, TW] final_T
                nc_ref,  # VMEM [1, TH, TW] n_contrib
                grads_ref,  # VMEM [1, NC, 16, 128] output
                scratch_ref,  # VMEM [6, CHUNK, TW] partial-sum scratch
                ):
    TH, TW = consts.tile_h, consts.tile_w
    VS, VL = _vreg_shape(consts)
    strips = _strips(TH, TW)
    NC = attrs_ref.shape[1]
    CHUNK = attrs_ref.shape[3]
    pid = pl.program_id(0)
    count = counts_ref[pid]

    x0 = ((pid % n_tx) * TW).astype(jnp.float32) + origin_ref[0]
    y0 = ((pid // n_tx) * TH).astype(jnp.float32) + origin_ref[1]
    px, py = _pixel_iotas(consts, x0, y0)
    gate = (_gate_bitplane(consts, px, py, x0, y0)
            if consts.ref_gate else None)
    # tile-CENTERED pixel coords for the moment basis: px can reach the
    # sensor width, and centered moments minimize the recombination
    # cancellation (mx_l*m0 - m_px) in f32.  With the strip mapping the
    # centered py decomposes as  py_c = qc + sc  with  sc = sublane - 3.5
    # (per-sublane) and  qc = 8*(lane // TW) - (TH - 8)/2  (per-lane), so
    # sublane reductions of v * {1, sc, sc^2} plus lane contractions with
    # {1, pxl, qc, ...} recover every <= degree-2 pixel moment.
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (VS, 1), 0).astype(
        jnp.float32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, VL), 1)
    if strips == 1:
        sc = sub_i - (TH - 1) / 2.0
        pxl_row = lane_i.astype(jnp.float32) - (TW - 1) / 2.0
        qc_row = None
    else:
        sc = sub_i - 3.5
        pxl_row = (lane_i % TW).astype(jnp.float32) - (TW - 1) / 2.0
        qc_row = (8 * (lane_i // TW)).astype(jnp.float32) - (TH - 8) / 2.0
    # lane-contraction basis {1, pxl, pxl^2} for the per-chunk moment
    # matmuls (dn contracts the lane axis of both operands)
    bx = jnp.concatenate(
        [jnp.ones((1, VL), jnp.float32), pxl_row, pxl_row * pxl_row], axis=0)
    dn = (((1,), (1,)), ((), ()))

    g_r = gout_ref[0, 0]
    g_g = gout_ref[0, 1]
    g_b = gout_ref[0, 2]
    bg_dot_g = bgg_ref[0]
    final_T = ft_ref[0]
    nc = nc_ref[0]

    grads_ref[0] = jnp.zeros((NC, ATTR_ROWS, CHUNK), dtype=jnp.float32)

    # Slots at k >= max(n_contrib) received no gradient (backward only
    # visits k < n_contrib, backward.cu:509-513) — skip whole trailing
    # chunks, mirroring the forward's saturation early-exit.
    k_hi = jnp.minimum(count, jnp.max(nc))
    n_chunks = (k_hi + CHUNK - 1) // CHUNK

    def chunk_body(state):
        ci, T_cur, ar_r, ar_g, ar_b, la, lc_r, lc_g, lc_b = state
        attrs = attrs_ref[0, ci]  # (16, CHUNK)
        k_base = ci * CHUNK
        for j in reversed(range(CHUNK)):
            k = k_base + j
            a_raw, G, dx, dy = _slot_values(
                consts, attrs, j, k, count, px, py, gate
            )
            a_j = jnp.where(k < nc, a_raw, 0.0)
            ok = a_j > 0.0
            okf = ok.astype(jnp.float32)
            one_m_alpha = jnp.where(ok, 1.0 - a_j, 1.0)
            T_cur = T_cur / one_m_alpha
            ar_r = jnp.where(ok, la * lc_r + (1.0 - la) * ar_r, ar_r)
            ar_g = jnp.where(ok, la * lc_g + (1.0 - la) * ar_g, ar_g)
            ar_b = jnp.where(ok, la * lc_b + (1.0 - la) * ar_b, ar_b)
            w_pix = okf * a_j * T_cur
            cr_j = attrs[ROW_CR, j]
            cg_j = attrs[ROW_CG, j]
            cb_j = attrs[ROW_CB2, j]
            dL_dalpha = T_cur * (
                (cr_j - ar_r) * g_r
                + (cg_j - ar_g) * g_g
                + (cb_j - ar_b) * g_b
            )
            dL_dalpha = okf * (
                dL_dalpha - (final_T / one_m_alpha) * bg_dot_g
            )
            la = jnp.where(ok, a_j, la)
            lc_r = jnp.where(ok, cr_j, lc_r)
            lc_g = jnp.where(ok, cg_j, lc_g)
            lc_b = jnp.where(ok, cb_j, lc_b)

            # Store only SIX sublane-reduced (1, VL) rows per slot; the
            # six geometric gradients are recovered per chunk from pixel
            # MOMENTS of v = G*dL_dalpha (an MXU lane contraction with
            # {1, pxl, qc, pxl^2, ...}) instead of nine per-slot field
            # reductions — all d_* fields are op * v * poly(dx, dy).
            def _put(row, field, _j=j):
                scratch_ref[row, _j: _j + 1, :] = jnp.sum(
                    field, axis=0, keepdims=True)

            v = G * dL_dalpha
            vy = v * sc
            _put(0, v)
            _put(1, vy)
            _put(2, vy * sc)
            _put(3, w_pix * g_r)
            _put(4, w_pix * g_g)
            _put(5, w_pix * g_b)

        # per-chunk moment matmuls: [3, VL] x [CHUNK, VL] -> [3, CHUNK]
        # (HIGHEST precision: pxl^2 reaches TW^2 — a demoted bf16 pass
        # would lose the recombination below to cancellation)
        hi = jax.lax.Precision.HIGHEST
        m_v = jax.lax.dot_general(bx, scratch_ref[0], dn,
                                  precision=hi)  # rows: m0, m_px, m_pxx
        m_y = jax.lax.dot_general(bx[0:2], scratch_ref[1], dn,
                                  precision=hi)  # rows: <1,r1>, <pxl,r1>
        m_yy = jax.lax.dot_general(bx[0:1], scratch_ref[2], dn,
                                   precision=hi)  # row: <1,r2>
        ones_row = bx[0:1]
        d_col = jnp.concatenate([
            jax.lax.dot_general(ones_row, scratch_ref[3], dn, precision=hi),
            jax.lax.dot_general(ones_row, scratch_ref[4], dn, precision=hi),
            jax.lax.dot_general(ones_row, scratch_ref[5], dn, precision=hi),
        ], axis=0)  # [3, CHUNK]

        m0 = m_v[0:1]
        m_px = m_v[1:2]
        m_pxx = m_v[2:3]
        if strips == 1:  # py_c == sc: r1/r2 rows are the py moments
            m_py = m_y[0:1]
            m_pxy = m_y[1:2]
            m_pyy = m_yy[0:1]
        else:  # py_c = qc + sc: add the per-lane strip offset terms
            bq = jnp.concatenate(
                [qc_row, pxl_row * qc_row, qc_row * qc_row], axis=0)
            m_q = jax.lax.dot_general(
                bq, scratch_ref[0], dn,
                precision=hi)  # rows: <qc,r0>, <pxl*qc,r0>, <qc^2,r0>
            m_yq = jax.lax.dot_general(qc_row, scratch_ref[1], dn,
                                       precision=hi)  # row: <qc,r1>
            m_py = m_q[0:1] + m_y[0:1]
            m_pxy = m_q[1:2] + m_y[1:2]
            m_pyy = m_q[2:3] + 2.0 * m_yq[0:1] + m_yy[0:1]
        mxl = attrs[ROW_MX:ROW_MX + 1] - (x0 + (TW - 1) / 2.0)
        myl = attrs[ROW_MY:ROW_MY + 1] - (y0 + (TH - 1) / 2.0)
        ca_r = attrs[ROW_CA:ROW_CA + 1]
        cb_r = attrs[ROW_CB:ROW_CB + 1]
        cc_r = attrs[ROW_CC:ROW_CC + 1]
        op_r = attrs[ROW_OP:ROW_OP + 1]
        s_dx = mxl * m0 - m_px
        s_dy = myl * m0 - m_py
        s_dxx = mxl * (mxl * m0 - 2.0 * m_px) + m_pxx
        s_dxy = mxl * myl * m0 - mxl * m_py - myl * m_px + m_pxy
        s_dyy = myl * (myl * m0 - 2.0 * m_py) + m_pyy
        rows = jnp.concatenate([
            -op_r * (ca_r * s_dx + cb_r * s_dy),   # ROW_MX
            -op_r * (cc_r * s_dy + cb_r * s_dx),   # ROW_MY
            -0.5 * op_r * s_dxx,                   # ROW_CA
            -op_r * s_dxy,                         # ROW_CB
            -0.5 * op_r * s_dyy,                   # ROW_CC
            m0,                                    # ROW_OP
            d_col,                                 # ROW_CR/CG/CB2
        ], axis=0)
        grads_ref[0, ci, 0:N_GRAD_ROWS, :] = rows
        return (ci - 1, T_cur, ar_r, ar_g, ar_b, la, lc_r, lc_g, lc_b)

    def chunk_cond(state):
        return state[0] >= 0

    zero = jnp.zeros((VS, VL), dtype=jnp.float32)
    init = (n_chunks - 1, final_T, zero, zero, zero, zero, zero, zero, zero)
    jax.lax.while_loop(chunk_cond, chunk_body, init)


def blend_tiles_pallas_bwd(
    consts: BlendConsts,
    n_tx: int,
    attrs: jnp.ndarray,  # [T, NC, 16, 128]
    counts: jnp.ndarray,  # [T]
    g_out: jnp.ndarray,  # [T, 3, TH, TW]
    bg_dot_g: jnp.ndarray,  # [T, TH, TW]
    final_T: jnp.ndarray,  # [T, TH, TW]
    n_contrib: jnp.ndarray,  # [T, TH, TW] int32
    origin=None,  # [2] f32 (wx0, wy0) sensor origin of the render window
) -> jnp.ndarray:
    """Returns packed grads [T, NC, 16, 128].  Pixel-plane inputs (g_out,
    bg_dot_g, final_T, n_contrib) are SPATIAL [.., TH, TW] — remapped to
    the kernel's vreg layout here."""
    T_tiles, NC, _, CHUNK = attrs.shape
    VS, VL = _vreg_shape(consts)
    if origin is None:
        origin = jnp.zeros((2,), jnp.float32)
    if consts.ref_gate:
        attrs = _stamp_gate_mask(consts, n_tx, attrs, origin)
    g_out = _spatial_to_vreg(g_out, consts)
    bg_dot_g = _spatial_to_vreg(bg_dot_g, consts)
    final_T = _spatial_to_vreg(final_T, consts)
    n_contrib = _spatial_to_vreg(n_contrib, consts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, NC, ATTR_ROWS, CHUNK), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 3, VS, VL), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, VS, VL), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, VS, VL), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, VS, VL), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, NC, ATTR_ROWS, CHUNK), lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((6, CHUNK, VL), jnp.float32),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_bwd_kernel, consts, n_tx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, NC, ATTR_ROWS, CHUNK), jnp.float32)
        ],
        interpret=_use_interpret(),
    )
    (grads,) = fn(counts, origin, attrs, g_out, bg_dot_g, final_T, n_contrib)
    return grads
