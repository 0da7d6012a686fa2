# -*- coding: utf-8 -*-
"""Voxel visibility: point scatter to id-volume + per-pixel DDA raycast.

TPU-native replacement for the reference's voxlib CUDA kernels:

- ``points_to_volume`` (reference: extensions/voxlib/points_to_volume.cu:
  21-79): scatter each point's scale-box into an int32 id volume,
  last-write-wins.  The box fill is unrolled over the (small, static) max
  scale; XLA scatter replaces the racy CUDA writes.
- ``ray_voxel_intersection`` (reference: extensions/voxlib/
  ray_voxel_intersection.cu): per-pixel DDA through the volume.  Instead of
  a per-thread while loop, ALL rays advance together inside one
  ``lax.while_loop`` (vectorized over the whole image) until every ray has
  hit or left the volume — data-parallel stepping is the TPU-shaped
  formulation of the same traversal.
- ``get_visible_points`` (reference: scripts/dataset_generator.py:
  1420-1461): volume build + raycast + instance map composition.

Camera convention (ray_voxel_intersection.cu:70-90): volume indexed
[y, x, z]; the ray basis is (up x side x fwd) with
``ndc = (cy - py, px - cx)``, dir = up*ndc0 + side*ndc1 + fwd*f.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.camera import quat_xyzw_to_matrix


def points_to_volume(
    points: jnp.ndarray,  # [N, 3] int32 (x, y, z)
    pt_ids: jnp.ndarray,  # [N] int32 (0 = empty sentinel; use 1-based ids)
    scales: jnp.ndarray,  # [N, 3] int32
    h: int, w: int, d: int,
    max_scale: int = 4,
    valid=None,
) -> jnp.ndarray:
    """Volume [h, w, d] int32, each point filling its scale box
    (points_to_volume.cu:21-79; layout volume[y, x, z]).

    TPU formulation: one base-voxel scatter per distinct (isotropic) scale
    value, then a max-pool dilation spreads each id over its scale box —
    replaces scale^3 masked scatters (XLA scatters are the slow op here;
    reduce_window is fast).  Overlaps combine by max (deterministic; the
    CUDA kernel is racy last-write-wins there)."""
    N = points.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    in_range = (
        valid & (x >= 0) & (x < w) & (y >= 0) & (y < h) & (z >= 0) & (z < d)
    )
    xi = jnp.clip(x, 0, w - 1)
    yi = jnp.clip(y, 0, h - 1)
    zi = jnp.clip(z, 0, d - 1)

    vol = jnp.zeros((h, w, d), dtype=jnp.int32)
    # distinct (sxy, sz) groups: isotropic boxes plus the z=1 variants the
    # special z-scale classes produce (utils/helpers.py:197-223)
    groups = [(s, sz) for s in range(1, max_scale + 1)
              for sz in ({1, s} if s > 1 else {1})]
    for s, sz in groups:
        m = in_range & (scales[:, 0] == s) & (scales[:, 2] == sz)
        ids = jnp.where(m, pt_ids, 0)
        base = jnp.zeros((h, w, d), dtype=jnp.int32).at[yi, xi, zi].max(ids)
        if s > 1 or sz > 1:
            # dilate over the [0,s)x[0,s)x[0,sz) box: max over a window
            # ending at each voxel
            base = jax.lax.reduce_window(
                base, jnp.int32(0), jax.lax.max,
                window_dimensions=(s, s, sz), window_strides=(1, 1, 1),
                padding=((s - 1, 0), (s - 1, 0), (sz - 1, 0)),
            )
        vol = jnp.maximum(vol, base)
    return vol


class RaycastResult(NamedTuple):
    voxel_id: jnp.ndarray  # [H, W] int32 (value stored in the volume; 0=miss)
    depth: jnp.ndarray  # [H, W] float32 (t of entry; inf on miss)
    raydirs: jnp.ndarray  # [H, W, 3]


# Coarse column block edge (xy cells per block-level; the hierarchy is
# 1 / COARSE / COARSE^2); power of two.  Measured on chip (r5, 512^2x192
# tune scene, 518k rays): COARSE=4 (1/4/16 blocks) beats COARSE=8
# (1/8/64) 301 -> 284 ms at the default schedule and 301 -> 258 ms with
# the denser compaction schedule below — street-canyon rays are the
# march tail, and 4-cell blocks stay empty down a ~12-cell-wide road
# where 8-cell blocks are polluted by the flanking buildings.
COARSE = 4


def _bitpack(occ: jnp.ndarray):
    """[h, w, d] bool -> [h, w, ceil(d/32)] uint32 (bit z%32 of z//32)."""
    h, w, d = occ.shape
    dw = -(-d // 32)
    pad_d = dw * 32 - d
    if pad_d:
        occ = jnp.concatenate(
            [occ, jnp.zeros((h, w, pad_d), bool)], axis=-1)
    bitpos = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(
        occ.reshape(h, w, dw, 32).astype(jnp.uint32)
        << bitpos[None, None, None, :], axis=-1)


def pack_occupancy(volume: jnp.ndarray):
    """(occ_words [h, w, ceil(d/32)] uint32 per-column z-bitmasks, ztop
    f32 — 1 + highest occupied z, coarse_cols [ceil(h/C), ceil(w/C),
    ceil(d/32)] uint32 — the bitwise OR of each CxC xy block's columns
    (C = COARSE), coarse2_cols [ceil(h/C^2), ceil(w/C^2), ceil(d/32)] —
    the OR of each C^2xC^2 block).

    The coarse tables keep FULL z resolution (only xy is coarsened): a
    ray's z-span test against a coarse column is exact per block, so a
    shallow ray grazing just above the rooftops still coarse-skips even
    though the ground slab below is solidly occupied — the failure mode
    of a 3-D supervoxel hierarchy, where any block containing the ground
    is "occupied" at every altitude.

    Built once per volume: trajectory renderers cache it next to the id
    volume so per-frame raycasts don't re-pack 50M voxels."""
    h, w, d = volume.shape
    occ = volume != 0
    occ_words = _bitpack(occ)
    dw = occ_words.shape[-1]
    ztop = (jnp.max(jnp.where(
        jnp.any(occ, axis=(0, 1)), jnp.arange(occ.shape[-1]), -1))
        .astype(jnp.float32) + 1.0)
    C = COARSE
    hb, wb = -(-h // C), -(-w // C)
    wp = jnp.zeros((hb * C, wb * C, dw), jnp.uint32)
    wp = wp.at[:h, :w].set(occ_words)
    coarse_cols = jax.lax.reduce(
        wp.reshape(hb, C, wb, C, dw), jnp.uint32(0),
        jax.lax.bitwise_or, (1, 3))
    hb2, wb2 = -(-hb // C), -(-wb // C)
    wp2 = jnp.zeros((hb2 * C, wb2 * C, dw), jnp.uint32)
    wp2 = wp2.at[:hb, :wb].set(coarse_cols)
    coarse2_cols = jax.lax.reduce(
        wp2.reshape(hb2, C, wb2, C, dw), jnp.uint32(0),
        jax.lax.bitwise_or, (1, 3))
    return occ_words, ztop, coarse_cols, coarse2_cols


def ray_voxel_intersection(
    volume: jnp.ndarray,  # [h, w, d] int32, 0 = empty
    cam_ori: jnp.ndarray,  # [3] in volume coords (y, x, z) order
    cam_dir: jnp.ndarray,  # [3] look direction (not normalized)
    cam_up: jnp.ndarray,  # [3]
    cam_f: float,
    cam_c: Tuple[float, float],  # (cy, cx) principal point
    img_dims: Tuple[int, int],  # (H, W)
    max_steps: int | None = None,
    occupancy=None,  # optional prebuilt pack_occupancy(volume)
    n_bands: int = 16,  # independent row-band loops (see below)
    order: str | None = None,  # None = image rows; "cost" = sorted march
    # return_band_iters: also return (band_iters, band_live), each of
    # length bands * (n_compaction_stages + 1) in PHASE-MAJOR layout:
    # all bands of phase 0 (up to the first compaction point), then all
    # bands of phase 1, ... (debug/bench flag; scripts/bench_raycast_tail)
    return_band_iters: bool = False,
    # compaction iteration(s): int | tuple | None.  Swept on chip at
    # COARSE=4 (r5): (48, 96, 192, 384) 258 ms vs (64, 96) 284 — the
    # finer blocks shift work into more, cheaper iterations, so earlier
    # + deeper compaction pays.
    compact_after=(48, 96, 192, 384),
) -> RaycastResult:
    """First-hit DDA raycast (ray_voxel_intersection.cu, N_MAX_SAMPLES=1).

    Three accelerations over the naive per-cell march:

    - (exact) COLUMN testing against the bit-packed occupancy ([h, w,
      d/32] uint32 per-column z-bitmasks, ~32x smaller than the id
      volume): the ray advances only over x/y cell crossings (plus
      z-WORD boundaries), and each step tests the ENTIRE z-interval the
      segment spans in that column with one masked 32-bit word — the
      z axis contributes no per-cell steps.  The first hit in ray order
      is the lowest (ascending z) or highest (descending) set bit of the
      masked word; the id volume is touched once per ray at the hit.
    - rays above the highest occupied voxel skip analytically to the slab
      boundary (cities are flat: the camera orbits far above max building
      height, and horizon-grazing rays otherwise march the full empty sky).
      The skip re-bases the origin at ``ro + t_skip * rd``, so x/y carry
      ~t_skip*eps float rounding into the march: first hits match the
      unskipped DDA up to that rounding (a corner-grazing ray can land one
      cell over).  Every voxel skipped is empty by construction of ztop,
      so no hit is ever missed.
    - THREE-level xy hierarchy (1 / 8x8 / 64x64 columns) as a UNIFIED
      per-ray state machine: each ray carries (t, level, parent-block) —
      level-L mode steps 8^L-column blocks (their z-masks are the OR of
      the block's columns, at FULL z resolution, so a ray just above the
      rooftops skips blocks whose ground floors are solid), and
      transitions happen per ray with no phase barriers: a ray crossing
      into a NEW parent block spends its iteration testing the parent
      (empty -> ascend AND advance; hit -> stay, rescan finer), and a
      hit at the ray's own level descends one level without advancing.
      Every iteration performs exactly ONE occupancy gather per ray (all
      three tables live in one concatenated buffer).  Segments are
      sampled at midpoints between consecutive crossings with
      boundary-inset z endpoints (robust to float rounding); every
      column skipped lies in an all-empty ancestor block, so no hit is
      ever missed.

    Measured on chip (512x512x192 volume, 518k rays, synthetic city):
    593 ms (3-D supervoxel two-phase rounds, round 3) -> 446 ms
    (two-level column march) -> 440 ms (three-level machine at
    COARSE=8) -> 301 ms (survivor compaction, round 4) -> **258 ms**
    (round 5: COARSE=4 blocks + the (48, 96, 192, 384) compaction
    schedule — street-canyon rays no longer descend to fine cells at
    every flanked road block).  The march is gather-bound (~95% of the
    cost is the per-step occupancy row fetch), so ray order must stay
    image-coherent (see ``order``).
    """
    h, w, d = volume.shape
    H, W = img_dims
    vol_flat = volume.reshape(-1)
    if occupancy is None:
        occupancy = pack_occupancy(volume)
    occ_words, ztop, coarse_cols, coarse2_cols = occupancy
    dw = occ_words.shape[-1]
    hb, wb = coarse_cols.shape[0], coarse_cols.shape[1]
    hb2, wb2 = coarse2_cols.shape[0], coarse2_cols.shape[1]
    # fine + coarse words share one buffer: the per-step gather target is
    # an index select, never a second gather
    occ_all = jnp.concatenate(
        [occ_words.reshape(-1), coarse_cols.reshape(-1),
         coarse2_cols.reshape(-1)])
    base_c = h * w * dw
    base_c2 = base_c + hb * wb * dw
    total_words = base_c2 + hb2 * wb2 * dw

    # Camera basis (ray_voxel_intersection.cu host code builds fwd/side/up
    # from viewdir and world-up by Gram-Schmidt; mirrored here)
    fwd = cam_dir / jnp.linalg.norm(cam_dir)
    side = jnp.cross(fwd, cam_up)
    side = side / jnp.linalg.norm(side)
    up = jnp.cross(side, fwd)
    up = up / jnp.linalg.norm(up)

    py = jnp.arange(H, dtype=jnp.float32)[:, None]
    px = jnp.arange(W, dtype=jnp.float32)[None, :]
    ndc0 = cam_c[0] - py  # flip height
    ndc1 = px - cam_c[1]
    raydir = (
        up[None, None] * ndc0[..., None]
        + side[None, None] * ndc1[..., None]
        + fwd[None, None] * cam_f
    )
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    R = H * W

    # SoA components — [R, 3] elementwise math would waste 42/43 of each
    # vector register to lane padding (see CLAUDE.md layout rules).
    rd = [raydir[..., i].reshape(-1) for i in range(3)]
    ro = [jnp.full((R,), cam_ori[i], jnp.float32) for i in range(3)]
    # sky skip: a ray starting above ztop either never descends below it
    # (miss) or can jump straight to the slab — every voxel it would have
    # marched through is empty by construction of ztop.  Land mid-cell of
    # the first EMPTY layer (ztop + 0.5): the march only samples cells
    # after a crossing, so the landing cell must be provably empty even
    # under float rounding of ro + t*rd.
    z_land = ztop + 0.5
    above = ro[2] > z_land
    t_skip = jnp.where(above & (rd[2] < 0), (z_land - ro[2]) / rd[2], 0.0)
    t_skip = jnp.maximum(t_skip, 0.0)
    miss0 = above & (rd[2] >= 0)
    ro = [ro[i] + t_skip * rd[i] for i in range(3)]

    if max_steps is None:
        # budget the hierarchy's non-advancing iterations on top of the
        # h+w+d cell crossings: one parent test per 8/64-block entry, up
        # to 2 descend steps per hit block, and ~2 re-test iterations per
        # compaction stage (lvl/blk reset) — without this headroom a thin
        # volume (small d) could exhaust the cap on a dense fine march
        # and silently report live rays as misses (ADVICE r4)
        n_stages = len(compact_after or ()) if not isinstance(
            compact_after, int) else 1
        max_steps = (h + w + d + 3
                     + 4 * ((h + w) // COARSE + 2) + 3 * n_stages)

    # Optional cost-sorted scheduling (``order="cost"``): sorts rays by a
    # closed-form march-length proxy so bands are cost-homogeneous.
    # MEASURED SLOWER on chip (448 -> 887 ms at 518k rays): permuting
    # rays destroys the spatial coherence of the per-step occupancy
    # gathers (adjacent image rays touch adjacent columns; sorted-by-cost
    # neighbors touch random columns), and the gather is ~95% of the
    # march cost.  Kept for volumes whose cost distribution is extreme
    # enough to flip the trade; the default row order is coherent.
    perm = None
    if order == "cost":
        def crossings_to_exit(i, dim):
            t = jnp.where(
                rd[i] > 0, (dim - ro[i]) / rd[i],
                jnp.where(rd[i] < 0, -ro[i] / rd[i], jnp.inf))
            return jnp.maximum(t, 0.0)
        t_exit = jnp.minimum(
            jnp.minimum(crossings_to_exit(0, h), crossings_to_exit(1, w)),
            crossings_to_exit(2, d))
        t_exit = jnp.where(jnp.isfinite(t_exit), t_exit, 0.0)
        key = sum(jnp.abs(rd[i]) * t_exit for i in range(3))
        key = jnp.where(miss0, 0.0, key)
        perm = jnp.argsort(key)
        miss0 = miss0[perm]
        ro = [v[perm] for v in ro]
        rd = [v[perm] for v in rd]

    # Band the rays over image rows, one while loop per band (lax.scan):
    # a done ray in a lockstep loop still issues a masked gather each
    # step, so the loop runs as long as the WORST ray anywhere; per-band
    # loops stop when the band's own worst ray is done (top-of-frame sky
    # bands exit almost immediately, near-ground bands hit early — only
    # horizon bands march far).
    def bandify(v, fill, B):
        Rb = -(-R // B)
        Rp = Rb * B
        if Rp != R:
            v = jnp.concatenate(
                [v, jnp.full((Rp - R,), fill, v.dtype)])
        return v.reshape(B, Rb)

    # initial per-ray march state (full R, before banding)
    inv0 = [1.0 / rd[i] for i in range(3)]
    step01f = [(rd[i] > 0).astype(jnp.float32) for i in range(3)]
    zrd = [rd[i] == 0 for i in range(3)]

    def first_cross_full(i):
        # first FINE crossing (x/y cell or z CELL): the reference DDA
        # samples cells only after the first crossing, so the origin cell
        # stays untested while the rest of the origin column (entered via
        # its z-cell crossing) is not skipped
        c = jnp.floor(ro[i])
        t = (c + step01f[i] - ro[i]) * inv0[i]
        return jnp.where(zrd[i], jnp.inf, t)

    t_init = jnp.maximum(jnp.minimum(jnp.minimum(
        first_cross_full(0), first_cross_full(1)), first_cross_full(2)), 0.0)
    Cs = float(COARSE)
    assert COARSE & (COARSE - 1) == 0, "COARSE must be a power of two"
    cshift = COARSE.bit_length() - 1
    wb_i = wb
    blk_init = (jnp.floor(ro[0] / Cs).astype(jnp.int32) * wb_i
                + jnp.floor(ro[1] / Cs).astype(jnp.int32))
    state0 = (
        miss0,  # done
        jnp.zeros((R,), jnp.int32),  # level
        t_init,
        blk_init,
        jnp.full((R,), -1, jnp.int32),  # hit_lin
        jnp.full((R,), jnp.inf, jnp.float32),  # hit_t
    )
    state_fills = (True, 0, 0.0, 0, -1, jnp.inf)

    def band_xs(state, ro_v, rd_v, B):
        return (
            tuple(bandify(s, f, B) for s, f in zip(state, state_fills)),
            tuple(bandify(ro_v[i], 0.0, B) for i in range(3)),
            tuple(bandify(rd_v[i], 1.0, B) for i in range(3)),
        )

    # Three-level COLUMN march (see docstring): the ray advances over x/y
    # cell (level 0), 8x8-block (level 1) or 64x64-block (level 2)
    # crossings plus z-WORD (32-cell) boundaries; each iteration tests
    # the ENTIRE z-interval the segment spans in one column with a single
    # masked 32-bit word — the z axis never contributes per-cell steps.
    # One occupancy gather per ray per iteration; first hit in ray order
    # via trailing/leading-bit ops.
    FULL = jnp.uint32(0xFFFFFFFF)

    def make_run_band(iter_cap):
        def run_band(carry, bx):
            (done0, lvl0, t0, blk0, hl0, ht0), ro_b, rd_b = bx
            inv = [1.0 / rd_b[i] for i in range(3)]  # +-inf at rd == 0
            step01 = [(rd_b[i] > 0).astype(jnp.float32) for i in range(3)]
            zero_rd = [rd_b[i] == 0 for i in range(3)]
            pos_dir = [rd_b[i] > 0 for i in range(3)]
            neg_dir = [rd_b[i] < 0 for i in range(3)]

            def cond(st):
                return (st[0] < iter_cap) & jnp.logical_not(jnp.all(st[1]))

            def sel_lvl(lvl, v0, v1, v2):
                return jnp.where(lvl == 0, v0, jnp.where(lvl == 1, v1, v2))

            def body(st):
                it, done, lvl, t, blk, hit_lin, hit_t = st
                live = jnp.logical_not(done)
                s = sel_lvl(lvl, 1.0, Cs, Cs * Cs)
                s_inv = sel_lvl(lvl, 1.0, 1.0 / Cs, 1.0 / (Cs * Cs))
                # next crossing: x/y in own-level units, z at word granularity
                def crossing(i, sc, sc_inv):
                    p = ro_b[i] + t * rd_b[i]
                    c = jnp.floor(p * sc_inv)
                    ti = ((c + step01[i]) * sc - ro_b[i]) * inv[i]
                    return jnp.where(zero_rd[i], jnp.inf, ti)

                tn = jnp.minimum(
                    jnp.minimum(crossing(0, s, s_inv), crossing(1, s, s_inv)),
                    crossing(2, 32.0, 1.0 / 32.0))
                # forced progress: a crossing landing exactly on a boundary
                # (float rounding) would otherwise stall forever; ~1e-4 cells
                # is the same tolerance class as the sky skip's re-based
                # origin
                tn = jnp.maximum(tn, t + 1e-4)
                tm = 0.5 * (t + tn)
                m0 = jnp.floor((ro_b[0] + tm * rd_b[0]) * s_inv
                               ).astype(jnp.int32)
                m1 = jnp.floor((ro_b[1] + tm * rd_b[1]) * s_inv
                               ).astype(jnp.int32)
                wz = jnp.floor((ro_b[2] + tm * rd_b[2]) * (1.0 / 32.0)
                               ).astype(jnp.int32)
                # z-cell span of the segment, endpoints inset 1e-3 into the
                # open interval so boundary-exact endpoints round inward
                za = ro_b[2] + (t + 1e-3 * (tn - t)) * rd_b[2]
                zb = ro_b[2] + (tn - 1e-3 * (tn - t)) * rd_b[2]
                zlo = jnp.floor(jnp.minimum(za, zb)).astype(jnp.int32)
                zhi = jnp.floor(jnp.maximum(za, zb)).astype(jnp.int32)
                # segments never straddle a z-word boundary (crossings split
                # there), so wz is THE word; clamp the span into it
                lo5 = (jnp.maximum(zlo, wz * 32) & 31).astype(jnp.uint32)
                hi5 = (jnp.minimum(zhi, wz * 32 + 31) & 31).astype(jnp.uint32)
                span_ok = zlo <= zhi

                d0 = sel_lvl(lvl, h, hb, hb2)
                d1 = sel_lvl(lvl, w, wb, wb2)
                out_hi0 = m0 >= d0
                out_lo0 = m0 < 0
                out_hi1 = m1 >= d1
                out_lo1 = m1 < 0
                out_hi2 = wz >= dw
                out_lo2 = wz < 0
                outside = (out_hi0 | out_lo0 | out_hi1 | out_lo1 | out_hi2
                           | out_lo2)
                out_away = ((out_hi0 & pos_dir[0]) | (out_lo0 & neg_dir[0])
                            | (out_hi1 & pos_dir[1]) | (out_lo1 & neg_dir[1])
                            | (out_hi2 & pos_dir[2]) | (out_lo2 & neg_dir[2]))
                # a ray crossing into a NEW parent block spends this iteration
                # testing the parent instead (levels 0/1; level 2 has none)
                p0 = m0 >> cshift
                p1 = m1 >> cshift
                pwb = jnp.where(lvl == 0, wb, wb2)
                pid = p0 * pwb + p1
                is_new = (lvl < 2) & (pid != blk)
                tl = lvl + is_new.astype(jnp.int32)  # tested level
                c0 = jnp.where(is_new, p0, m0)
                c1 = jnp.where(is_new, p1, m1)
                tw_d = sel_lvl(tl, w, wb, wb2)
                tbase = sel_lvl(tl, 0, base_c, base_c2)
                gidx = tbase + (c0 * tw_d + c1) * dw + wz
                wrd = jnp.where(
                    outside | done, jnp.uint32(0),
                    occ_all[jnp.clip(gidx, 0, total_words - 1)])
                mask = (FULL << lo5) & (FULL >> (jnp.uint32(31) - hi5))
                hitw = jnp.where(span_ok, wrd & mask, jnp.uint32(0))
                any_bit = hitw != 0
                # first set bit along the ray's z direction
                low_bit = jax.lax.population_count((hitw - 1) & ~hitw)
                high_bit = jnp.uint32(31) - jax.lax.clz(hitw)
                kbit = jnp.where(rd_b[2] >= 0, low_bit, high_bit
                                 ).astype(jnp.int32)
                kz = wz * 32 + kbit

                hit = live & (tl == 0) & any_bit
                # a hit at tested level > 0 re-scans it one level finer from
                # the SAME t (is_new-hit keeps the level; own-hit descends);
                # an empty parent test ascends AND advances (the segment lies
                # inside the just-tested empty parent, so tn is safe)
                descend = live & any_bit & (tl > 0)
                ascend = live & is_new & jnp.logical_not(any_bit)
                adv = live & jnp.logical_not(any_bit)
                done_n = done | hit | (live & out_away)
                lvl_n = jnp.where(descend, tl - 1,
                                  jnp.where(ascend, tl, lvl))
                # parent tracking: descending makes the tested block the new
                # parent; ascending to level 1 adopts the grandparent block
                # (level 2 tracks no parent)
                blk_desc = c0 * jnp.where(tl == 1, wb, wb2) + c1
                blk_asc = jnp.where(
                    lvl == 0, (p0 >> cshift) * wb2 + (p1 >> cshift), -1)
                blk_n = jnp.where(descend, blk_desc,
                                  jnp.where(ascend, blk_asc, blk))
                hit_lin_n = jnp.where(hit, (m0 * w + m1) * d + kz, hit_lin)
                # entry param of the hit cell: the later of the segment start
                # and the z-crossing into cell kz
                tz = ((kz + (rd_b[2] < 0)).astype(jnp.float32) - ro_b[2]
                      ) * inv[2]
                tz = jnp.where(zero_rd[2], t, tz)
                hit_t_n = jnp.where(hit, jnp.maximum(t, tz), hit_t)
                t_n = jnp.where(adv & jnp.logical_not(done_n), tn, t)
                return (it + 1, done_n, lvl_n, t_n, blk_n, hit_lin_n,
                        hit_t_n)

            out = jax.lax.while_loop(cond, body, (
                jnp.int32(0), done0, lvl0, t0, blk0, hl0, ht0))
            n_live = jnp.sum(jnp.logical_not(out[1]).astype(jnp.int32))
            return carry, (tuple(out[1:]), out[0], n_live)

        return run_band

    def run_phase(state, ro_v, rd_v, cap):
        """March every ray (banded scan) for at most ``cap`` iterations
        from ``state``; returns (state', band_iters, band_live) with the
        state flattened back to full length R."""
        _, (st_b, iters, live) = jax.lax.scan(
            make_run_band(cap), 0, band_xs(state, ro_v, rd_v, bands))
        return tuple(s.reshape(-1)[:R] for s in st_b), iters, live

    # Survivor compaction (measured: ~86% of rays settle in the first 64
    # iterations but lockstep bands pay full width for the whole march —
    # ~50% of wall time goes to the last ~14% of rays).  March a fixed
    # prefix, stable-sort rays by doneness (image order preserved within
    # each class, keeping the occupancy gathers coherent), and finish the
    # survivors in the leading bands while fully-done bands exit their
    # while loop at iteration 0.  Everything rides ONE multi-payload sort
    # (~5 ms at 518k rows) — element gathers by a permutation were
    # measured ~100x worse (the first cut, 440 -> 970 ms).  Recomputable
    # state is reset instead of carried: lvl=0 / blk=-1 force one exact
    # parent re-test per survivor (<=2 extra iterations), and each
    # stage's partial hit results stay in that stage's entry order,
    # merged while unwinding the sorts.  Measured (plain dispatch, 518k
    # rays, tune scene): 492 ms uncompacted -> 350 at (64,) -> 300 at
    # the default (64, 96); chain_time misreports this op (its fori
    # chaining serializes the phases), so trust per-call + host fetch.
    points = compact_after
    if points is not None and not isinstance(points, (tuple, list)):
        points = (points,)
    # set-dedup: a repeated point would run a zero-iteration phase that
    # still pays two full 9-payload sorts over all R rays (ADVICE r4)
    points = tuple(sorted({p for p in (points or ()) if 0 < p < max_steps}))
    bands = max(1, min(n_bands, R))
    iota = jnp.arange(R, dtype=jnp.int32)
    state = state0
    ro_c, rd_c = ro, rd
    prev_k = 0
    unwind = []  # (idx_of_sort, partial hl, partial ht) per stage
    iters_all, live_all = [], []
    for k in points:
        st, it_k, lv_k = run_phase(state, ro_c, rd_c, k - prev_k)
        prev_k = k
        iters_all.append(it_k)
        live_all.append(lv_k)
        done_k, _, t_k, _, hl_k, ht_k = st
        (done_s, idx_s, t_s, ro0s, ro1s, ro2s, rd0s, rd1s,
         rd2s) = jax.lax.sort(
            (done_k.astype(jnp.int32), iota, t_k, ro_c[0], ro_c[1],
             ro_c[2], rd_c[0], rd_c[1], rd_c[2]),
            num_keys=1, is_stable=True)
        unwind.append((idx_s, hl_k, ht_k))
        state = (
            done_s.astype(bool),
            jnp.zeros((R,), jnp.int32),  # lvl reset: level-0 tests exact
            t_s,
            jnp.full((R,), -1, jnp.int32),  # blk=-1: parent re-tested
            jnp.full((R,), -1, jnp.int32),
            jnp.full((R,), jnp.inf, jnp.float32),
        )
        ro_c = [ro0s, ro1s, ro2s]
        rd_c = [rd0s, rd1s, rd2s]
    state_f, it_f, lv_f = run_phase(state, ro_c, rd_c, max_steps - prev_k)
    iters_all.append(it_f)
    live_all.append(lv_f)
    hit_lin, hit_t = state_f[4], state_f[5]
    for idx_s, hl_k, ht_k in reversed(unwind):
        # undo this stage's compaction sort (sorting the carried iota
        # restores entry order), then merge: deeper stages wrote results
        # only for their survivors, this stage holds everyone else's
        _, hl_u, ht_u = jax.lax.sort((idx_s, hit_lin, hit_t), num_keys=1)
        deeper = hl_u >= 0
        hit_lin = jnp.where(deeper, hl_u, hl_k)
        hit_t = jnp.where(deeper, ht_u, ht_k)
    band_iters = jnp.concatenate(iters_all)
    band_live = jnp.concatenate(live_all)
    if perm is not None:
        # restore original ray order: sorting by the permutation (a
        # permutation of iota) with the results as payloads inverts it in
        # one sort — no scatter, no second argsort
        _, hit_lin, hit_t = jax.lax.sort(
            (perm.astype(jnp.int32), hit_lin, hit_t), num_keys=1)
    hit = hit_lin >= 0
    hit_id = jnp.where(
        hit, vol_flat[jnp.clip(hit_lin, 0, h * w * d - 1)], 0)
    # depth is measured from the true camera origin (t_skip happened
    # before the march started)
    hit_t = jnp.where(hit, hit_t + t_skip, hit_t)
    res = RaycastResult(
        voxel_id=hit_id.reshape(H, W),
        depth=hit_t.reshape(H, W),
        raydirs=raydir,
    )
    if return_band_iters:
        return res, (band_iters, band_live)
    return res


def get_visible_points(
    points: jnp.ndarray,  # [N, 5] int32 (x, y, z, scale, instance)
    scales3: jnp.ndarray,  # [N, 3] int32
    cam_pos: jnp.ndarray,  # [3] (x, y, z) world
    cam_quat: jnp.ndarray,  # [4] xyzw
    cam_f: float,
    cam_c: Tuple[float, float],  # (cy, cx)
    img_dims: Tuple[int, int],
    vol_shape: Tuple[int, int, int],
    offsets: jnp.ndarray,  # [3] int32 (x, y, z) volume origin in world
    valid=None,
):
    """Visible-point map (reference: dataset_generator.py:1420-1461).

    Returns (vp_map [H, W] int32 point index or -1, ins_map [H, W]).
    The volume shape is static; callers pre-compute offsets so points fit.
    """
    N = points.shape[0]
    h, w, d = vol_shape
    loc = points[:, :3] - offsets[None, :]
    # z offset convention: z -= z_min - 1 (dataset_generator.py:1357-1361)
    pt_ids = jnp.arange(1, N + 1, dtype=jnp.int32)
    vol = points_to_volume(loc, pt_ids, scales3, h, w, d, valid=valid)
    return visible_from_volume(vol, points, cam_pos, cam_quat, cam_f,
                               cam_c, img_dims, offsets)


def visible_from_volume(
    vol: jnp.ndarray,  # [h, w, d] int32 id volume (1-based point ids)
    points: jnp.ndarray,  # [N, 5]
    cam_pos: jnp.ndarray,
    cam_quat: jnp.ndarray,
    cam_f: float,
    cam_c: Tuple[float, float],
    img_dims: Tuple[int, int],
    offsets: jnp.ndarray,
    occupancy=None,  # optional prebuilt pack_occupancy(vol)
    n_bands: int = 16,
    order: str | None = None,
    compact_after=(48, 96, 192, 384),
):
    """Raycast against a prebuilt id volume (the volume depends only on
    the points: trajectory renderers build it once and raycast per frame)."""
    cam_pos_loc = (cam_pos - offsets).astype(jnp.float32)
    # look_at = pos + R[:, 0] * 1000 (utils/helpers.py:162-164)
    Rm = quat_xyzw_to_matrix(cam_quat.astype(jnp.float32))
    look_dir = Rm[:, 0]
    # volume is indexed [y, x, z] -> swap x/y for origin and direction
    # (dataset_generator.py:1383-1400)
    ori = jnp.stack([cam_pos_loc[1], cam_pos_loc[0], cam_pos_loc[2]])
    vdir = jnp.stack([look_dir[1], look_dir[0], look_dir[2]])
    res = ray_voxel_intersection(
        vol, ori, vdir, jnp.asarray([0.0, 0.0, 1.0]), cam_f, cam_c,
        img_dims, occupancy=occupancy, n_bands=n_bands, order=order,
        compact_after=compact_after)
    vp_map = res.voxel_id - 1  # -1 = miss
    ins = points[:, 4]
    ins_map = jnp.where(vp_map >= 0, ins[jnp.maximum(vp_map, 0)], 0)
    return vp_map, ins_map
