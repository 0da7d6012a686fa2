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


COARSE = 8  # supervoxel edge (fine cells per coarse cell)


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
    """(occ_words [h, w, ceil(d/32)] uint32, ztop f32 — 1 + highest
    occupied z, coarse_words [h/8, w/8, ceil(d/8/32)] uint32 supervoxel
    occupancy for the hierarchical march).

    Built once per volume: trajectory renderers cache it next to the id
    volume so per-frame raycasts don't re-pack 50M voxels."""
    h, w, d = volume.shape
    occ = volume != 0
    occ_words = _bitpack(occ)
    ztop = (jnp.max(jnp.where(
        jnp.any(occ, axis=(0, 1)), jnp.arange(occ.shape[-1]), -1))
        .astype(jnp.float32) + 1.0)
    # supervoxel occupancy: OR over 8x8x8 blocks (pad dims up to COARSE)
    C = COARSE
    hp, wp, dp = (-(-s // C) * C for s in (h, w, d))
    occ_p = jnp.zeros((hp, wp, dp), bool).at[:h, :w, :d].set(occ)
    occ_c = jnp.any(
        occ_p.reshape(hp // C, C, wp // C, C, dp // C, C),
        axis=(1, 3, 5))
    return occ_words, ztop, _bitpack(occ_c)


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
) -> RaycastResult:
    """First-hit DDA raycast (ray_voxel_intersection.cu, N_MAX_SAMPLES=1).

    Three accelerations over the naive march:

    - (exact) the march tests a BIT-PACKED occupancy volume ([h, w, d/32]
      uint32, ~32x smaller than the id volume) so the per-step random
      gather hits a cache-resident table; the id is fetched once per ray
      at the hit voxel.  At 512x512x192 / 518k rays this is the difference
      between a 201 MB and a 6.3 MB working set for ~600M gathers.
    - rays above the highest occupied voxel skip analytically to the slab
      boundary (cities are flat: the camera orbits far above max building
      height, and horizon-grazing rays otherwise march the full empty sky).
      The skip re-bases the origin at ``ro + t_skip * rd``, so x/y carry
      ~t_skip*eps float rounding into the march: first hits match the
      unskipped DDA up to that rounding (a corner-grazing ray can land one
      cell over).  Every voxel skipped is empty by construction of ztop,
      so no hit is ever missed.
    - hierarchical (two-phase) march: rays first DDA an 8^3-supervoxel
      occupancy (a ~16 KB table) and only march fine cells from the entry
      of the first occupied supervoxel — every fine cell skipped lies in
      an all-empty supervoxel, so no hit is ever missed; the fine start
      backs off 1e-3 cells so the block's first cell is entered (same
      float-rounding tolerance as the sky skip).
    """
    h, w, d = volume.shape
    H, W = img_dims
    vol_flat = volume.reshape(-1)
    if occupancy is None:
        occupancy = pack_occupancy(volume)
    occ_words, ztop, coarse_words = occupancy
    dw = occ_words.shape[-1]
    occ_flat = occ_words.reshape(-1)
    hc, wc, dwc = coarse_words.shape
    dc = -(-d // COARSE)
    occ_c_flat = coarse_words.reshape(-1)

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
        max_steps = h + w + d + 3

    # Band the rays over image rows, one while loop per band (lax.scan):
    # a done ray in a lockstep loop still issues a masked gather each
    # step, so the loop runs as long as the WORST ray anywhere; per-band
    # loops stop when the band's own worst ray is done (top-of-frame sky
    # bands exit almost immediately, near-ground bands hit early — only
    # horizon bands march far).
    B = max(1, min(n_bands, R))
    Rb = -(-R // B)
    Rp = Rb * B

    def bandify(v, fill):
        if Rp != R:
            v = jnp.concatenate(
                [v, jnp.full((Rp - R,), fill, v.dtype)])
        return v.reshape(B, Rb)

    xs = (
        bandify(miss0, True),  # padding rays are born done
        tuple(bandify(ro[i], 0.0) for i in range(3)),
        tuple(bandify(rd[i], 1.0) for i in range(3)),
    )

    def make_dda(occ_words_flat, words_dw, dims, steps):
        """Band DDA over a bit-packed occupancy grid: (ro SoA, rd SoA,
        done0) -> (hit_lin, entry-time hit_t, t_prog, exited) [Rb each].
        Cells are tested only after the first crossing (reference DDA
        semantics).  ``t_prog`` is how far a still-live ray advanced when
        the step bound hit (for resumable bounded marches); ``exited``
        marks rays that left the grid without a hit."""
        d0, d1, d2 = dims

        def march(ro_b, rd_b, done0):
            ai_b = [jnp.floor(ro_b[i]).astype(jnp.int32) for i in range(3)]
            pos_b = [rd_b[i] > 0 for i in range(3)]

            def init_t(i):
                return jnp.where(
                    rd_b[i] > 0,
                    (ai_b[i].astype(jnp.float32) + 1.0 - ro_b[i]) / rd_b[i],
                    jnp.where(
                        rd_b[i] < 0,
                        (ai_b[i].astype(jnp.float32) - ro_b[i]) / rd_b[i],
                        jnp.inf))

            at_b = [init_t(i) for i in range(3)]

            def cond(state):
                i, done = state[0], state[1]
                return (i < steps) & jnp.logical_not(jnp.all(done))

            def body(state):
                (i, done, ax0i, ax1i, ax2i, at0, at1, at2,
                 hit_lin, hit_t, t_prog, exited) = state
                aint = [ax0i, ax1i, ax2i]
                at_ = [at0, at1, at2]
                # smallest-t axis, tie-break x<y<z
                # (ray_voxel_intersection.cu:127-176)
                t01 = at_[0] <= at_[1]
                t02 = at_[0] <= at_[2]
                t12 = at_[1] <= at_[2]
                sel0 = t01 & t02
                sel1 = jnp.logical_not(sel0) & t12
                sel2 = jnp.logical_not(sel0) & jnp.logical_not(t12)
                tnow = jnp.where(sel0, at_[0],
                                 jnp.where(sel1, at_[1], at_[2]))

                new_aint = []
                new_at = []
                quit_now = jnp.zeros_like(done)
                for i_ax, sel in enumerate((sel0, sel1, sel2)):
                    step = jnp.where(pos_b[i_ax], 1, -1)
                    cur = aint[i_ax] + jnp.where(sel, step, 0)
                    out_hi = pos_b[i_ax] & (cur >= dims[i_ax])
                    out_lo = jnp.logical_not(pos_b[i_ax]) & (cur < 0)
                    quit_now = quit_now | (sel & (out_hi | out_lo))
                    nt = jnp.where(
                        pos_b[i_ax],
                        (cur.astype(jnp.float32) + 1.0 - ro_b[i_ax])
                        / rd_b[i_ax],
                        (cur.astype(jnp.float32) - ro_b[i_ax])
                        / rd_b[i_ax])
                    new_aint.append(jnp.where(sel, cur, aint[i_ax]))
                    new_at.append(jnp.where(sel, nt, at_[i_ax]))

                inside = (
                    (new_aint[0] >= 0) & (new_aint[0] < d0)
                    & (new_aint[1] >= 0) & (new_aint[1] < d1)
                    & (new_aint[2] >= 0) & (new_aint[2] < d2))
                # occupancy test against the bit-packed words; the id
                # volume is only touched after the loops, at the hit voxel
                lin_w = (new_aint[0] * (d1 * words_dw)
                         + new_aint[1] * words_dw + (new_aint[2] >> 5))
                lin_w = jnp.clip(lin_w, 0, d0 * d1 * words_dw - 1)
                word = jnp.where(inside, occ_words_flat[lin_w],
                                 jnp.uint32(0))
                bit = (word >> (new_aint[2] & 31).astype(jnp.uint32)) & 1
                newly_hit = jnp.logical_not(done) & (bit != 0)
                lin = (new_aint[0] * d1 * d2 + new_aint[1] * d2
                       + new_aint[2])
                hit_lin = jnp.where(newly_hit, lin, hit_lin)
                hit_t = jnp.where(newly_hit, tnow, hit_t)
                live = jnp.logical_not(done)
                t_prog = jnp.where(live, tnow, t_prog)
                exited = exited | (live & quit_now)
                done = done | newly_hit | (live & quit_now)
                keep = done
                outs = [jnp.where(keep, aint[k], new_aint[k])
                        for k in range(3)]
                outt = [jnp.where(keep, at_[k], new_at[k])
                        for k in range(3)]
                return (state[0] + 1, done, outs[0], outs[1], outs[2],
                        outt[0], outt[1], outt[2], hit_lin, hit_t,
                        t_prog, exited)

            state0 = (
                jnp.int32(0),
                done0,
                ai_b[0], ai_b[1], ai_b[2],
                at_b[0], at_b[1], at_b[2],
                jnp.full((Rb,), -1, dtype=jnp.int32),
                jnp.full((Rb,), jnp.inf, dtype=jnp.float32),
                jnp.zeros((Rb,), jnp.float32),
                jnp.zeros((Rb,), bool),
            )
            out = jax.lax.while_loop(cond, body, state0)
            return out[8], out[9], out[10], out[11]

        return march

    coarse_march = make_dda(occ_c_flat, dwc, (hc, wc, dc),
                            hc + wc + dc + 3)
    # bounded fine phase: ~a supervoxel diagonal plus slack, so a grazing
    # ray that clips a block without hitting RETURNS TO COARSE marching
    # instead of fine-stepping the rest of the volume
    FINE_STEPS = 8 * COARSE
    fine_march = make_dda(occ_flat, dw, (h, w, d), FINE_STEPS)
    Cf = float(COARSE)
    n_rounds = -(-max_steps // FINE_STEPS) + 2

    def run_band(carry, bx):
        done0, ro_b, rd_b = bx

        def round_body(state):
            r, t_cur, done, hit_lin, hit_t = state
            pos = [ro_b[i] + t_cur * rd_b[i] for i in range(3)]
            # coarse phase (coarse units: t_c = t / COARSE)
            roc = [pos[i] / Cf for i in range(3)]
            chit, tc, _, c_exit = coarse_march(roc, rd_b, done)
            # the DDA never tests the STARTING cell — if the ray begins
            # inside an occupied supervoxel, fine-march from here
            c0 = [jnp.clip(jnp.floor(roc[i]).astype(jnp.int32), 0,
                           (hc, wc, dc)[i] - 1) for i in range(3)]
            in0 = ((roc[0] >= 0) & (roc[0] < hc) & (roc[1] >= 0)
                   & (roc[1] < wc) & (roc[2] >= 0) & (roc[2] < dc))
            w0 = occ_c_flat[jnp.clip(
                c0[0] * (wc * dwc) + c0[1] * dwc + (c0[2] >> 5),
                0, hc * wc * dwc - 1)]
            occ0 = in0 & (
                ((w0 >> (c0[2] & 31).astype(jnp.uint32)) & 1) != 0)
            miss_c = jnp.logical_not(done) & jnp.logical_not(occ0) & (
                (chit < 0) | c_exit)
            done = done | miss_c
            t_enter = t_cur + jnp.where(occ0, 0.0, tc * Cf)
            # back off so the block's first fine cell is ENTERED (the
            # fine march only samples after a crossing)
            t_start = jnp.maximum(t_enter - 1e-3, 0.0)
            ro2 = [ro_b[i] + t_start * rd_b[i] for i in range(3)]
            flin, tf, t_prog, f_exit = fine_march(ro2, rd_b, done)
            newly_hit = jnp.logical_not(done) & (flin >= 0)
            hit_lin = jnp.where(newly_hit, flin, hit_lin)
            hit_t = jnp.where(newly_hit, t_start + tf, hit_t)
            done = done | newly_hit | f_exit
            # resume just inside the last TESTED fine cell
            t_next = t_start + t_prog + 1e-3
            return (r + 1, jnp.maximum(t_next, t_cur), done,
                    hit_lin, hit_t)

        def round_cond(state):
            r, _, done = state[0], state[1], state[2]
            return (r < n_rounds) & jnp.logical_not(jnp.all(done))

        out = jax.lax.while_loop(round_cond, round_body, (
            jnp.int32(0), jnp.zeros((Rb,), jnp.float32), done0,
            jnp.full((Rb,), -1, jnp.int32),
            jnp.full((Rb,), jnp.inf, jnp.float32)))
        return carry, (out[3], out[4])

    _, (hit_lin_b, hit_t_b) = jax.lax.scan(run_band, 0, xs)
    hit_lin = hit_lin_b.reshape(-1)[:R]
    hit_t = hit_t_b.reshape(-1)[:R]
    hit = hit_lin >= 0
    hit_id = jnp.where(
        hit, vol_flat[jnp.clip(hit_lin, 0, h * w * d - 1)], 0)
    # depth is measured from the true camera origin (t_skip happened
    # before the march started)
    hit_t = jnp.where(hit, hit_t + t_skip, hit_t)
    return RaycastResult(
        voxel_id=hit_id.reshape(H, W),
        depth=hit_t.reshape(H, W),
        raydirs=raydir,
    )


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
        img_dims, occupancy=occupancy)
    vp_map = res.voxel_id - 1  # -1 = miss
    ins = points[:, 4]
    ins_map = jnp.where(vp_map >= 0, ins[jnp.maximum(vp_map, 0)], 0)
    return vp_map, ins_map
