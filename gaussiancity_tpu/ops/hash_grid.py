# -*- coding: utf-8 -*-
"""Multiresolution hash-grid positional encoding (instant-NGP style).

TPU-native replacement for the reference's ``grid_encoder`` CUDA extension
(reference: extensions/grid_encoder/grid_encoder_ext.cu:51-249,
__init__.py:125-193).  The trilinear (2^D-corner) interpolation is a plain
XLA gather + weighted sum; the backward is a custom VJP: the embedding
gradient goes through a sorted one-hot MXU reduction
(``hash_grid_bwd.py``) instead of XLA's serial scatter-add (which costs
~730 ms/step at the REST recipe's 8.4M corner updates), and the input
gradient is the closed-form multilinear chain.

Table layout (TPU): embeddings live as ``[L, R_max, C]`` — one padded
row-block per level, gathered level-by-level with LEVEL-LOCAL indices.
Measured on-chip at the REST shape (8.4M corner lookups, 2^19 rows/level):
one offset-indexed gather from the packed 268MB table runs at ~15 ns/row
(121 ms); sixteen per-level gathers from the 3-D layout run at ~3.5 ns/row
(29 ms) — XLA's TPU gather is memory-locality-bound, and the per-level
working set (16.8 MB) caches where the packed table cannot.  Row ``r`` of
level ``l`` corresponds to the reference's packed row ``offsets[l] + r``.

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

Const-dims fast path (``hash_encode_const``): when the leading input
dims are per-sample constants (the GLOBAL scene code broadcast to every
point) and every level is hashed into the same power-of-two table, the
constant-dim corner combinations collapse INTO the table once per
sample via XOR row permutations, cutting per-point gathers 2^D -> 2^Ds
(32 -> 8 for REST).  Dispatched by point count (``_const_fast_worth_it``
— the TPU gather has a table-footprint-bound floor that the collapse
only beats at inference-scale point counts; all constants measured on
chip, scripts/bench_gather6-9.py and PROGRESS.md round 5).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.ops import hash_grid_bwd

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


def table_shape(in_channels: int, n_levels: int, base_resolution: int,
                desired_resolution: int, log2_hashmap_size: int,
                lvl_channels: int) -> Tuple[int, int, int]:
    """Static [L, R_max, C] embedding-table shape (see module docstring)."""
    _, offsets, _, _, total = level_params(
        in_channels, n_levels, base_resolution, desired_resolution,
        log2_hashmap_size)
    rows = [(list(offsets) + [total])[l + 1] - offsets[l]
            for l in range(n_levels)]
    return n_levels, max(rows), lvl_channels


def repack_legacy_table(packed, in_channels: int, n_levels: int,
                        base_resolution: int, desired_resolution: int,
                        log2_hashmap_size: int):
    """Migrate a round-1 packed ``[total_rows, C]`` embedding table to the
    current ``[L, R_max, C]`` layout (row ``r`` of level ``l`` lives at
    packed row ``offsets[l] + r``; rows past a level's size are zero)."""
    packed = np.asarray(packed)
    total, C = packed.shape
    _, offsets, _, _, expect_total = level_params(
        in_channels, n_levels, base_resolution, desired_resolution,
        log2_hashmap_size)
    if total != expect_total:
        raise ValueError(
            f"packed table has {total} rows; the level layout expects "
            f"{expect_total} — not a legacy GridEncoder table")
    bounds = list(offsets) + [expect_total]
    r_max = max(bounds[l + 1] - bounds[l] for l in range(n_levels))
    out = np.zeros((n_levels, r_max, C), packed.dtype)
    for l in range(n_levels):
        rows = bounds[l + 1] - bounds[l]
        out[l, :rows] = packed[bounds[l]:bounds[l + 1]]
    return out


def _corner_offsets(D: int) -> np.ndarray:
    """[2^D, D] binary corner enumeration."""
    idx = np.arange(2 ** D, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(D, dtype=np.uint32)[None, :]) & 1).astype(
        np.uint32
    )


def _level_geometry(inputs, in_channels, n_levels, base_resolution,
                    desired_resolution, log2_hashmap_size, bound):
    """Per-level indices and per-(corner, dim) interpolation terms.

    Returns (idx [L, 2^D, N] int32 LEVEL-LOCAL rows (no offsets),
    frac [L, D, N] f32, oob [N] bool, static (offsets, level_rows, total,
    scales)).
    """
    D = in_channels
    per_level_scale, offsets, resolutions, hashed, total = level_params(
        D, n_levels, base_resolution, desired_resolution, log2_hashmap_size
    )
    level_rows = [(list(offsets) + [total])[l + 1] - offsets[l]
                  for l in range(n_levels)]
    x01 = (inputs + bound) / (2.0 * bound)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # [N]
    S = math.log2(per_level_scale)
    corners_np = _corner_offsets(D)  # [2^D, D] static 0/1
    x01_d = [x01[:, d] for d in range(D)]

    idx_lvls, frac_lvls, scales = [], [], []
    for lvl in range(n_levels):
        scale = (2.0 ** (lvl * S)) * base_resolution - 1.0
        scales.append(scale)
        resolution = resolutions[lvl]
        hashmap_size = level_rows[lvl]
        grid_d, frac_d = [], []
        for d in range(D):
            pos = x01_d[d] * scale + 0.5  # align_corners=False
            g = jnp.floor(pos)
            grid_d.append(g.astype(jnp.int32))
            frac_d.append(pos - g)

        C2 = 1 << D
        if hashed[lvl]:
            idx = jnp.zeros((C2, x01.shape[0]), dtype=jnp.uint32)
            for d in range(D):
                bit = jnp.asarray(corners_np[:, d].astype(np.uint32))[:, None]
                pc = grid_d[d].astype(jnp.uint32)[None, :] + bit
                idx = idx ^ (pc * jnp.uint32(_PRIMES[d]))
            idx = (idx % jnp.uint32(hashmap_size)).astype(jnp.int32)
        else:
            stride = 1
            idx = jnp.zeros((C2, x01.shape[0]), dtype=jnp.int32)
            for d in range(D):
                bit = jnp.asarray(corners_np[:, d].astype(np.int32))[:, None]
                pc = grid_d[d][None, :] + bit
                idx = idx + pc * stride
                stride *= resolution + 1
            idx = idx % hashmap_size
        idx_lvls.append(idx)
        frac_lvls.append(jnp.stack(frac_d))  # [D, N]

    idx_all = jnp.stack(idx_lvls)  # [L, 2^D, N]
    frac_all = jnp.stack(frac_lvls)  # [L, D, N]
    return idx_all, frac_all, oob, (tuple(offsets), tuple(level_rows),
                                    total, tuple(scales))


def _corner_weights(frac_all: jnp.ndarray, D: int) -> jnp.ndarray:
    """[L, D, N] fracs -> [L, 2^D, N] multilinear corner weights."""
    corners_np = _corner_offsets(D)
    L, _, N = frac_all.shape
    w = jnp.ones((L, 1 << D, N), dtype=frac_all.dtype)
    for d in range(D):
        f = frac_all[:, None, d, :]  # [L, 1, N]
        bit = jnp.asarray((corners_np[:, d] == 1))[None, :, None]
        w = w * jnp.where(bit, f, 1.0 - f)
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def hash_encode(
    inputs: jnp.ndarray,  # [N, D] in [-bound, bound]
    embeddings: jnp.ndarray,  # [L, R_max, C] (see table_shape)
    in_channels: int,
    n_levels: int,
    base_resolution: int,
    desired_resolution: int,
    log2_hashmap_size: int,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Returns [N, n_levels * C]. Differentiable w.r.t. embeddings and
    inputs (custom VJP; see module docstring)."""
    out, _ = _hash_encode_fwd(
        inputs, embeddings, in_channels, n_levels, base_resolution,
        desired_resolution, log2_hashmap_size, bound)
    return out


def _hash_encode_fwd(inputs, embeddings, in_channels, n_levels,
                     base_resolution, desired_resolution,
                     log2_hashmap_size, bound):
    D = in_channels
    idx_all, frac_all, oob, static = _level_geometry(
        inputs, D, n_levels, base_resolution, desired_resolution,
        log2_hashmap_size, bound)
    w = _corner_weights(frac_all, D)  # [L, 2^D, N]
    # per-level gathers (unrolled): each level's queries hit only its own
    # [R_max, C] block — ~4x faster than one offset-gather (module docstring)
    vals = jnp.stack([embeddings[lvl][idx_all[lvl]]
                      for lvl in range(n_levels)])  # [L, 2^D, N, C]
    out = jnp.sum(vals * w[..., None], axis=1)  # [L, N, C]
    L, N, C = out.shape
    out = out.transpose(1, 0, 2).reshape(N, L * C)
    out = jnp.where(oob[:, None], 0.0, out)
    return out, (idx_all, frac_all, w, vals, oob, embeddings.shape)


def _hash_encode_bwd(in_channels, n_levels, base_resolution,
                     desired_resolution, log2_hashmap_size, bound,
                     res, g):
    D = in_channels
    idx_all, frac_all, w, vals, oob, emb_shape = res
    S = math.log2(desired_resolution / base_resolution) / (n_levels - 1)
    scales = [(2.0 ** (l * S)) * base_resolution - 1.0
              for l in range(n_levels)]
    L = n_levels
    N = g.shape[0]
    C = emb_shape[2]
    R_max = emb_shape[1]

    gm = jnp.where(oob[:, None], 0.0, g)  # [N, L*C]
    g_l = gm.reshape(N, L, C).transpose(1, 0, 2)  # [L, N, C]

    # d_embeddings: sorted one-hot MXU reduction (TPU) / scatter (CPU)
    if jax.default_backend() == "tpu":
        d_emb = hash_grid_bwd.hash_grad_embeddings(
            idx_all, w, g_l, R_max)
    else:
        d_vals = w[..., None] * g_l[:, None]  # [L, 2^D, N, C]
        d_emb = jax.vmap(
            lambda il, dl: jnp.zeros((R_max, C), g.dtype).at[
                il.reshape(-1)].add(dl.reshape(-1, C))
        )(idx_all, d_vals)

    # d_inputs: closed-form multilinear chain.
    # dw[l, c, n] = <vals[l, c, n], g_l[l, n]>
    dw = jnp.einsum("lcnk,lnk->lcn", vals, g_l)
    corners_np = _corner_offsets(D)
    # term[l, d, c, n] = bit ? f : 1 - f ; dweight/dfrac_d = sign *
    # prod_{d' != d} term_{d'}
    d_x01 = []
    scales_arr = jnp.asarray(scales, dtype=frac_all.dtype)  # [L]
    for d in range(D):
        prod = jnp.ones_like(dw)  # [L, 2^D, N]
        for d2 in range(D):
            if d2 == d:
                continue
            f = frac_all[:, None, d2, :]
            bit = jnp.asarray(corners_np[:, d2] == 1)[None, :, None]
            prod = prod * jnp.where(bit, f, 1.0 - f)
        sign = jnp.where(jnp.asarray(corners_np[:, d] == 1), 1.0,
                         -1.0)[None, :, None]
        dfrac_d = jnp.sum(dw * sign * prod, axis=1)  # [L, N]
        # pos = x01 * scale + 0.5 -> d x01 = scale * d frac
        d_x01.append(jnp.sum(dfrac_d * scales_arr[:, None], axis=0))  # [N]
    d_x01 = jnp.stack(d_x01, axis=-1)  # [N, D]
    d_inputs = d_x01 / (2.0 * bound)
    d_inputs = jnp.where(oob[:, None], 0.0, d_inputs)
    return d_inputs, d_emb


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Const-dims fast path (REST recipe): the GLOBAL encoder broadcasts one
# scene code to every point, so the trailing hash dims are per-sample
# constants.  Every REST level is hashed with a full 2^19-row table, and
# XOR commutes with mod-2^k, so the 2^Dc constant-dim corner combinations
# collapse INTO the table once per sample:
#
#   idx(c) = (h_S(c_S) ^ h_K(c_K)) & mask          (mask = R - 1, R = 2^k)
#   out    = sum_{c_S} w_S * E~[(h_S ^ m00) & mask]
#   E~     = PROD_d [(1 - f_d) I + f_d P_{delta_d}] (E)
#
# where P_m is the XOR-by-m row permutation, delta_d = (g_d P_d) ^
# ((g_d+1) P_d) and m00 = XOR_d g_d P_d.  Per-point gathers drop from
# 2^D to 2^(D-Dc) corners (32 -> 8 for the 5-D REST encoder) — the
# hash-grid gather is the dominant cost of both the REST train step and
# the inference frame (measured ~3.5 ns/row; VERDICT r4 item 1).
# The collapse costs Dc(Dc+1)/2 XOR-permutation passes over [L, R, C]
# (a grouped row-gather + an exact one-hot in-group matmul), plus the
# same passes applied to the scattered gradient in the VJP (the pass
# operator is self-adjoint: P_m is a symmetric involution).
# ---------------------------------------------------------------------------

def _const_fast_worth_it(n_points: int, level_rows: int) -> bool:
    """Dispatch rule for the const-dims fast path (measured on chip, r5):
    a per-level gather has a TABLE-FOOTPRINT-bound floor of ~1.6 ms per
    16.8 MB level regardless of row count (131k and 524k rows both
    measure ~1.7 ms/level; a 2 MB table runs 0.42 ms), so cutting
    corners 32 -> 8 saves nothing once the row count is under the floor,
    while the collapse costs a flat ~12 ms.  Above the floor the gather
    scales at ~3.5 ns/row and the fast path wins (5x at the 196k
    inference slab; measured breakeven ~N = R/20).  bf16 tables were
    REFUTED as a lever: same 26 ms at M=131k, 99 ms (pathological) at
    M=524k."""
    return n_points >= level_rows // 16

# The XOR permutation runs in CHANNEL-MAJOR layout [L, C, nb, 128] with
# the permuted axis split over (block, lane): the high bits move whole
# 128-lane groups (a row gather of 512-byte rows), and the low 7 bits
# are one lane-axis one-hot matmul [*, 128] @ [128, 128] — perfect MXU
# shapes.  Row-major [L, R, C=8] formulations all stall on the minor-8
# axis (measured on chip, scripts/bench_gather7-9: 15-39 ms per apply
# from lane padding and hidden re-tiling relayouts; the isolated
# channel-major matmul + gather run at bandwidth, ~2 ms).  Transposes
# in/out cost ~0.5 ms each, so the collapse concatenates the value and
# derivative tables in channel-major space and transposes ONCE.
_LANE = 128


def const_fast_path_ok(in_channels: int, n_levels: int,
                       base_resolution: int, desired_resolution: int,
                       log2_hashmap_size: int, n_const_dims: int) -> bool:
    """True iff the collapse is exact: every level hashed into the same
    power-of-two table size (always the case for the 5-D REST encoder:
    17^5 > 2^19 already at level 0)."""
    if n_const_dims <= 0 or n_const_dims >= in_channels:
        return False
    _, offsets, _, hashed, total = level_params(
        in_channels, n_levels, base_resolution, desired_resolution,
        log2_hashmap_size)
    rows = [(list(offsets) + [total])[l + 1] - offsets[l]
            for l in range(n_levels)]
    R = rows[0]
    return all(hashed) and all(r == R for r in rows) and (R & (R - 1)) == 0


def _to_cm(X: jnp.ndarray) -> jnp.ndarray:
    """[L, R, C] row-major -> [L, nb, C, LANE] block-major."""
    L, R, C = X.shape
    lane = min(_LANE, R)
    return X.reshape(L, R // lane, lane, C).transpose(0, 1, 3, 2)


def _from_cm(Xcm: jnp.ndarray) -> jnp.ndarray:
    """[L, nb, C', LANE] block-major -> [L, R, C'] row-major."""
    L, nb, Cc, lane = Xcm.shape
    return Xcm.transpose(0, 1, 3, 2).reshape(L, nb * lane, Cc)


def _xor_perm_cm(Xcm: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Row permutation (j -> j ^ m[l]) of a block-major table
    [L, nb, C, LANE] (m traced per level; see the layout note above).

    High bits: gather whole 128-row blocks — each row is a CONTIGUOUS
    [C, LANE] 4 KB slab (the TPU gather is issue-bound at ~13-20 ns/row,
    bench_gather9 follow-ups: 512-byte rows cost 6.8 ms, 4 KB rows
    amortize to ~1 ms).  Low 7 bits: lane-axis one-hot matmul; on TPU
    the payload rides a bf16 hi/lo split (the one-hot operand is exact
    in bf16; ~2^-16 relative error), on CPU the f32 einsum is exact."""
    L, nb, C, lane = Xcm.shape
    out = Xcm
    if nb > 1:
        rows = (jnp.arange(nb, dtype=jnp.int32)[None, :]
                ^ (m // lane)[:, None])  # [L, nb]
        out = jax.vmap(lambda x, r: x[r])(
            out.reshape(L, nb, C * lane), rows).reshape(L, nb, C, lane)
    gi = jnp.arange(lane, dtype=jnp.int32)
    mlo = m % lane
    # P[l, g, h] = (g ^ mlo[l] == h)  (symmetric involution)
    P = (gi[None, :, None] ^ mlo[:, None, None] == gi[None, None, :])
    if jax.default_backend() == "tpu":
        xh = out.astype(jnp.bfloat16)
        xl = (out - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        Pb = P.astype(jnp.bfloat16)
        return (jnp.einsum("lrcg,lgh->lrch", xh, Pb,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("lrcg,lgh->lrch", xl, Pb,
                             preferred_element_type=jnp.float32))
    return jnp.einsum("lrcg,lgh->lrch", out, P.astype(Xcm.dtype))


def _collapse_tables(emb, fc, delta, want_derivs: bool):
    """Fold the constant dims into the table.

    emb [L, R, C]; fc [L, Dc] const-dim fracs; delta [L, Dc] int32
    masked XOR deltas.  Returns the ROW-MAJOR concatenation
    [L, R, (1 + Dc) * C] of the value table and (when ``want_derivs``)
    the Dc derivative tables d val / d fc[:, d] — one transpose total.
    The per-dim passes commute (multilinear), so derivative tables spawn
    as ``perm(val) - val`` at their own dim and receive the other dims'
    normal weights."""
    val = _to_cm(emb)
    derivs = []
    Dc = fc.shape[1]
    for d in range(Dc):
        f = fc[:, d][:, None, None, None]
        pval = _xor_perm_cm(val, delta[:, d])
        new_derivs = []
        for dv in derivs:
            pdv = _xor_perm_cm(dv, delta[:, d])
            new_derivs.append((1.0 - f) * dv + f * pdv)
        if want_derivs:
            new_derivs.append(pval - val)
        derivs = new_derivs
        val = (1.0 - f) * val + f * pval
    cat = jnp.concatenate([val] + derivs, axis=2) if derivs else val
    return _from_cm(cat)


def _split_geometry(inputs, D, Dc, n_levels, base_resolution,
                    desired_resolution, log2_hashmap_size, bound):
    """Per-level spatial corner indices + const-dim collapse parameters.

    inputs [B, N, D] with inputs[:, :, :Dc] constant over N (caller
    contract).  Returns (idxS [B, L, 2^Ds, N] int32 final masked indices
    (m00 folded in), fS [B, L, Ds, N], fc [B, L, Dc], delta [B, L, Dc]
    int32, oob [B, N] bool, scales tuple, R)."""
    Ds = D - Dc
    per_level_scale, offsets, _, hashed, total = level_params(
        D, n_levels, base_resolution, desired_resolution, log2_hashmap_size)
    R = (list(offsets) + [total])[1] - offsets[0]
    mask = jnp.uint32(R - 1)
    x01 = (inputs + bound) / (2.0 * bound)  # [B, N, D]
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # [B, N]
    xc = x01[:, 0, :Dc]  # [B, Dc] (constant over N by contract)
    xs = x01[:, :, Dc:]  # [B, N, Ds]
    S = math.log2(per_level_scale)
    corners_np = _corner_offsets(Ds)  # [2^Ds, Ds]

    idx_lvls, fs_lvls, fc_lvls, delta_lvls, scales = [], [], [], [], []
    for lvl in range(n_levels):
        scale = (2.0 ** (lvl * S)) * base_resolution - 1.0
        scales.append(scale)
        # spatial dims (original dims Dc..D-1 keep their reference primes)
        pos = xs * scale + 0.5
        g = jnp.floor(pos)
        fs_lvls.append(jnp.moveaxis(pos - g, -1, 1))  # [B, Ds, N]
        gi = g.astype(jnp.int32)
        C2 = 1 << Ds
        B, N = inputs.shape[:2]
        idx = jnp.zeros((B, C2, N), dtype=jnp.uint32)
        for d in range(Ds):
            bit = jnp.asarray(corners_np[:, d].astype(np.uint32))[None, :,
                                                                  None]
            pc = gi[:, :, d].astype(jnp.uint32)[:, None, :] + bit
            idx = idx ^ (pc * jnp.uint32(_PRIMES[Dc + d]))
        # const dims: per-sample scalars
        posc = xc * scale + 0.5  # [B, Dc]
        gc = jnp.floor(posc)
        fc_lvls.append(posc - gc)
        gci = gc.astype(jnp.int32).astype(jnp.uint32)
        m00 = jnp.zeros((B,), jnp.uint32)
        deltas = []
        for d in range(Dc):
            p = jnp.uint32(_PRIMES[d])
            a0 = gci[:, d] * p
            a1 = (gci[:, d] + jnp.uint32(1)) * p
            m00 = m00 ^ a0
            deltas.append((a0 ^ a1) & mask)
        delta_lvls.append(jnp.stack(deltas, -1).astype(jnp.int32))
        idx = (idx & mask) ^ (m00 & mask)[:, None, None]
        idx_lvls.append(idx.astype(jnp.int32))

    idxS = jnp.stack(idx_lvls, 1)  # [B, L, 2^Ds, N]
    fS = jnp.stack(fs_lvls, 1)  # [B, L, Ds, N]
    fc = jnp.stack(fc_lvls, 1)  # [B, L, Dc]
    delta = jnp.stack(delta_lvls, 1)  # [B, L, Dc]
    return idxS, fS, fc, delta, oob, tuple(scales), R


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def hash_encode_const(
    inputs: jnp.ndarray,  # [B, N, D]; [:, :, :n_const_dims] const over N
    embeddings: jnp.ndarray,  # [L, R, C]
    in_channels: int,
    n_levels: int,
    base_resolution: int,
    desired_resolution: int,
    log2_hashmap_size: int,
    bound: float,
    n_const_dims: int,
) -> jnp.ndarray:
    """hash_encode with the leading ``n_const_dims`` input dims constant
    across points (per batch row).  Bit-equal semantics to the generic
    path (validated by tests/test_hash_grid_bwd.py); requires
    ``const_fast_path_ok``.  Returns [B, N, L * C]."""
    out, _ = _const_fwd(inputs, embeddings, in_channels, n_levels,
                        base_resolution, desired_resolution,
                        log2_hashmap_size, bound, n_const_dims, False)
    return out


def _const_fwd(inputs, embeddings, D, n_levels, base_resolution,
               desired_resolution, log2_hashmap_size, bound, Dc,
               want_grads: bool):
    Ds = D - Dc
    B, N = inputs.shape[:2]
    L, _, C = embeddings.shape
    idxS, fS, fc, delta, oob, scales, R = _split_geometry(
        inputs, D, Dc, n_levels, base_resolution, desired_resolution,
        log2_hashmap_size, bound)

    outs, valss, dvalss, ws = [], [], [], []
    for b in range(B):  # B == 1 in every recipe; unrolled
        tab = _collapse_tables(embeddings[:, :R], fc[b], delta[b],
                               want_grads)  # [L, R, (1+Dc)*C]
        vals_cat = jnp.stack([tab[lvl][idxS[b, lvl]]
                              for lvl in range(L)])  # [L, 2^Ds, N, *]
        w = _corner_weights(fS[b], Ds)  # [L, 2^Ds, N]
        vals = vals_cat[..., :C]
        out = jnp.sum(vals * w[..., None], axis=1)  # [L, N, C]
        out = out.transpose(1, 0, 2).reshape(N, L * C)
        outs.append(jnp.where(oob[b][:, None], 0.0, out))
        if want_grads:
            valss.append(vals)
            dvalss.append(jnp.stack(
                [vals_cat[..., (1 + d) * C:(2 + d) * C]
                 for d in range(Dc)]))  # [Dc, L, 2^Ds, N, C]
            ws.append(w)
    out = jnp.stack(outs)
    res = ((idxS, fS, fc, delta, oob, scales,
            jnp.stack(valss), jnp.stack(dvalss), jnp.stack(ws), R)
           if want_grads else None)
    return out, res


def _const_fwd_rule(inputs, embeddings, D, n_levels, base_resolution,
                    desired_resolution, log2_hashmap_size, bound, Dc):
    out, res = _const_fwd(inputs, embeddings, D, n_levels,
                          base_resolution, desired_resolution,
                          log2_hashmap_size, bound, Dc, True)
    return out, res + (embeddings.shape,)


def _const_bwd_rule(D, n_levels, base_resolution, desired_resolution,
                    log2_hashmap_size, bound, Dc, res, g):
    (idxS, fS, fc, delta, oob, scales, vals, dvals, w, R,
     emb_shape) = res
    Ds = D - Dc
    B, N = g.shape[:2]
    L, R_max, C = emb_shape
    corners_np = _corner_offsets(Ds)
    scales_arr = jnp.asarray(scales, dtype=jnp.float32)

    gm = jnp.where(oob[..., None], 0.0, g)  # [B, N, L*C]
    g_l = gm.reshape(B, N, L, C).transpose(0, 2, 1, 3)  # [B, L, N, C]

    d_emb = jnp.zeros((L, R_max, C), jnp.float32)
    dxs_list, dxc_list = [], []
    for b in range(B):
        # embedding grad: scatter into collapsed-table space, then apply
        # the (self-adjoint) collapse passes to map back to E-space
        if jax.default_backend() == "tpu":
            d_tab = hash_grid_bwd.hash_grad_embeddings(
                idxS[b], w[b], g_l[b], R)
        else:
            d_vals = w[b][..., None] * g_l[b][:, None]  # [L, 2^Ds, N, C]
            d_tab = jax.vmap(
                lambda il, dl: jnp.zeros((R, C), jnp.float32).at[
                    il.reshape(-1)].add(dl.reshape(-1, C))
            )(idxS[b], d_vals)
        d_e = _collapse_tables(d_tab, fc[b], delta[b], False)
        d_emb = d_emb.at[:, :R].add(d_e)

        # spatial input grads: closed-form multilinear chain over Ds dims
        dw = jnp.einsum("lcnk,lnk->lcn", vals[b], g_l[b])
        d_x01_s = []
        for d in range(Ds):
            prod = jnp.ones_like(dw)
            for d2 in range(Ds):
                if d2 == d:
                    continue
                f = fS[b][:, None, d2, :]
                bit = jnp.asarray(corners_np[:, d2] == 1)[None, :, None]
                prod = prod * jnp.where(bit, f, 1.0 - f)
            sign = jnp.where(jnp.asarray(corners_np[:, d] == 1), 1.0,
                             -1.0)[None, :, None]
            dfrac_d = jnp.sum(dw * sign * prod, axis=1)  # [L, N]
            d_x01_s.append(jnp.sum(dfrac_d * scales_arr[:, None], axis=0))
        dxs_list.append(jnp.stack(d_x01_s, axis=-1))  # [N, Ds]

        # const-dim input grads via the derivative tables:
        # d out / d fc_d = sum_cS wS * (d val/d fc_d)[idx]  (per point)
        dxc = jnp.einsum("l,lcn,dlcnk,lnk->nd", scales_arr, w[b],
                         dvals[b], g_l[b])  # [N, Dc]
        dxc_list.append(dxc)

    d_x01 = jnp.concatenate([jnp.stack(dxc_list), jnp.stack(dxs_list)],
                            axis=-1)  # [B, N, D]
    d_inputs = d_x01 / (2.0 * bound)
    d_inputs = jnp.where(oob[..., None], 0.0, d_inputs)
    return d_inputs, d_emb


hash_encode_const.defvjp(_const_fwd_rule, _const_bwd_rule)


class GridEncoder(nn.Module):
    """Flax module owning the hash table (reference: grid_encoder
    __init__.py:125-193; init uniform(-1e-4, 1e-4))."""

    in_channels: int
    n_levels: int = 16
    lvl_channels: int = 8
    desired_resolution: int = 2048
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    # caller contract: inputs[..., :n_const_dims] are constant across the
    # point axis (per batch row) — e.g. a broadcast GLOBAL scene code.
    # Enables the table-collapse fast path (see hash_encode_const).
    n_const_dims: int = 0

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.lvl_channels

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        shape3 = table_shape(
            self.in_channels, self.n_levels, self.base_resolution,
            self.desired_resolution, self.log2_hashmap_size,
            self.lvl_channels,
        )
        embeddings = self.param(
            "embeddings",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1e-4, maxval=1e-4
            ),
            shape3,
        )
        prefix = inputs.shape[:-1]
        if (inputs.ndim == 3
                and _const_fast_worth_it(inputs.shape[1], shape3[1])
                and const_fast_path_ok(
                self.in_channels, self.n_levels, self.base_resolution,
                self.desired_resolution, self.log2_hashmap_size,
                self.n_const_dims)):
            return hash_encode_const(
                inputs, embeddings, self.in_channels, self.n_levels,
                self.base_resolution, self.desired_resolution,
                self.log2_hashmap_size, bound, self.n_const_dims,
            )
        flat = inputs.reshape(-1, self.in_channels)
        out = hash_encode(
            flat, embeddings, self.in_channels, self.n_levels,
            self.base_resolution, self.desired_resolution,
            self.log2_hashmap_size, bound,
        )
        return out.reshape(*prefix, self.output_dim)
