# -*- coding: utf-8 -*-
"""Point Transformer V3 — serialized point-cloud U-Net, TPU-native (Flax).

Re-design of the reference backbone (reference: models/pt_v3.py:1137-1344)
for static shapes and XLA:

- **Batching by vmap.** The reference packs batches into one ragged point
  list with offset bookkeeping (models/pt_v3.py:26-41, 689-747); here every
  stage is a single-sample function over padded [N, ...] arrays with a
  validity mask, lifted over the batch with ``nn.vmap``.  All the
  offset/cu_seqlens machinery disappears.
- **Serialized patch attention** (models/pt_v3.py:604-799): stable argsort
  of SFC codes (ops/serialization.py), wrap-around duplication for the last
  partial patch reproduced exactly (pad slot j duplicates slot j - patch,
  models/pt_v3.py:720-731), dense per-patch attention on the MXU instead of
  flash varlen — patches are fixed-size so varlen machinery is unnecessary.
- **Pooling** (models/pt_v3.py:957-1063): codes are already sorted, so the
  reference's ``torch.unique`` clusters are *runs* in the sorted array —
  computed with a run-boundary diff + masked ``segment_max/sum``; fully
  static shapes (cluster capacity = point capacity by default).
- **Submanifold sparse conv (CPE + stem)** replacing spconv
  (models/pt_v3.py:854-861, 1117-1126): neighbor voxel lookup by binary
  search over sorted voxel keys, one MXU matmul per kernel offset,
  accumulated with ``lax.scan``.
- BatchNorm(eps 1e-3, momentum 0.01) is mask-aware; LayerNorm eps 1e-5 and
  exact (erf) GELU match the torch defaults.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import PTv3Config
from gaussiancity_tpu.models.generator import TorchDense
from gaussiancity_tpu.ops import serialization as ser


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid points (torch eps 1e-3, momentum 0.01 —
    reference: models/pt_v3.py:1201).

    Train: normalize with the masked batch statistics over every valid
    point of the whole batch — ``axis_name`` reduces across the lifting
    ``nn.vmap``'s batch axis, so the stats match torch's BatchNorm1d over
    the reference's concatenated ragged point list for any batch size —
    and fold them into running averages with torch semantics
    (new = (1-momentum)*old + momentum*batch, running var unbiased).
    Eval: normalize with the running averages (torch eval path).

    The running stats live in the "batch_stats" collection; the update is
    computed purely from axis-reduced (unbatched) quantities, so the
    collection stays broadcast (variable_axes None) under ``nn.vmap``.
    """

    eps: float = 1e-3
    momentum: float = 0.01
    dtype: Optional[Any] = None  # output/compute dtype; stats always f32
    axis_name: Optional[str] = None  # vmap batch axis to reduce stats over

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        x32 = x.astype(jnp.float32)
        m = mask[:, None].astype(jnp.float32)
        if train or self.is_initializing():
            n = jnp.sum(m)
            s = jnp.sum(x32 * m, axis=0)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s / n
            vs = jnp.sum(((x32 - mean) ** 2) * m, axis=0)
            if self.axis_name is not None:
                vs = jax.lax.psum(vs, self.axis_name)
            var = vs / n
            if not self.is_initializing():
                mom = self.momentum
                uvar = vs / jnp.maximum(n - 1.0, 1.0)  # torch: unbiased
                ra_mean.value = (1.0 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1.0 - mom) * ra_var.value + mom * uvar
        else:
            mean = ra_mean.value
            var = ra_var.value
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype) if self.dtype is not None else y


def _maybe_remat(f, remat: bool):
    """Rematerialize attention logits / conv neighbor gathers in the
    backward.  Saves residual memory for memory-constrained configs; at
    the 16k-point training shapes the recompute costs ~18 ms/step
    (cfg.remat=False is the default: ~1.7 GB of residuals on a 16 GB
    chip; forward-only inference never materializes them either way)."""
    return jax.checkpoint(f) if remat else f


class LayerNormT(nn.Module):
    """LayerNorm with torch eps (stats in f32, output in ``dtype``)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5)(x.astype(jnp.float32))
        return y.astype(self.dtype) if self.dtype is not None else y


def gelu(x):
    return nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Submanifold sparse conv via sorted-key neighbor search
# ---------------------------------------------------------------------------


def voxel_keys(grid_coord: jnp.ndarray, valid: jnp.ndarray,
               depth: int = 10) -> jnp.ndarray:
    """Unique spatial key per voxel (assumes coords < 2^depth)."""
    M = 1 << depth
    g = grid_coord.astype(jnp.int32)
    key = (g[:, 0] * M + g[:, 1]) * M + g[:, 2]
    return jnp.where(valid, key, ser.INVALID_CODE)


def subm_neighbors(grid_coord, valid, kernel_size: int, depth: int = 10):
    """Precompute submanifold-conv neighbor indices for one voxel grid.

    One argsort of the voxel keys, then the K^3 offset lookups in ONE
    batched merge instead of per-offset ``searchsorted``: each query row
    ``sorted_keys + off`` is itself sorted, so the rank of every query in
    ``sorted_keys`` falls out of a stable sort of the concatenated
    [queries, keys] row (count of keys preceding each query) — two
    batched ``lax.sort``s total.  ``searchsorted`` lowers to a
    binary-search loop of serial per-element gathers on TPU: the k5 stem
    measured 250 ms at 16k points vs ~25 ms for this formulation.

    Shared by every SubMConv on the same (grid_coord, valid) — each PTv3
    stage computes this once instead of once per block, and the integer
    index math stays outside the blocks' remat regions (it has no grads
    to recompute).

    Returns (nb_idx [K^3, N] int32, found [K^3, N] bool).
    """
    N = grid_coord.shape[0]
    r = kernel_size // 2
    M = 1 << depth
    keys = voxel_keys(grid_coord, valid, depth)
    order = jnp.argsort(keys)
    sorted_keys = keys[order]
    offs = jnp.asarray(
        [dx * M * M + dy * M + dz
         for dx in range(-r, r + 1)
         for dy in range(-r, r + 1)
         for dz in range(-r, r + 1)], dtype=jnp.int32)
    K = offs.shape[0]

    # merged ranks: queries at positions [0, N) so a stable sort puts a
    # query BEFORE equal keys -> rank = #{keys < q} = searchsorted-left.
    # The query payload is the ORIGINAL point id (order[j]): the second
    # payload sort then lands ranks directly in original point order — a
    # scatter-free permutation apply, no inverse gather needed.
    # Invalid points carry INVALID_CODE (int32 max); clamp them below the
    # wrap point so `sorted_keys + off` stays finite and each query row
    # stays genuinely sorted (their results are masked by `valid` in
    # `found` below either way).
    max_off = r * (M * M + M + 1)
    q_keys = jnp.minimum(sorted_keys, ser.INVALID_CODE - max_off)
    queries = q_keys[None, :] + offs[:, None]  # [K, N], rows sorted
    akeys = jnp.broadcast_to(sorted_keys[None], (K, N))
    cat = jnp.concatenate([queries, akeys], axis=1)  # [K, 2N]
    pay = jnp.concatenate([
        jnp.broadcast_to(order.astype(jnp.int32)[None], (K, N)),
        jnp.broadcast_to(
            jnp.arange(N, 2 * N, dtype=jnp.int32)[None], (K, N)),
    ], axis=1)
    _, sp = jax.lax.sort((cat, pay), dimension=1, num_keys=1)
    is_key = (sp >= N).astype(jnp.int32)
    rank = jnp.cumsum(is_key, axis=1) - is_key  # keys strictly before slot
    _, rank_by_orig = jax.lax.sort((sp, rank), dimension=1, num_keys=1)
    pos = jnp.clip(rank_by_orig[:, :N], 0, N - 1)  # [K, N] by point id
    nb_idx = order[pos]
    # hit test in original order against the (small) key array: the
    # neighbor is real iff its voxel key equals key + offset
    found = (keys[nb_idx] == keys[None, :] + offs[:, None]) & valid[None, :]
    return nb_idx, found


def subm_neighbors_dense(grid_coord, valid, kernel_size: int,
                         depth: int = 10, extent: int = 256):
    """``subm_neighbors`` via a dense voxel id-map instead of the sorted
    merge: scatter point ids into an [extent^3] volume (min-combine —
    the lowest index among co-voxel points, matching the stable merge's
    first-of-equal-run), then the K^3 lookups are plain gathers.

    Measured on chip (r5): the merge's two [K^3, 2N] batched sorts cost
    37.9 ms for the k5 stem at 16k points; this path is a 1.5 ms scatter
    + ~2M gathers from a 67 MB volume (~7 ms).  Grid coords are already
    min-shifted (ops/serialization.py::grid_coords), and every PTv3
    recipe feeds per-instance NORMALIZED coords (|rel| <= ~1, grid_size
    0.01 -> extent <= ~200), so coords fit the 256^3 volume; points
    outside it are counted in the returned ``overflow`` scalar (their
    own writes are dropped and their neighbors may be missed — surfaced
    through the PTv3 diagnostics like the pooling overflow counters).
    False positives are impossible WITHOUT a key re-check: distinct
    in-extent cells never collide (lin is injective), so a written cell
    (id < N) IS an exact neighbor — unlike the merge path's approximate
    rank positions, no key verification gather is needed.

    Returns (nb_idx [K^3, N] int32, found [K^3, N] bool, overflow)."""
    N = grid_coord.shape[0]
    r = kernel_size // 2
    g = grid_coord.astype(jnp.int32)
    in_r = valid & jnp.all((g >= 0) & (g < extent), axis=1)
    overflow = jnp.sum((valid & jnp.logical_not(in_r)).astype(jnp.int32))
    lin = (g[:, 0] * extent + g[:, 1]) * extent + g[:, 2]
    ids = jnp.where(in_r, jnp.arange(N, dtype=jnp.int32), N)
    vol = jnp.full((extent ** 3,), N, jnp.int32).at[
        jnp.where(in_r, lin, 0)].min(ids, mode="promise_in_bounds")
    offs3 = jnp.asarray(np.asarray(
        [(dx, dy, dz)
         for dx in range(-r, r + 1)
         for dy in range(-r, r + 1)
         for dz in range(-r, r + 1)], np.int32))  # [K, 3]
    gq = g[None, :, :] + offs3[:, None, :]  # [K, N, 3]
    inq = jnp.all((gq >= 0) & (gq < extent), axis=-1)  # [K, N]
    linq = ((gq[..., 0] * extent + gq[..., 1]) * extent + gq[..., 2])
    j = vol.at[jnp.where(inq, linq, 0)].get(
        mode="promise_in_bounds")  # [K, N]
    jc = jnp.minimum(j, N - 1)
    found = inq & (j < N) & valid[None, :]
    return jc, found, overflow


class SubMConv(nn.Module):
    """Submanifold sparse conv: output only at active sites, gathering
    features of occupied neighbor voxels (replaces spconv.SubMConv3d;
    reference: models/pt_v3.py:854-861).

    Pass precomputed ``neighbors`` (from :func:`subm_neighbors`) to share
    the sort/search across blocks of a stage."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    depth: int = 10
    dtype: Optional[Any] = None
    remat: bool = False

    @nn.compact
    def __call__(self, feat, grid_coord, valid, neighbors=None):
        N, C = feat.shape
        n_offs = self.kernel_size ** 3

        if neighbors is None:
            neighbors = subm_neighbors(grid_coord, valid, self.kernel_size,
                                       self.depth)
        nb_idx, found = neighbors

        fan_in = C * n_offs
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        W = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound),
            (n_offs, C, self.features),
        )

        feat_m = jnp.where(valid[:, None], feat, 0.0)
        if self.dtype is not None:
            # bf16 halves the HBM bytes of the neighbor gathers; the
            # per-offset matmul accumulates into the f32 carry.
            feat_m = feat_m.astype(self.dtype)
            W = W.astype(self.dtype)

        # checkpoint: recompute the neighbor gather in the backward instead
        # of storing a [N, C] residual per kernel offset
        def body(acc, xs):
            idx_k, found_k, w = xs
            nb_feat = feat_m[idx_k] * found_k[:, None].astype(feat_m.dtype)
            return acc + jnp.matmul(
                nb_feat, w, preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((N, self.features), dtype=jnp.float32)
        out, _ = jax.lax.scan(_maybe_remat(body, self.remat), acc0,
                              (nb_idx, found, W))
        if self.dtype is not None:
            out = out.astype(self.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, minval=-bound,
                                                maxval=bound),
                (self.features,),
            )
            out = out + b.astype(out.dtype)
        return out


# ---------------------------------------------------------------------------
# Serialized patch attention
# ---------------------------------------------------------------------------


def rpe_bounds(patch_size: int):
    """Clamp bound / table stride of the RPE (models/pt_v3.py:608-610)."""
    pos_bnd = int((4 * patch_size) ** (1 / 3) * 2)
    return pos_bnd, 2 * pos_bnd + 1


def rpe_bias_fn(table, patch_size, gc_patch):
    """[3*rpe_num, H] table, [G, K, 3] int grid coords -> [G, H, K, K]
    logit bias (models/pt_v3.py:612-626): per-axis clamped coordinate
    deltas index the table, summed over the three axes."""
    pos_bnd, rpe_num = rpe_bounds(patch_size)
    rel = gc_patch[:, :, None, :] - gc_patch[:, None, :, :]
    idx = (jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd
           + jnp.arange(3, dtype=rel.dtype) * rpe_num)
    bias = table.at[idx].get(mode="promise_in_bounds")  # [G,K,K,3,H]
    return bias.sum(3).transpose(0, 3, 1, 2)  # [G, H, K, K]


class PatchAttention(nn.Module):
    """Dense attention within fixed patches along a serialized order
    (reference: models/pt_v3.py:604-799, flash path semantics).

    ``enable_rpe`` adds the reference's relative-position bias to the
    logits (models/pt_v3.py:604-626,777-778): a learned [3 * (2 * bnd + 1),
    heads] table indexed by the clamped per-axis grid-coordinate deltas
    within each patch, summed over the three axes.  No reference config
    enables it (flash attention asserts it off) — ported for completeness
    behind the flag."""

    channels: int
    num_heads: int
    patch_size: int
    dtype: Optional[Any] = None
    remat: bool = False
    enable_rpe: bool = False

    @nn.compact
    def __call__(self, feat, order, inverse, count, grid_coord=None):
        N, C = feat.shape
        K = self.patch_size
        H = self.num_heads
        hd = C // H
        scale = hd ** -0.5
        n_patches = N // K
        assert N % K == 0, "point capacity must be a multiple of patch size"

        qkv = TorchDense(3 * C, name="qkv", dtype=self.dtype)(feat)  # [N, 3C]

        # wrap-around duplication of the last partial patch
        # (models/pt_v3.py:720-731): pad slot j duplicates slot j - K.
        j = jnp.arange(N, dtype=jnp.int32)
        pad_pos = jnp.where(j < count, j, j - K)
        key_valid = (pad_pos >= 0) & (pad_pos < count)
        pad_pos = jnp.clip(pad_pos, 0, N - 1)
        src = order[pad_pos]  # original indices, padded

        qkv_s = qkv[src].reshape(n_patches, K, 3, H, hd)
        kmask = key_valid.reshape(n_patches, 1, 1, K)
        gc_s = None
        if self.enable_rpe:
            assert grid_coord is not None, "RPE needs grid coordinates"
            gc_s = grid_coord[src].reshape(n_patches, K, 3)

        # Patches are batched into one einsum (a serial per-patch scan
        # starves the MXU: dozens of tiny [H,K,hd] matmuls with layout
        # churn measured ~60x slower than one batched contraction).  The
        # [G, H, K, K] logits are bounded by a byte budget: at training
        # sizes one group covers all patches; at huge inference point
        # counts the scan chunks them.  jax.checkpoint recomputes the
        # logits in the backward either way, so the budget also caps the
        # residual footprint.
        max_bytes = 256 * 1024 * 1024
        bytes_per_patch = 4 * H * K * K + (self.enable_rpe and 16 * K * K)
        group = max(1, min(n_patches, max_bytes // bytes_per_patch))
        while n_patches % group:
            group -= 1
        qkv_g = qkv_s.reshape(n_patches // group, group, K, 3, H, hd)
        kmask_g = kmask.reshape(n_patches // group, group, 1, 1, K)
        gc_g = (gc_s.reshape(n_patches // group, group, K, 3)
                if self.enable_rpe else
                jnp.zeros((n_patches // group, 0), jnp.int32))
        rpe_bias = None
        if self.enable_rpe:
            # table param created here (outside the scan body); the bias
            # math is the module-level pure fn so tests can pin it
            pos_bnd, rpe_num = rpe_bounds(K)
            table = self.param(
                "rpe_table",
                lambda k, s: jax.nn.initializers.truncated_normal(0.02)(
                    k, s, jnp.float32),
                (3 * rpe_num, self.num_heads))
            rpe_bias = functools.partial(rpe_bias_fn, table, K)

        def per_group(carry, xs):
            qkv_p, mask_p, gc_p = xs  # [G, K, 3, H, hd], [G, 1, 1, K], ...
            q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)  # [G, H, K, hd]
            kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
            vv = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
            # logits + softmax in f32 regardless of compute dtype
            attn = jnp.einsum("ghkd,ghmd->ghkm", q * scale, kk,
                              preferred_element_type=jnp.float32)
            if self.enable_rpe:
                attn = attn + rpe_bias(gc_p)
            attn = jnp.where(mask_p, attn, -1e9)
            attn = jax.nn.softmax(attn, axis=-1).astype(vv.dtype)
            o = jnp.einsum("ghkm,ghmd->ghkd", attn, vv)
            return carry, o.transpose(0, 2, 1, 3).reshape(group * K, C)

        per_group = _maybe_remat(per_group, self.remat)
        if n_patches == group:
            _, out = per_group(0, (qkv_g[0], kmask_g[0], gc_g[0]))
        else:
            _, out = jax.lax.scan(per_group, 0, (qkv_g, kmask_g, gc_g))
        out = out.reshape(N, C)

        # scatter back to point order
        out = out[inverse]
        return TorchDense(C, name="proj", dtype=self.dtype)(out)


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------


class PTBlock(nn.Module):
    channels: int
    num_heads: int
    patch_size: int
    mlp_ratio: float
    order_index: int
    drop_path: float
    enable_cpe: bool = True
    enable_rpe: bool = False
    dtype: Optional[Any] = None
    remat: bool = False

    @nn.compact
    def __call__(self, feat, grid_coord, valid, orders_data, count,
                 train: bool, neighbors=None):
        order, inverse = orders_data[self.order_index]

        def dp(x):
            if self.drop_path <= 0.0 or not train:
                return x
            keep = 1.0 - self.drop_path
            rng = self.make_rng("droppath")
            m = jax.random.bernoulli(rng, keep, (x.shape[0], 1)).astype(x.dtype)
            return x * m / keep

        if self.enable_cpe:
            shortcut = feat
            x = SubMConv(self.channels, 3, name="cpe_conv",
                         dtype=self.dtype, remat=self.remat)(
                feat, grid_coord, valid, neighbors)
            x = TorchDense(self.channels, name="cpe_fc", dtype=self.dtype)(x)
            x = LayerNormT(name="cpe_norm", dtype=self.dtype)(x)
            feat = shortcut + x

        shortcut = feat
        x = LayerNormT(name="norm1", dtype=self.dtype)(feat)
        x = PatchAttention(self.channels, self.num_heads, self.patch_size,
                           name="attn", dtype=self.dtype,
                           remat=self.remat, enable_rpe=self.enable_rpe)(
            x, order, inverse, count,
            grid_coord if self.enable_rpe else None)
        feat = shortcut + dp(x)

        shortcut = feat
        x = LayerNormT(name="norm2", dtype=self.dtype)(feat)
        hidden = int(self.channels * self.mlp_ratio)
        x = TorchDense(hidden, name="mlp_fc1", dtype=self.dtype)(x)
        x = gelu(x)
        x = TorchDense(self.channels, name="mlp_fc2", dtype=self.dtype)(x)
        feat = shortcut + dp(x)
        return feat


# ---------------------------------------------------------------------------
# Pooling / unpooling
# ---------------------------------------------------------------------------


def pool_clusters(codes, order, valid, stride):
    """Cluster points whose primary code matches after >> 3*log2(stride)
    (reference: models/pt_v3.py:987-1030).  Codes are sorted, so clusters
    are runs.  Returns (cluster id per point [N], head flags per sorted
    slot, n_clusters, segment id per sorted slot, shifted codes)."""
    pooling_depth = (stride - 1).bit_length()
    code0_sorted = codes[0][order[0]] >> (pooling_depth * 3)
    valid_sorted = valid[order[0]]
    prev = jnp.concatenate(
        [jnp.full((1,), -2147483648, jnp.int32), code0_sorted[:-1]])
    head = (code0_sorted != prev) & valid_sorted
    seg_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1  # [N], -1 before 1st
    seg_sorted = jnp.maximum(seg_sorted, 0)
    n_clusters = jnp.sum(head.astype(jnp.int32))
    # cluster id per ORIGINAL point index
    N = codes.shape[1]
    cluster = jnp.zeros((N,), jnp.int32).at[order[0]].set(seg_sorted)
    return cluster, head, n_clusters, seg_sorted, code0_sorted, pooling_depth


class SerializedPooling(nn.Module):
    """proj -> segment-max over clusters -> BN -> GELU
    (reference: models/pt_v3.py:957-1063).

    ``capacity`` bounds the pooled level's static size: the reference's
    stride-2^k pooling shrinks each level dynamically; here clusters beyond
    the capacity are clamped into the last slot (choose capacities so real
    data never overflows — shell extrusions merge >= 8 z-steps per cluster,
    so capacity = N/2 per stage is conservative).
    """

    out_channels: int
    stride: int
    capacity: int = 0  # 0 => keep full N
    dtype: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat, coord, grid_coord, codes, order, valid, count,
                 grid_size, orders, depth, train: bool):
        N = feat.shape[0]
        cap = self.capacity or N
        cluster, head, n_clusters, seg_sorted, code0_sorted, pdepth = \
            pool_clusters(codes, order, valid, self.stride)
        valid_sorted = valid[order[0]]

        x = TorchDense(self.out_channels, name="proj",
                       dtype=self.dtype)(feat)
        x_sorted = x[order[0]]
        neg = jnp.finfo(x.dtype).min
        x_sorted = jnp.where(valid_sorted[:, None], x_sorted, neg)
        pooled = jax.ops.segment_max(x_sorted, seg_sorted, num_segments=N)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)

        c_sorted = jnp.where(valid_sorted[:, None], coord[order[0]], 0.0)
        csum = jax.ops.segment_sum(c_sorted, seg_sorted, num_segments=N)
        ccnt = jax.ops.segment_sum(
            valid_sorted.astype(jnp.float32), seg_sorted, num_segments=N)
        new_coord = csum / jnp.maximum(ccnt, 1.0)[:, None]

        # head attributes
        head_idx_sorted = jax.ops.segment_max(
            jnp.where(head, jnp.arange(N, dtype=jnp.int32), -1),
            seg_sorted, num_segments=N)
        head_idx_sorted = jnp.maximum(head_idx_sorted, 0)
        head_orig = order[0][head_idx_sorted]  # original idx of cluster head
        new_grid = (grid_coord[head_orig] >> pdepth)

        n_kept = jnp.minimum(n_clusters, cap)
        # Overflow diagnostic: clusters beyond the static capacity collapse
        # into the last slot (silent feature corruption) — surface the count
        # so callers can alert instead of training on corrupted pools.
        self.sow("intermediates", "pool_overflow",
                 jnp.maximum(n_clusters - cap, 0),
                 reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.int32(0))
        new_valid = jnp.arange(cap, dtype=jnp.int32) < n_kept
        # next level's codes = this level's codes at cluster heads, shifted
        # (reference: models/pt_v3.py:1005-1016)
        new_codes = codes[:, head_orig[:cap]] >> (pdepth * 3)
        new_codes = jnp.where(new_valid[None, :], new_codes,
                              ser.INVALID_CODE)
        new_order = jnp.argsort(new_codes, axis=1, stable=True).astype(jnp.int32)
        ar = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32),
                              new_codes.shape)
        new_inverse = jnp.zeros_like(new_order).at[
            jnp.arange(new_codes.shape[0])[:, None], new_order].set(ar)

        pooled = pooled[:cap]
        new_coord = new_coord[:cap]
        new_grid = new_grid[:cap]
        cluster = jnp.minimum(cluster, cap - 1)

        pooled = MaskedBatchNorm(name="norm", dtype=self.dtype,
                                 axis_name=self.axis_name)(
            pooled, new_valid, train)
        pooled = gelu(pooled)
        return dict(
            feat=pooled, coord=new_coord, grid_coord=new_grid,
            codes=new_codes, order=new_order, inverse=new_inverse,
            valid=new_valid, count=n_kept, cluster=cluster,
        )


class SerializedUnpooling(nn.Module):
    """parent.feat = proj_skip(parent) + proj(child)[cluster]
    (reference: models/pt_v3.py:1066-1101)."""

    out_channels: int
    dtype: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, child_feat, parent_feat, cluster, parent_valid,
                 child_valid, train: bool):
        x = TorchDense(self.out_channels, name="proj",
                       dtype=self.dtype)(child_feat)
        x = MaskedBatchNorm(name="proj_norm", dtype=self.dtype,
                            axis_name=self.axis_name)(
            x, child_valid, train)
        x = gelu(x)
        skip = TorchDense(self.out_channels, name="proj_skip",
                          dtype=self.dtype)(parent_feat)
        skip = MaskedBatchNorm(name="proj_skip_norm", dtype=self.dtype,
                               axis_name=self.axis_name)(
            skip, parent_valid, train)
        skip = gelu(skip)
        return skip + x[cluster]


# ---------------------------------------------------------------------------
# Full backbone
# ---------------------------------------------------------------------------


class PTv3Single(nn.Module):
    """Single-sample PTv3 over padded [N, ...] arrays."""

    cfg: PTv3Config
    in_channels: int
    grid_size: float = 0.01
    serial_depth: int = 10
    drop_path: float = 0.3
    dtype: Optional[Any] = None
    axis_name: Optional[str] = None  # batch axis for cross-sample BN stats

    @nn.compact
    def __call__(self, feat, coord, valid, train: bool = False):
        cfg = self.cfg
        orders = tuple(cfg.order)
        N = feat.shape[0]
        n_stages = len(cfg.enc_depths)

        grid_coord, codes, order, inverse = ser.serialize(
            coord, valid, self.grid_size, orders, self.serial_depth)
        count = jnp.sum(valid.astype(jnp.int32))

        def maybe_shuffle(codes_, order_, inverse_):
            """Per-forward random permutation of the serialization orders
            (reference models/pt_v3.py:1024-1030; re-applied after every
            pooling there too, pt_v3.py:437-444).  Active only when the
            caller provides a "shuffle" rng; identity for one order."""
            if (not cfg.shuffle_orders or len(orders) < 2
                    or not self.has_rng("shuffle")):
                return codes_, order_, inverse_
            perm = jax.random.permutation(self.make_rng("shuffle"),
                                          codes_.shape[0])
            return codes_[perm], order_[perm], inverse_[perm]

        codes, order, inverse = maybe_shuffle(codes, order, inverse)

        def make_nbrs(gc, vd, k):
            """Neighbor indices for a SubMConv: dense voxel-map path
            (default) or the sorted merge; the dense path's out-of-extent
            count is sown into the PTv3 diagnostics (summed into the
            trainer's PTv3PoolOverflow metric alongside the pooling
            counters)."""
            if cfg.dense_nbr_extent > 0:
                nb, fnd, ovf = subm_neighbors_dense(
                    gc, vd, k, self.serial_depth, cfg.dense_nbr_extent)
                self.sow("intermediates", "nbr_overflow", ovf)
                return nb, fnd
            return subm_neighbors(gc, vd, k, self.serial_depth)

        # stem: SubMConv k5 -> BN -> GELU (models/pt_v3.py:1104-1134)
        x = SubMConv(cfg.enc_channels[0], 5, name="embedding_stem",
                     dtype=self.dtype, remat=cfg.remat)(
            feat, grid_coord, valid, neighbors=make_nbrs(grid_coord,
                                                         valid, 5))
        x = MaskedBatchNorm(name="embedding_norm", dtype=self.dtype,
                            axis_name=self.axis_name)(x, valid, train)
        x = gelu(x)

        # stochastic-depth schedule (models/pt_v3.py:1226-1229)
        total_e = sum(cfg.enc_depths)
        enc_dp = [self.drop_path * i / max(total_e - 1, 1)
                  for i in range(total_e)]

        levels = []  # saved (feat, state) per stage for the decoder
        state = dict(feat=x, coord=coord, grid_coord=grid_coord, codes=codes,
                     order=order, inverse=inverse, valid=valid, count=count)
        # CPE neighbor indices: one sort+search per stage, shared by every
        # block of the stage (and by the mirror decoder stage below)
        if cfg.enable_cpe:
            state["nbrs"] = make_nbrs(grid_coord, valid, 3)

        di = 0
        for s in range(n_stages):
            if s > 0:
                cap = max(N // (cfg.pool_capacity_divisor ** s),
                          min(cfg.enc_patch_size[s], N))
                # attention requires the stage's point capacity to divide
                # into whole patches; round UP (extra padded slots are
                # masked) so non-power-of-two N (e.g. a 24576 budget with
                # patch 1024 -> stage cap 1536) works
                patch_s = min(cfg.enc_patch_size[s], cap)
                cap = -(-cap // patch_s) * patch_s
                pooled = SerializedPooling(
                    cfg.enc_channels[s], cfg.stride[s - 1], cap,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"enc{s}_down",
                )(state["feat"], state["coord"], state["grid_coord"],
                  state["codes"], state["order"], state["valid"],
                  state["count"], self.grid_size, orders, self.serial_depth,
                  train)
                cluster = pooled.pop("cluster")
                levels.append((state, cluster))
                state = pooled
                (state["codes"], state["order"],
                 state["inverse"]) = maybe_shuffle(
                    state["codes"], state["order"], state["inverse"])
                if cfg.enable_cpe:
                    state["nbrs"] = make_nbrs(state["grid_coord"],
                                              state["valid"], 3)
            orders_data = [(state["order"][i], state["inverse"][i])
                           for i in range(len(orders))]
            for b in range(cfg.enc_depths[s]):
                state["feat"] = PTBlock(
                    channels=cfg.enc_channels[s],
                    num_heads=cfg.enc_n_head[s],
                    patch_size=min(cfg.enc_patch_size[s],
                                   state["feat"].shape[0]),
                    mlp_ratio=self.cfg.mlp_ratio,
                    order_index=b % len(orders),
                    drop_path=enc_dp[di],
                    enable_cpe=cfg.enable_cpe,
                    enable_rpe=cfg.enable_rpe,
                    dtype=self.dtype,
                    remat=cfg.remat,
                    name=f"enc{s}_block{b}",
                )(state["feat"], state["grid_coord"], state["valid"],
                  orders_data, state["count"], train,
                  neighbors=state.get("nbrs"))
                di += 1

        # decoder
        total_d = sum(cfg.dec_depths)
        dec_dp_all = [self.drop_path * i / max(total_d - 1, 1)
                      for i in range(total_d)]
        dec_channels = list(cfg.dec_channels) + [cfg.enc_channels[-1]]
        for s in reversed(range(n_stages - 1)):
            parent_state, cluster = levels[s]
            up = SerializedUnpooling(dec_channels[s], dtype=self.dtype,
                                     axis_name=self.axis_name,
                                     name=f"dec{s}_up")(
                state["feat"], parent_state["feat"], cluster,
                parent_state["valid"], state["valid"], train)
            state = dict(parent_state)
            state["feat"] = up
            orders_data = [(state["order"][i], state["inverse"][i])
                           for i in range(len(orders))]
            dp_slice = dec_dp_all[
                sum(cfg.dec_depths[:s]): sum(cfg.dec_depths[:s + 1])][::-1]
            for b in range(cfg.dec_depths[s]):
                state["feat"] = PTBlock(
                    channels=dec_channels[s],
                    num_heads=cfg.dec_n_head[s],
                    patch_size=min(cfg.dec_patch_size[s],
                                   state["feat"].shape[0]),
                    mlp_ratio=self.cfg.mlp_ratio,
                    order_index=b % len(orders),
                    drop_path=dp_slice[b],
                    enable_cpe=cfg.enable_cpe,
                    enable_rpe=cfg.enable_rpe,
                    dtype=self.dtype,
                    remat=cfg.remat,
                    name=f"dec{s}_block{b}",
                )(state["feat"], state["grid_coord"], state["valid"],
                  orders_data, state["count"], train,
                  neighbors=state.get("nbrs"))

        return state["feat"]


class PointTransformerV3(nn.Module):
    """Batched wrapper: vmap of PTv3Single over the batch axis
    (reference: models/pt_v3.py:1320-1344 — the squeeze(0)/unsqueeze(0)
    there shows the reference is also effectively single-sample)."""

    cfg: PTv3Config
    in_channels: int
    grid_size: float = 0.01
    serial_depth: int = 10
    drop_path: float = 0.3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feat, coord, valid=None, train: bool = False):
        B, N = feat.shape[:2]
        if valid is None:
            valid = jnp.ones((B, N), dtype=bool)
        inner = nn.vmap(
            PTv3Single,
            in_axes=(0, 0, 0, None),
            out_axes=0,
            variable_axes={"params": None, "batch_stats": None,
                           "intermediates": 0},
            split_rngs={"params": False, "droppath": True, "shuffle": True},
            axis_name="ptv3_batch",
        )(cfg=self.cfg, in_channels=self.in_channels,
          grid_size=self.grid_size, serial_depth=self.serial_depth,
          drop_path=self.drop_path, dtype=self.dtype,
          axis_name="ptv3_batch", name="net")
        return inner(feat, coord, valid, train)
