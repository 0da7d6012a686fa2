# -*- coding: utf-8 -*-
"""On-chip breakdown of bin_gaussians' internal stages (round 4).

binning is the largest rasterizer stage of the headline bench (3.11 ms of
the ~13.3 ms fwd+bwd step in BENCH_r03) — this probes where it goes:
depth argsort + rank inversion, area argsort, tier expansion gathers,
the pair sort, boundary search, and the slot-list dynamic_slice.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from _bench_util import chain_time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from bench import build_scene, headline_cfg
    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.ops.rasterizer import binning, preprocess

    W, H = 640, 448
    f = 400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(np.zeros(3), np.array([0, 0, 0, 1.0]))
    cfg = headline_cfg("pallas")
    means3d, opacity, scales, quats, colors = map(jnp.asarray, build_scene())
    valid = jnp.ones((means3d.shape[0],), bool)
    prep = jax.jit(lambda m: preprocess.preprocess(
        m, opacity, scales, quats, colors, valid, cam,
        near_z=cfg.near_z))(means3d)
    jax.block_until_ready(prep)
    N = means3d.shape[0]

    depth = prep.depth
    mx, my = prep.mx, prep.my
    x_min, y_min, x_max, y_max, area, vmask = jax.jit(
        lambda a, b: binning.compute_rects_c(
            a, b, prep.radius, prep.valid, H, W, cfg.tile_h, cfg.tile_w,
            gate16=cfg.ref_tile16_gate))(mx, my)
    rect_w = x_max - x_min
    jax.block_until_ready((area, rect_w))

    def t(name, fn, args):
        ms = chain_time(fn, args, repeats=3)
        print(f"{name:32s} {max(ms, 0.0):8.3f} ms", flush=True)

    # 1. full binning (reference point)
    t("bin_gaussians (total)", lambda a, eps: jnp.sum(sum(
        jnp.sum(l.astype(jnp.float32)) for l in binning.bin_gaussians(
            a[0]._replace(mx=a[0].mx + eps), H, W, cfg.tile_h, cfg.tile_w,
            cfg.max_tiles_per_gaussian, cfg.tile_capacity,
            tiers=cfg.bin_tiers, visible_cap=cfg.visible_cap,
            gate16=cfg.ref_tile16_gate))), (prep,))

    # 2. depth argsort alone
    t("argsort(depth)", lambda a, eps: jnp.sum(
        jnp.argsort(a[0] + eps).astype(jnp.float32)), (depth,))

    # 3. rank via scatter (current code)
    def rank_scatter(a, eps):
        order = jnp.argsort(a[0] + eps, stable=True).astype(jnp.int32)
        rank = jnp.zeros((N,), jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32))
        return jnp.sum(rank.astype(jnp.float32))
    t("rank: argsort + scatter", rank_scatter, (depth,))

    # 4. rank via second sort (candidate)
    def rank_sort(a, eps):
        order = jnp.argsort(a[0] + eps, stable=True).astype(jnp.int32)
        _, rank = jax.lax.sort(
            (order, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return jnp.sum(rank.astype(jnp.float32))
    t("rank: argsort + sort-inverse", rank_sort, (depth,))

    # 5. area argsort
    t("argsort(-area)", lambda a, eps: jnp.sum(
        jnp.argsort(-(a[0] + eps.astype(jnp.int32))).astype(jnp.float32)),
      (area,))

    # 6. the pair sort alone at the real pair count
    tiers = binning.normalize_tiers(cfg.bin_tiers, N, 280)
    n_pairs = N * cfg.max_tiles_per_gaussian + sum(
        c * (t_ or 280) for c, t_ in tiers)
    print(f"pair rows: {n_pairs}")
    keys = jax.random.randint(jax.random.PRNGKey(0), (n_pairs,), 0,
                              2 ** 25, dtype=jnp.int32)
    payload = jnp.arange(n_pairs, dtype=jnp.int32)

    def pair_sort(a, eps):
        k, p = jax.lax.sort((a[0] + eps.astype(jnp.int32), a[1]),
                            num_keys=1)
        return jnp.sum(k.astype(jnp.float32)) + jnp.sum(p.astype(jnp.float32))
    t("pair sort (1 payload)", pair_sort, (keys, payload))

    def pair_sort0(a, eps):
        (k,) = jax.lax.sort((a[0] + eps.astype(jnp.int32),), num_keys=1)
        return jnp.sum(k.astype(jnp.float32))
    t("pair sort (no payload)", pair_sort0, (keys, payload))

    # 7. expansion + concat (everything before the pair sort)
    def pre_sort(a, eps):
        p = a[0]._replace(mx=a[0].mx + eps)
        mxx = jax.lax.stop_gradient(p.mx)
        myy = jax.lax.stop_gradient(p.my)
        x_min, y_min, x_max, y_max, area, vmask = binning.compute_rects_c(
            mxx, myy, p.radius, p.valid, H, W, cfg.tile_h, cfg.tile_w,
            gate16=cfg.ref_tile16_gate)
        ranked = jnp.argsort(-area, stable=True).astype(jnp.int32)
        acc = jnp.float32(0.0)
        rect_w = x_max - x_min
        bounds = [c for c, _ in tiers] + [0]
        for ti, (count, cap) in enumerate(tiers):
            lo, hi = bounds[ti + 1], count
            sl = ranked[lo:hi]
            tid_t, pv = binning._expand_pairs(
                x_min[sl], y_min[sl], rect_w[sl], area[sl], vmask[sl],
                5, 281, cap or 280)
            acc += jnp.sum(tid_t.astype(jnp.float32))
        tid, pv = binning._expand_pairs(
            x_min, y_min, rect_w, area, vmask, 5, 281,
            cfg.max_tiles_per_gaussian)
        return acc + jnp.sum(tid.astype(jnp.float32))
    t("expansion (tiers + main)", pre_sort, (prep,))

    # 8. searchsorted boundaries + slot dynamic_slice on sorted pairs
    tile_s = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(1), (n_pairs,), 0, 280, dtype=jnp.int32))
    idx_s = jnp.arange(n_pairs, dtype=jnp.int32) % N
    Kcap = cfg.tile_capacity

    def tail(a, eps):
        ts, ix = a[0] + eps.astype(jnp.int32), a[1]
        tids = jnp.arange(281, dtype=jnp.int32)
        bounds = jnp.searchsorted(ts, tids, side="left").astype(jnp.int32)
        starts = bounds[:-1]
        counts = jnp.minimum(bounds[1:] - starts, Kcap)
        k = jnp.arange(Kcap, dtype=jnp.int32)
        kmask = k[None, :] < counts[:, None]
        idx_pad = jnp.concatenate([ix, jnp.zeros((Kcap,), jnp.int32)])
        gi = jax.vmap(
            lambda s: jax.lax.dynamic_slice(idx_pad, (s,), (Kcap,)))(starts)
        return jnp.sum(jnp.where(kmask, gi, 0).astype(jnp.float32))
    t("bounds + slot slices", tail, (tile_s, idx_s))


if __name__ == "__main__":
    main()
