# -*- coding: utf-8 -*-
"""In-situ bisect of blend.scatter_packed_grads at the REAL headline
scene (bench.py build_scene + headline_cfg): machinery (page compaction)
vs the final reduction, and reducer variants.

The isolated microbench (bench_gradscatter.py) says the reduction alone
is ~1-2 ms while the in-situ stage reads 4.85 — this pins the other
~3 ms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import numpy as np
from _bench_util import chain_time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, REPO)
    import bench as bench_mod

    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.ops import hash_grid_bwd
    from gaussiancity_tpu.ops.rasterizer import (binning, blend,
                                                 blend_pallas, preprocess)

    W, H = 640, 448
    f = 400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(np.zeros(3), np.array([0, 0, 0, 1.0]))
    backend = "pallas"
    cfg = bench_mod.headline_cfg(backend)
    means3d, opacity, scales, quats, colors = map(
        jnp.asarray, bench_mod.build_scene())
    valid = jnp.ones((means3d.shape[0],), bool)
    N = means3d.shape[0]

    prep = jax.jit(lambda m: preprocess.preprocess(
        m, opacity, scales, quats, colors, valid, cam,
        near_z=cfg.near_z))(means3d)
    bins = jax.jit(lambda p: binning.bin_gaussians(
        p, H, W, cfg.tile_h, cfg.tile_w, cfg.max_tiles_per_gaussian,
        cfg.tile_capacity, tiers=cfg.bin_tiers,
        visible_cap=cfg.visible_cap, gate16=cfg.ref_tile16_gate))(prep)
    n_ty, n_tx = binning.tile_grid(H, W, cfg.tile_h, cfg.tile_w)
    consts = blend.BlendConsts(
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
        unroll=cfg.chunk, backend=backend, n_tx=n_tx,
        ref_gate=cfg.ref_tile16_gate)
    page = blend_pallas.default_page()
    attrs_paged = jax.jit(lambda p, i: blend._gather_pack(
        p.attrs16(), i, page))(prep, bins.gauss_index)
    counts = bins.counts
    _, final_T, n_contrib = jax.jit(
        lambda a: blend_pallas.blend_tiles_pallas_fwd(consts, n_tx, a,
                                                      counts))(attrs_paged)
    k_hi0 = blend._k_hi(counts.astype(jnp.float32), n_contrib,
                        cfg.grad_capacity, cfg.tile_capacity)
    idx = bins.gauss_index
    Kcap = cfg.tile_capacity
    grad_budget, grad_capacity = cfg.grad_budget, cfg.grad_capacity

    def tsum(x):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(x)
                   if hasattr(l, "dtype"))

    def machinery(grads, k_hi):
        """The page-compaction front half of scatter_packed_grads."""
        T_tiles, NC, R, pg = grads.shape
        Kk = NC * pg
        BP = grad_budget // pg
        pages_t = -(-k_hi // pg)
        poff = jnp.cumsum(pages_t) - pages_t
        total_p = poff[-1] + pages_t[-1]
        marks = jnp.zeros((BP,), jnp.int32).at[poff[1:]].add(1, mode="drop")
        p = jnp.arange(BP, dtype=jnp.int32)
        t_of_p = jnp.cumsum(marks)
        q_of_p = p - poff.at[t_of_p].get(mode="promise_in_bounds")
        vpage = p < total_p
        t_c = jnp.where(vpage, t_of_p, 0)
        q_c = jnp.where(vpage, q_of_p, 0)
        row0 = t_c * Kk + q_c * pg
        g_flat = grads.transpose(0, 1, 3, 2).reshape(T_tiles * Kk, R)
        g_pages = jax.vmap(lambda s: jax.lax.dynamic_slice(
            g_flat, (s, 0), (pg, R)))(row0)
        i_pages = jax.vmap(lambda s: jax.lax.dynamic_slice(
            idx.reshape(-1), (s,), (pg,)))(row0)
        khi_c = k_hi.at[t_c].get(mode="promise_in_bounds")
        rvalid = vpage[:, None] & (
            q_c[:, None] * pg + jnp.arange(pg)[None, :] < khi_c[:, None])
        rows = jnp.where(rvalid[..., None], g_pages, 0.0).reshape(-1, R)
        keys = jnp.where(rvalid, i_pages, N).reshape(-1)
        return rows, keys

    def sec(name, fn):
        try:
            ms = [chain_time(fn, (attrs_paged, k_hi0), repeats=4)
                  for _ in range(2)]
            print(f"{name:30s} {min(ms):7.3f} ms "
                  f"(runs {[round(m, 2) for m in ms]})", flush=True)
        except Exception as e:
            print(f"{name:30s} FAIL {repr(e)[:160]}", flush=True)

    sec("full_current", lambda a, eps: tsum(blend.scatter_packed_grads(
        grad_capacity, grad_budget, N, a[0] + eps, idx,
        jnp.minimum(a[1] + eps.astype(jnp.int32), Kcap))))

    def mach_only(a, eps):
        rows, keys = machinery(a[0] + eps,
                               jnp.minimum(a[1] + eps.astype(jnp.int32),
                                           Kcap))
        return tsum(rows) + tsum(keys)

    sec("machinery_only", mach_only)

    # transpose alone
    sec("transpose_reshape_only", lambda a, eps: tsum(
        (a[0] + eps).transpose(0, 1, 3, 2).reshape(-1, 16)))

    def full_sized(tr, u):
        def fn(a, eps):
            rows, keys = machinery(
                a[0] + eps, jnp.minimum(a[1] + eps.astype(jnp.int32), Kcap))
            M = keys.shape[0]
            return tsum(hash_grid_bwd.hash_grad_embeddings(
                keys.reshape(1, 1, M), jnp.ones((1, 1, M), jnp.float32),
                rows[None], n_rows=N, tile_sizes=(tr, u))[0])
        return fn

    for tr, u in ((512, 1024), (512, 2048)):
        sec(f"full_mxu_tr{tr}_u{u}", full_sized(tr, u))

    def full_csum(a, eps):
        rows, keys = machinery(
            a[0] + eps, jnp.minimum(a[1] + eps.astype(jnp.int32), Kcap))
        M = keys.shape[0]
        R = rows.shape[1]
        pos = jnp.arange(M, dtype=jnp.int32)
        sk, sp = jax.lax.sort((keys, pos), num_keys=1, is_stable=False)
        rs = rows[sp]
        csum = jnp.concatenate(
            [jnp.zeros((1, R), jnp.float32), jnp.cumsum(rs, axis=0)])
        q = jnp.arange(N + 1, dtype=jnp.int32)
        mk = jnp.concatenate([sk * 2, q * 2 - 1])
        ident = jnp.arange(M + N + 1, dtype=jnp.int32)
        _, sid = jax.lax.sort((mk, ident), num_keys=1, is_stable=True)
        is_key = (sid < M).astype(jnp.int32)
        keys_before = jnp.cumsum(is_key)
        _, startv = jax.lax.sort((is_key, keys_before), num_keys=1,
                                 is_stable=True)
        start = startv[: N + 1]
        return tsum(csum[start[1:]] - csum[start[:-1]])

    sec("full_csum_merge", full_csum)


if __name__ == "__main__":
    main()
