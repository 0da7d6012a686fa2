# -*- coding: utf-8 -*-
"""Measure the ref_tile16_gate's cost in the blend kernels (VERDICT r4
item 4: the r3->r4 REST step regression 227.9 -> 234.6 ms coincided with
the gate becoming default).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_refgate.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from _bench_util import chain_time


def main():
    sys.path.insert(0, "/root/repo")
    import bench as B

    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.ops.rasterizer import (binning, blend,
                                                 blend_pallas, preprocess)

    W, H = 640, 448
    f = 400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(np.zeros(3), np.array([0, 0, 0, 1.0]))
    cfg0 = B.headline_cfg("pallas")
    means3d, opacity, scales, quats, colors = map(jnp.asarray,
                                                  B.build_scene())
    valid = jnp.ones((means3d.shape[0],), bool)
    prep = jax.jit(lambda m: preprocess.preprocess(
        m, opacity, scales, quats, colors, valid, cam,
        near_z=cfg0.near_z))(means3d)

    for gate in (False, True):
        cfg = cfg0.replace(ref_tile16_gate=gate)
        bins = jax.jit(lambda p: binning.bin_gaussians(
            p, H, W, cfg.tile_h, cfg.tile_w, cfg.max_tiles_per_gaussian,
            cfg.tile_capacity, tiers=cfg.bin_tiers,
            visible_cap=cfg.visible_cap, gate16=cfg.ref_tile16_gate))(prep)
        n_ty, n_tx = binning.tile_grid(H, W, cfg.tile_h, cfg.tile_w)
        consts = blend.BlendConsts(
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, alpha_min=cfg.alpha_min,
            alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
            unroll=cfg.chunk, backend="pallas", n_tx=n_tx,
            ref_gate=cfg.ref_tile16_gate)
        page = blend_pallas.default_page()
        attrs_paged = jax.jit(lambda p, i: blend._gather_pack(
            p.attrs16(), i, page))(prep, bins.gauss_index)
        counts = bins.counts
        _, final_T, n_contrib = jax.jit(
            lambda a: blend_pallas.blend_tiles_pallas_fwd(
                consts, n_tx, a, counts))(attrs_paged)
        g_out = jnp.ones(final_T.shape + (3,), jnp.float32)
        bgg = jnp.zeros(final_T.shape, jnp.float32)

        def tsum(x):
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(x)
                       if hasattr(l, "dtype"))

        t_f = chain_time(
            lambda a, eps: tsum(blend_pallas.blend_tiles_pallas_fwd(
                consts, n_tx, a[0] + eps, a[1])), (attrs_paged, counts),
            repeats=2)
        t_b = chain_time(
            lambda a, eps: tsum(blend_pallas.blend_tiles_pallas_bwd(
                consts, n_tx, a[0] + eps, counts, a[1] + eps, bgg, a[2],
                n_contrib)), (attrs_paged, g_out.transpose(0, 3, 1, 2),
                              final_T), repeats=2)
        t_bin = chain_time(
            lambda a, eps: tsum(binning.bin_gaussians(
                a[0]._replace(mx=a[0].mx + eps), H, W, cfg.tile_h,
                cfg.tile_w, cfg.max_tiles_per_gaussian, cfg.tile_capacity,
                tiers=cfg.bin_tiers, visible_cap=cfg.visible_cap,
                gate16=cfg.ref_tile16_gate)), (prep,), repeats=2)
        print(f"gate={gate}: blend fwd {t_f:.3f} ms | bwd {t_b:.3f} ms | "
              f"binning {t_bin:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
