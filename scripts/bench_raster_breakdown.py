# -*- coding: utf-8 -*-
"""Per-stage rasterizer breakdown on the real chip (VERDICT r2 item 10).

Times each pipeline stage of the headline bench scene (65k Gaussians,
640x448) with the chained-fori methodology (scripts/_bench_util.chain_time)
so the axon tunnel cannot under-report:

  preprocess -> binning (pair sort + ranges) -> slot gather/pack ->
  blend fwd (Pallas) -> blend bwd (Pallas) -> grad scatter (gather
  transpose) -> full fwd -> full fwd+bwd

Every stage consumes its FULL output (sum) so XLA cannot DCE-shrink
gathers, and the eps chain perturbs the stage's real inputs so
index-producing machinery cannot be hoisted out of the timing loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_raster_breakdown.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from scripts._bench_util import chain_time  # noqa: E402


def tree_sum(x):
    import jax
    import jax.numpy as jnp

    leaves = [jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return sum(leaves)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as bench_mod
    import numpy as np
    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.config import RasterizerConfig
    from gaussiancity_tpu.ops.rasterizer import (api, binning, blend,
                                                 blend_pallas, preprocess)

    W, H = 640, 448
    f = 400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(np.zeros(3), np.array([0, 0, 0, 1.0]))
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterizerConfig(tile_capacity=1536, max_tiles_per_gaussian=4,
                           grad_capacity=1024, backend=backend)
    scene = tuple(map(jnp.asarray, bench_mod.build_scene()))
    means3d, opacity, scales, quats, colors = scene
    N = means3d.shape[0]
    valid = jnp.ones((N,), bool)
    bg = jnp.zeros((3,), jnp.float32)

    res = {}

    def section(name, fn):
        try:
            res[name] = round(fn(), 3)
        except Exception as e:
            res[name] = repr(e)[:160]
        print(f"{name:26s} {res[name]}", flush=True)

    # --- stage inputs (computed once) ---
    prep = jax.jit(lambda m: preprocess.preprocess(
        m, opacity, scales, quats, colors, valid, cam, near_z=cfg.near_z)
    )(means3d)
    bins = jax.jit(lambda p: binning.bin_gaussians(
        p, H, W, cfg.tile_h, cfg.tile_w, cfg.max_tiles_per_gaussian,
        cfg.tile_capacity, tiers=cfg.bin_tiers))(prep)
    n_ty, n_tx = binning.tile_grid(H, W, cfg.tile_h, cfg.tile_w)
    consts = blend.BlendConsts(
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max, t_eps=cfg.transmittance_eps,
        unroll=cfg.chunk, backend=backend, n_tx=n_tx)
    page = cfg.page or blend_pallas.default_page()
    T_tiles, Kcap = bins.gauss_index.shape

    def gather_pack(p, idx):
        attrs = p.attrs16()
        g = attrs.at[idx.reshape(-1)].get(mode="promise_in_bounds")
        return g.reshape(T_tiles, Kcap // page, page, 16).transpose(0, 1, 3, 2)

    attrs_paged = jax.jit(gather_pack)(prep, bins.gauss_index)
    counts = bins.counts
    C, final_T, n_contrib = jax.jit(
        lambda a: blend_pallas.blend_tiles_pallas_fwd(consts, n_tx, a, counts)
    )(attrs_paged)
    g_out = jnp.ones((T_tiles, 3, cfg.tile_h, cfg.tile_w), jnp.float32)
    bg_dot_g = jnp.zeros((T_tiles, cfg.tile_h, cfg.tile_w), jnp.float32)

    # pair stats for context
    print("counts: max", int(counts.max()), "sum", int(counts.sum()),
          "dropped", int(bins.n_dropped_pairs),
          "truncated", int(bins.n_truncated), flush=True)

    # --- stage timings ---
    section("preprocess_ms", lambda: chain_time(
        lambda a, eps: tree_sum(preprocess.preprocess(
            a[0] + eps, opacity, scales, quats, colors, valid, cam,
            near_z=cfg.near_z)),
        (means3d,)))

    section("binning_ms", lambda: chain_time(
        lambda a, eps: tree_sum(binning.bin_gaussians(
            a[0]._replace(mx=a[0].mx + eps), H, W, cfg.tile_h, cfg.tile_w,
            cfg.max_tiles_per_gaussian, cfg.tile_capacity,
            tiers=cfg.bin_tiers)),
        (prep,)))

    section("gather_pack_ms", lambda: chain_time(
        lambda a, eps: tree_sum(gather_pack(
            a[0]._replace(mx=a[0].mx + eps),
            # eps-dependent index shift (0 at runtime, opaque to XLA)
            jnp.minimum(a[1] + eps.astype(jnp.int32), N - 1))),
        (prep, bins.gauss_index)))

    section("blend_fwd_ms", lambda: chain_time(
        lambda a, eps: tree_sum(blend_pallas.blend_tiles_pallas_fwd(
            consts, n_tx, a[0] + eps, a[1])),
        (attrs_paged, counts)))

    section("blend_bwd_ms", lambda: chain_time(
        lambda a, eps: tree_sum(blend_pallas.blend_tiles_pallas_bwd(
            consts, n_tx, a[0] + eps, counts, a[1] + eps, bg_dot_g,
            a[2], n_contrib)),
        (attrs_paged, g_out, final_T)))

    # gather transpose: [T*K,16] grads scattered back to [N,16]
    grads_flat = jnp.ones((T_tiles * Kcap, 16), jnp.float32)

    def grad_scatter(g, idx):
        return jnp.zeros((N, 16), jnp.float32).at[idx.reshape(-1)].add(
            g, mode="promise_in_bounds")

    section("grad_scatter_ms", lambda: chain_time(
        lambda a, eps: tree_sum(grad_scatter(
            a[0] + eps, jnp.minimum(a[1] + eps.astype(jnp.int32), N - 1))),
        (grads_flat, bins.gauss_index)))

    section("full_fwd_ms", lambda: chain_time(
        lambda a, eps: tree_sum(api.rasterize(
            a[0] + eps, opacity, scales, quats, colors, cam, cfg,
            valid, bg).image),
        (means3d,)))

    def loss(m, o, s, q, c):
        out = api.rasterize(m, o, s, q, c, cam, cfg, valid, bg)
        return jnp.sum(out.image ** 2)

    gfn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    section("full_fwd_bwd_ms", lambda: chain_time(
        lambda a, eps: tree_sum(gfn(a[0] + eps, opacity, scales, quats,
                                    colors)),
        (means3d,)))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
