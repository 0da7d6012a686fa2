# -*- coding: utf-8 -*-
"""Per-model attrs timing inside the e2e inference frame (round 4).

Times predict_attrs_single for REST (196k slab) and BLDG (PTv3+z, 65k
slab) plus the raster stage, with plain per-call dispatch + host fetch
(the e2e frame path is per-call jit dispatch, so this is the honest
per-frame accounting; chain_time hides host/dispatch but also cannot
represent the frame loop).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from bench import bench_frame_e2e  # reuse its setup via direct code
    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.inference.pipeline import (
        InferencePipeline, get_orbit_camera_poses, get_style_lut,
        select_nearest_rows)
    from gaussiancity_tpu.models import Generator

    cfg = cfg_mod.rest_recipe()
    cfg = cfg.replace(
        dataset=cfg.dataset.replace(proj_size=512, map_size=512),
        rasterizer=cfg.rasterizer.replace(
            backend="pallas" if jax.default_backend() == "tpu" else "xla",
            tile_capacity=2048, max_tiles_per_gaussian=4),
    )
    P = cfg.dataset.proj_size
    budgets = {"REST": 196608, "BLDG": 65536}

    def init_gen(net_cfg, seed, z_dim):
        gen = Generator(cfg=net_cfg, n_classes=cfg.dataset.n_classes,
                        proj_size=P)
        n = 1024
        variables = jax.jit(gen.init)(
            jax.random.PRNGKey(seed), jnp.zeros((1, n, 2)),
            jnp.zeros((1, n, 3)), None,
            jnp.zeros((1, n, cfg.dataset.n_classes)),
            jnp.zeros((1, n, z_dim)) if z_dim else None,
            jnp.zeros((1, P, P, 1)),
            jnp.zeros((1, P, P, cfg.dataset.n_classes)),
            jnp.ones((1, n), bool))
        return gen, dict(variables)

    rest_gen, rest_params = init_gen(cfg.network, 0, None)
    bldg_cfg = cfg_mod.bldg_recipe().network
    bldg_gen, bldg_params = init_gen(bldg_cfg, 1, bldg_cfg.z_dim)
    pipe = InferencePipeline(
        cfg, {"REST": (rest_gen, rest_params),
              "BLDG": (bldg_gen, bldg_params)},
        max_points=sum(budgets.values()), class_budgets=budgets)

    rng = np.random.default_rng(0)
    ins = np.ones((P, P), np.int16)
    td = np.full((P, P), 2, np.int16)
    for bi in range(48):
        x, y = rng.integers(16, P - 48, 2)
        w, h = rng.integers(12, 40, 2)
        ins[y:y + h, x:x + w] = 100 + 2 * bi
        td[y:y + h, x:x + w] = rng.integers(20, 120)
    seg = np.where(ins >= 100, 2, ins).astype(np.int16)
    projections = {"REST": {
        "INS": ins, "SEG": seg, "TD_HF": td,
        "BU_HF": np.zeros((P, P), np.int16),
        "PTS": np.ones((P, P), bool)}}
    centers = {}
    for iid in np.unique(ins):
        ys, xs = np.nonzero(ins == iid)
        centers[int(iid)] = (float(xs.mean()), float(ys.mean()),
                             float(np.ptp(xs) + 1), float(np.ptp(ys) + 1),
                             float(td[ys, xs].max()))
        centers[int(iid) + 1] = centers[int(iid)]
    poses = get_orbit_camera_poses(P, n_points=4, radius=220, altitude=260)
    lut = jnp.asarray(get_style_lut(centers, bldg_cfg.z_dim or 1, seed=0))

    points_all = pipe.build_points(projections, 0)
    proj_hf = jnp.asarray(projections["REST"]["TD_HF"], jnp.float32)[..., None]
    proj_seg = jnp.asarray(np.stack(
        [(seg == i) for i in range(cfg.dataset.n_classes)], -1
    ).astype(np.float32))
    frame_fn = pipe.get_frame_fn_compact()

    pose = poses[1]
    cam_pos = np.array([pose["tx"], pose["ty"], pose["tz"]], np.float32)
    cam_quat = np.array([pose["qx"], pose["qy"], pose["qz"], pose["qw"]],
                        np.float32)
    vis_pts, road = pipe.visible_points(points_all, cam_pos.copy(), cam_quat)
    pts9 = pipe.normalize_points(vis_pts, centers)
    masks = pipe.host_class_split(pts9)
    buckets = {}
    for name in pipe.models:
        rows, _ = select_nearest_rows(pts9[masks[name]], cam_pos,
                                      budgets[name])
        buckets[name] = pipe._device_bucket(rows, budgets[name], name)
        print(f"{name}: slab {buckets[name][0].shape[0]} "
              f"(n={buckets[name][1]})", flush=True)

    params_map = {name: p for name, (_, p) in pipe.models.items()}
    attrs_fns = pipe._class_frame_fns

    def timeit(name, f, reps=5):
        r = f(0)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(reps):
            r = f(i)
            jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:24s} {dt:8.1f} ms", flush=True)
        return r

    gs = {}
    for name in pipe.models:
        pts9_c, n_c = buckets[name]
        mask_c = jnp.arange(pts9_c.shape[0]) < jnp.asarray(n_c, jnp.int32)

        def call(i, name=name, pts9_c=pts9_c, mask_c=mask_c):
            # vary an input each rep so no caching of the whole result
            return attrs_fns[name](
                params_map[name], pts9_c + jnp.float32(i) * 0.0, mask_c,
                proj_hf, proj_seg, None, lut)
        gs[name] = timeit(f"attrs[{name}]", call)

    gs_cat = jnp.concatenate([gs[n] for n in pipe.models], axis=0)
    mask_cat = jnp.concatenate([
        jnp.arange(buckets[n][0].shape[0]) < jnp.asarray(buckets[n][1])
        for n in pipe.models], axis=0)
    raster_fn = pipe._raster_fn

    def call_raster(i):
        return raster_fn(gs_cat, mask_cat, jnp.asarray(cam_pos),
                         jnp.asarray(cam_quat), jnp.asarray(road))
    timeit("raster+blur", call_raster)

    # full frame for reference
    def call_frame(i):
        return frame_fn(buckets, proj_hf, proj_seg, None, lut,
                        jnp.asarray(cam_pos), jnp.asarray(cam_quat),
                        jnp.asarray(road))
    timeit("frame_fn (all)", call_frame)


if __name__ == "__main__":
    main()
