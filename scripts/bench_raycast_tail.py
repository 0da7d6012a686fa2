# -*- coding: utf-8 -*-
"""Raycast tail analysis (round 4): how much of the march cost is the
last few live rays?

Sweeps max_steps and reports (a) live-ray count at each cap, (b) timing
at each cap (chain_time, camera varied per iteration).  If e.g. 95% of
rays settle by iteration 96 but the full march runs 400+ iterations on
some band, compacting survivors into a narrow buffer after a fixed
prefix would cut most of the per-iteration gather width for the tail.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from _bench_util import chain_time
from bench_raycast import build_city


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.camera import quat_xyzw_to_matrix
    from gaussiancity_tpu.inference.pipeline import (InferencePipeline,
                                                     get_orbit_camera_poses)
    from gaussiancity_tpu.ops import visibility as vis
    from gaussiancity_tpu.utils import helpers

    P = 512
    cfg = cfg_mod.rest_recipe()
    cfg = cfg.replace(dataset=cfg.dataset.replace(proj_size=P, map_size=P))
    pipe = InferencePipeline(cfg, {}, max_points=262144)
    pts = pipe.build_points({"REST": build_city(P)}, 0)
    print(f"extruded points: {len(pts)}", flush=True)

    mins = pts[:, :3].min(0)
    offsets = np.array([mins[0], mins[1], mins[2] - 1], np.int32)
    h, w, d = 512, 512, 192
    scales3 = np.asarray(helpers.get_point_scales(
        jnp.asarray(pts[:, 3:4], jnp.float32),
        jnp.asarray(pts[:, 4], jnp.int32)), np.int32)
    loc = pts[:, :3] - offsets[None, :]
    pt_ids = jnp.arange(1, len(pts) + 1, dtype=jnp.int32)
    vol = jax.jit(lambda l, i, s: vis.points_to_volume(
        l, i, s, h=h, w=w, d=d))(
        jnp.asarray(loc, jnp.int32), pt_ids, jnp.asarray(scales3))
    occ = jax.jit(vis.pack_occupancy)(vol)
    jax.block_until_ready((vol, occ))

    W, H = cfg.dataset.sensor_size
    K = np.asarray(cfg.dataset.cam_k).reshape(3, 3)
    pose = get_orbit_camera_poses(P, n_points=4, radius=220, altitude=260)[1]
    cam_pos = np.array([pose["tx"], pose["ty"], pose["tz"]], np.float32)
    cam_quat = np.asarray([pose["qx"], pose["qy"], pose["qz"],
                           pose["qw"]], np.float32)
    cam_pos_loc = (cam_pos - offsets).astype(np.float32)
    Rm = np.asarray(quat_xyzw_to_matrix(jnp.asarray(cam_quat)))
    look = Rm[:, 0]
    ori = jnp.asarray([cam_pos_loc[1], cam_pos_loc[0], cam_pos_loc[2]],
                      jnp.float32)
    vdir = jnp.asarray([look[1], look[0], look[2]], jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0])
    cam_f = float(K[0, 0])
    cam_c = (float(K[1, 2]), float(K[0, 2]))

    # live counts + per-band iters at each cap (one shot, not timed)
    for cap in (32, 64, 96, 128, 192, 256, 384, 512, 1024):
        res, (iters, live) = jax.jit(
            lambda v, o, cap=cap: vis.ray_voxel_intersection(
                v, o, vdir, up, cam_f, cam_c, (H, W), max_steps=cap,
                occupancy=occ, return_band_iters=True))(vol, ori)
        iters = np.asarray(iters)
        live = np.asarray(live)
        print(f"cap {cap:5d}: live {int(live.sum()):7d}  "
              f"band iters {iters.tolist()}", flush=True)

    # timing sweep
    for cap in (64, 96, 128, 192, 256, None):
        def step(a, eps, cap=cap):
            v, o = a
            r = vis.ray_voxel_intersection(
                v, o + eps, vdir, up, cam_f, cam_c, (H, W),
                max_steps=cap, occupancy=occ)
            return (jnp.sum(r.voxel_id.astype(jnp.float32))
                    + jnp.sum(jnp.where(jnp.isfinite(r.depth), r.depth,
                                        0.0)))
        ms = chain_time(step, ((vol, ori)), repeats=2)
        print(f"cap {str(cap):5s}: {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
