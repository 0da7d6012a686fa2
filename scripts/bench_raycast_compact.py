# -*- coding: utf-8 -*-
"""On-chip sweep of the raycast survivor-compaction point (round 4)."""

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
    from gaussiancity_tpu.inference.pipeline import (InferencePipeline,
                                                     get_orbit_camera_poses)
    from gaussiancity_tpu.ops import visibility as vis
    from gaussiancity_tpu.utils import helpers

    P = 512
    cfg = cfg_mod.rest_recipe()
    cfg = cfg.replace(dataset=cfg.dataset.replace(proj_size=P, map_size=P))
    pipe = InferencePipeline(cfg, {}, max_points=262144)
    pts = pipe.build_points({"REST": build_city(P)}, 0)

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
    cam_pos_dev = jnp.asarray(
        np.array([pose["tx"], pose["ty"], pose["tz"]], np.float32))
    cam_quat = jnp.asarray([pose["qx"], pose["qy"], pose["qz"],
                            pose["qw"]], jnp.float32)
    offs = jnp.asarray(offsets)

    for compact in (None, 32, 48, 64, 96):
        for n_bands in ((16,) if compact not in (48, 64) else (8, 16, 32)):
            kw = dict(n_bands=n_bands, compact_after=compact)

            def step(a, eps, kw=kw):
                vol_, cp = a
                vp, ins_map = vis.visible_from_volume(
                    vol_, jnp.asarray(pts, jnp.int32), cp + eps, cam_quat,
                    cam_f=float(K[0, 0]),
                    cam_c=(float(K[1, 2]), float(K[0, 2])),
                    img_dims=(H, W), offsets=offs, occupancy=occ, **kw)
                return (jnp.sum(vp.astype(jnp.float32))
                        + jnp.sum(ins_map.astype(jnp.float32)))

            try:
                ms = chain_time(step, ((vol, cam_pos_dev)), repeats=2)
            except TypeError as e:
                print(f"compact={compact} bands={n_bands}: skip ({e})",
                      flush=True)
                continue
            print(f"compact={str(compact):5s} bands={n_bands:3d}: "
                  f"{ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
