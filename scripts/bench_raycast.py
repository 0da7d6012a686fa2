# -*- coding: utf-8 -*-
"""On-chip raycast tuning bench (round 4).

Reproduces the bench_frame_e2e synthetic city (512x512x192 volume,
960x540 sensor = 518,400 rays) and times ray_voxel_intersection under
scheduling variants: band count and ray ordering.  The lockstep band
march pays for every band's worst ray; cost-sorted ray ordering should
make bands homogeneous so cheap bands exit early.

Methodology: chain_time (device-chained fori_loop, one host fetch) with
the camera position varied per iteration so XLA cannot hoist the
ray-setup machinery out of the loop (CLAUDE.md benchmark rules).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from _bench_util import chain_time


def build_city(P=512):
    rng = np.random.default_rng(0)
    ins = np.ones((P, P), np.int16)
    td = np.full((P, P), 2, np.int16)
    for bi in range(48):
        x, y = rng.integers(16, P - 48, 2)
        w, h = rng.integers(12, 40, 2)
        iid = 100 + 2 * bi
        ins[y:y + h, x:x + w] = iid
        td[y:y + h, x:x + w] = rng.integers(20, 120)
    seg = np.where(ins >= 100, 2, ins).astype(np.int16)
    return {"INS": ins, "SEG": seg, "TD_HF": td,
            "BU_HF": np.zeros((P, P), np.int16),
            "PTS": np.ones((P, P), bool)}


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
    print(f"extruded points: {len(pts)}")

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
    cam_quat = jnp.asarray([pose["qx"], pose["qy"], pose["qz"],
                            pose["qw"]], jnp.float32)
    cam_pos_dev = jnp.asarray(cam_pos)
    offs = jnp.asarray(offsets)

    variants = []
    for n_bands in (16, 64, 256):
        for order in (None, "cost"):
            variants.append((n_bands, order))

    for n_bands, order in variants:
        kw = dict(n_bands=n_bands)
        if order is not None:
            kw["order"] = order

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
            print(f"bands={n_bands:4d} order={order}: unsupported ({e})")
            continue
        print(f"bands={n_bands:4d} order={str(order):4s}: {ms:8.1f} ms")


if __name__ == "__main__":
    main()
