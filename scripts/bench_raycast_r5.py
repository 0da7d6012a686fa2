# -*- coding: utf-8 -*-
"""Round-5 raycast sweep: hierarchy block edge (COARSE) x compaction
schedule.

Street-canyon rays are the measured tail: a ray flying down a road at
z ~ building height descends into nearly every 8x8 block it crosses
(the blocks' z-masks are polluted by the buildings flanking the road),
so it fine-marches most of its 512-cell path.  A 4-cell block edge
keeps clean empty blocks down a ~12-cell-wide street (hierarchy
1/4/16 instead of 1/8/64); denser compaction schedules shrink the
lockstep width the tail pays for.

Timing: per-call dispatch + host fetch (chain_time's fori chaining
serializes the compaction phases and misreports this op — see
PROGRESS.md round 4; CLAUDE.md says per-call + forced host fetch is
trustworthy when the op is hundreds of ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
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
    jax.block_until_ready(vol)

    W, H = cfg.dataset.sensor_size
    K = np.asarray(cfg.dataset.cam_k).reshape(3, 3)
    pose = get_orbit_camera_poses(P, n_points=4, radius=220, altitude=260)[1]
    cam_pos_dev = jnp.asarray(
        np.array([pose["tx"], pose["ty"], pose["tz"]], np.float32))
    cam_quat = jnp.asarray([pose["qx"], pose["qy"], pose["qz"],
                            pose["qw"]], jnp.float32)
    offs = jnp.asarray(offsets)
    pts_dev = jnp.asarray(pts, jnp.int32)

    ref = {}
    for coarse in (8, 4):
        vis.COARSE = coarse  # read at trace time (pack + march)
        # fresh lambda: jax.jit on the SAME function object reuses its
        # trace cache, which would silently return the previous COARSE's
        # tables (this bug produced a bogus 214 ms c4 "win" first try)
        occ = jax.jit(lambda v: vis.pack_occupancy(v))(vol)
        jax.block_until_ready(occ)
        for compact in ((64, 96), (64, 96, 160), (64, 96, 160, 256),
                        (64, 96, 144, 224, 352), (48, 96, 192, 384)):
            fn = jax.jit(lambda v, cp, o, compact=compact:
                         vis.visible_from_volume(
                             v, pts_dev, cp, cam_quat,
                             cam_f=float(K[0, 0]),
                             cam_c=(float(K[1, 2]), float(K[0, 2])),
                             img_dims=(H, W), offsets=offs, occupancy=o,
                             compact_after=compact))
            vp, ins_map = fn(vol, cam_pos_dev, occ)
            chk = (int(jnp.sum((vp >= 0).astype(jnp.int32))),
                   int(jnp.sum(ins_map.astype(jnp.int64))))
            if ref.setdefault("chk", chk) != chk:
                print(f"  MISMATCH vs baseline: {chk} != {ref['chk']}")
            ts = []
            for _ in range(4):
                t0 = time.time()
                vp, _ = fn(vol, cam_pos_dev, occ)
                float(jnp.sum(vp.astype(jnp.float32)))  # forced host fetch
                ts.append((time.time() - t0) * 1e3)
            print(f"coarse={coarse} compact={compact}: "
                  f"{min(ts):7.1f} ms (runs {[round(t) for t in ts]})",
                  flush=True)
    vis.COARSE = 8


if __name__ == "__main__":
    main()
