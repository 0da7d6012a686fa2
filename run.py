#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""CLI runner (reference: run.py:29-141).

Trains or tests a recipe:

    python run.py -e MyExp -r rest -d GOOGLE_EARTH
    python run.py --test -p output/ckpt/MyExp -r bldg

Unlike the reference — which ``exec``'s a config file — recipes are named
constructors in ``gaussiancity_tpu.config`` plus JSON override files
(``-c cfg.json``), so configs stay serializable.
"""

from __future__ import annotations

import argparse
import logging
import sys


def get_args():
    p = argparse.ArgumentParser(description="GaussianCity-TPU runner")
    p.add_argument("-e", "--exp", dest="exp_name", default=None,
                   help="experiment name")
    p.add_argument("-r", "--recipe", default="rest",
                   choices=["rest", "bldg", "car"],
                   help="model recipe (reference: README.md:125-167)")
    p.add_argument("-c", "--cfg", dest="cfg_file", default=None,
                   help="JSON config overrides")
    p.add_argument("-d", "--dataset", default=None,
                   help="GOOGLE_EARTH | KITTI_360 | SYNTHETIC")
    p.add_argument("-p", "--ckpt", dest="ckpt", default=None,
                   help="checkpoint dir to load/resume")
    p.add_argument("--test", dest="test", action="store_true")
    p.add_argument("--inference", action="store_true",
                   help="render a city video from trained checkpoints "
                        "(reference: scripts/inference.py:672-707)")
    p.add_argument("--ckpt-rest", default=None,
                   help="REST (background) generator checkpoint dir")
    p.add_argument("--ckpt-bldg", default=None,
                   help="BLDG generator checkpoint dir")
    p.add_argument("--ckpt-car", default=None,
                   help="CAR generator checkpoint dir (KITTI-360)")
    p.add_argument("--city-dir", default=None,
                   help="city dir with Projection/ (+ CENTERS.pkl)")
    p.add_argument("--data-root", default=None,
                   help="dataset root; a random city is picked when "
                        "--city-dir is not given")
    p.add_argument("--output", default="output/video.mp4",
                   help="output video path (--inference)")
    p.add_argument("--frames", type=int, default=24,
                   help="number of orbit frames (--inference)")
    p.add_argument("--radius", type=int, default=None)
    p.add_argument("--altitude", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-points", type=int, default=262144,
                   help="per-frame visible point budget (--inference)")
    p.add_argument("--run-id", dest="run_id", default=None,
                   help="W&B run id to resume logging into "
                        "(reference: run.py:108-111)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = get_args()
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.INFO)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.parallel import mesh as dist

    dist.init_dist(args.coordinator, args.num_processes, args.process_id)

    recipe = {
        "rest": cfg_mod.rest_recipe,
        "bldg": cfg_mod.bldg_recipe,
        "car": cfg_mod.car_recipe,
    }[args.recipe]
    cfg = recipe() if args.recipe != "car" else recipe()
    if args.cfg_file:
        with open(args.cfg_file) as f:
            cfg = cfg_mod.Config.from_json(f.read())
    if args.exp_name:
        cfg = cfg.replace(exp_name=args.exp_name)
    if args.dataset:
        if args.dataset == "SYNTHETIC":
            cfg = cfg.replace(dataset=cfg.dataset.replace(name="SYNTHETIC"))
        elif args.dataset != cfg.dataset.name:
            base = (cfg_mod.kitti_360_dataset()
                    if args.dataset == "KITTI_360"
                    else cfg_mod.google_earth_dataset())
            cfg = cfg.replace(dataset=base)

    if args.inference:
        return run_inference(args)

    if args.test:
        assert args.ckpt, "--test requires -p/--ckpt"
        import jax

        from gaussiancity_tpu.data.datasets import DataLoader, get_dataset
        from gaussiancity_tpu.training import checkpoint as ckpt_mod
        from gaussiancity_tpu.training.step import Trainer
        from gaussiancity_tpu.training.test import test as run_test

        val_ds = get_dataset(cfg, cfg.dataset.name, "val")
        loader = DataLoader(val_ds, batch_size=1, shuffle=False)
        trainer = Trainer(cfg)
        batch = next(iter(loader.epoch(0)))
        import jax.numpy as jnp

        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, cfg2, epoch = ckpt_mod.restore_checkpoint(args.ckpt, state)
        run_test(cfg, trainer, state, loader, epoch=epoch)
    else:
        from gaussiancity_tpu.training.train import train

        train(cfg, dataset_name=cfg.dataset.name, resume_from=args.ckpt,
              max_steps=args.max_steps, run_id=args.run_id)
    return 0


def run_inference(args) -> int:
    """Checkpoint dir(s) + city dir -> rendered orbit video
    (reference: scripts/inference.py:614-707)."""
    import os

    import numpy as np

    from gaussiancity_tpu.inference.loader import (
        get_city_projections, get_models, get_random_city,
    )
    from gaussiancity_tpu.inference.pipeline import (
        InferencePipeline, get_orbit_camera_poses, get_style_lut,
    )

    ckpt_dirs = {}
    if args.ckpt_rest:
        ckpt_dirs["REST"] = args.ckpt_rest
    if args.ckpt_bldg:
        ckpt_dirs["BLDG"] = args.ckpt_bldg
    if args.ckpt_car:
        ckpt_dirs["CAR"] = args.ckpt_car
    if not ckpt_dirs and args.ckpt:
        ckpt_dirs["REST"] = args.ckpt
    assert ckpt_dirs, ("--inference requires at least one of --ckpt-rest / "
                       "--ckpt-bldg / --ckpt-car (or -p)")

    cfg, models, z_banks = get_models(ckpt_dirs)
    rng = np.random.default_rng(args.seed)

    city_dir = args.city_dir or get_random_city(args.data_root, rng)
    logging.info("rendering city: %s", city_dir)
    projections, centers = get_city_projections(city_dir)

    # With several generators, use the compacted per-class path: each
    # model sees only its own class's points — the reference splits
    # classes ragged (scripts/inference.py:455-507), and a set-based
    # model (BLDG's PTv3) must not attend over foreign classes.  The
    # per-class budget is the full point cap; compute follows the actual
    # visible counts (sticky slabs).
    budgets = ({name: args.max_points for name in models}
               if len(models) > 1 else None)
    pipeline = InferencePipeline(cfg, models, max_points=args.max_points,
                                 class_budgets=budgets)
    # Orbit around the loaded city map's actual center.  The reference
    # hardcodes PROJ_SIZE // 2 (scripts/inference.py:174-176) because its
    # cities are exactly proj_size wide; centering on the real map keeps
    # smaller/demo cities in frame instead of orbiting empty space.
    map_hw = next(iter(projections.values()))["SEG"].shape
    if map_hw[0] != cfg.dataset.proj_size or map_hw[1] != map_hw[0]:
        logging.info("city map is %sx%s px (proj_size %d): centering "
                     "orbit on the map", map_hw[1], map_hw[0],
                     cfg.dataset.proj_size)
    poses = get_orbit_camera_poses(
        max(map_hw), n_points=args.frames,
        radius=args.radius, altitude=args.altitude, rng=rng,
        center=(map_hw[1] // 2, map_hw[0] // 2))

    z_dim = cfg.network.z_dim
    for name in ("BLDG", "CAR"):
        if name in models and models[name][0].cfg.z_dim:
            z_dim = models[name][0].cfg.z_dim
    style_lut = get_style_lut(
        centers, z_dim or 1,
        z_bank=z_banks.get("BLDG") or z_banks.get("CAR"),
        seed=args.seed)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    frames = pipeline.render_trajectory(
        projections, centers, poses, style_lut=style_lut,
        video_path=args.output)
    # per-frame jpgs next to the video (the reference always writes them,
    # scripts/inference.py:667)
    import cv2

    frame_dir = os.path.splitext(os.path.abspath(args.output))[0] + "_frames"
    os.makedirs(frame_dir, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(frame_dir, "%04d.jpg" % i), f[..., ::-1])
    logging.info("wrote %d frames to %s (+ jpgs in %s)", len(frames),
                 args.output, frame_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
