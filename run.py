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
              max_steps=args.max_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
