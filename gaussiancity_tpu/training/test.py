# -*- coding: utf-8 -*-
"""Validation/test loop (reference: core/test.py:22-125): center-crop eval,
masked-L1 metric, periodic side-by-side key frames."""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import Config
from gaussiancity_tpu.utils.average_meter import AverageMeter


def test(cfg: Config, trainer, state, loader, writer=None,
         epoch: int = 0, key_frame_freq: int = 1,
         max_batches: Optional[int] = None) -> float:
    eval_step = jax.jit(trainer.eval_step)
    meter = AverageMeter(["L1Loss"])
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader.epoch(0)):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        metrics, fake = eval_step(state, batch, rng)
        meter.update([float(metrics["L1Loss"])])
        if writer is not None and i % key_frame_freq == 0:
            fake_img = np.asarray(fake[0]) / 2 + 0.5
            real_img = np.asarray(batch["rgb"][0]) / 2 + 0.5
            side = np.concatenate([fake_img, real_img], axis=1)
            writer.add_images({f"Images/Val/{i:04d}": side}, epoch)
        if max_batches is not None and i + 1 >= max_batches:
            break
    avg = meter.avg(0)
    logging.info("[Val][Epoch %d] L1Loss %.4f", epoch, avg)
    if writer is not None:
        writer.add_scalars({"Loss/Epoch/L1Loss/Val": avg}, epoch)
    return avg
