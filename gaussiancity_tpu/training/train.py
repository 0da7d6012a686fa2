# -*- coding: utf-8 -*-
"""Experiment training loop (reference: core/train.py:30-397).

Owns dataloaders, the Trainer (models/optimizers/losses), logging,
per-epoch validation and checkpointing.  The hot step itself is the single
fused jitted function from ``training.step``; data parallelism comes from
``make_parallel_train_step`` over the 'data' mesh axis when more than one
device is present.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.config import Config
from gaussiancity_tpu.data.datasets import DataLoader, get_dataset
from gaussiancity_tpu.parallel import mesh as dist
from gaussiancity_tpu.training import checkpoint as ckpt
from gaussiancity_tpu.training.step import (
    Trainer, make_parallel_train_step, make_train_step,
)
from gaussiancity_tpu.training.test import test as run_test
from gaussiancity_tpu.utils.average_meter import AverageMeter
from gaussiancity_tpu.utils.summary_writer import SummaryWriter

LOSS_NAMES = ["L1Loss", "PerceptualLoss", "GANLoss", "GANLossFake",
              "GANLossReal", "GenLoss", "DisLoss"]


def train(cfg: Config, dataset_name: Optional[str] = None,
          resume_from: Optional[str] = None,
          max_steps: Optional[int] = None,
          run_id: Optional[str] = None) -> None:
    dataset_name = dataset_name or cfg.dataset.name
    train_ds = get_dataset(cfg, dataset_name, "train")
    val_ds = get_dataset(cfg, dataset_name, "val")
    # Per-device batch is cfg.train.batch_size (1, like the reference's
    # 1 sample/GPU); the host loader yields the per-host global batch.
    n_local = jax.local_device_count()
    parallel = n_local > 1
    train_loader = DataLoader(
        train_ds,
        batch_size=cfg.train.batch_size * (n_local if parallel else 1),
        shuffle=True, seed=cfg.train.seed,
        num_workers=cfg.train.n_workers,
        prefetch=cfg.train.prefetch_batches)
    val_loader = DataLoader(val_ds, batch_size=cfg.train.batch_size,
                            shuffle=False,
                            num_workers=cfg.train.n_workers,
                            prefetch=cfg.train.prefetch_batches)

    trainer = Trainer(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)

    # Build the first batch to shape-initialize the state.
    first_batch = next(iter(train_loader.epoch(0)))
    first_batch = jax.tree_util.tree_map(jnp.asarray, first_batch)
    state = trainer.init_state(rng, first_batch)

    init_epoch = 0
    if resume_from:
        state, _, init_epoch = ckpt.restore_checkpoint(resume_from, state)
        logging.info("Resumed from %s at epoch %d", resume_from, init_epoch)

    if parallel:
        m = dist.make_simple_mesh()
        step_fn, repl, shard = make_parallel_train_step(trainer, m)
        state = jax.device_put(state, repl)

        def run_step(state, batch, key):
            batch = jax.device_put(batch, shard)
            return step_fn(state, batch, key)
    else:
        jit_step = make_train_step(trainer)

        def run_step(state, batch, key):
            return jit_step(state, batch, key)

    writer = None
    if dist.is_master():
        # run_id resumes an existing W&B run (reference: run.py:108-111)
        writer = SummaryWriter(cfg.output_dir, cfg.exp_name,
                               wandb_run_id=run_id)
        writer.add_config(cfg.to_dict())

    ckpt_dir = f"{cfg.output_dir}/ckpt/{cfg.exp_name or 'default'}"
    n_batches = len(train_loader)
    global_step = int(state.step)
    log_freq = max(1, cfg.train.log_freq)
    metric_keys: Optional[list] = None

    def flush_pending(pending, epoch_idx, batch_idx):
        """ONE device->host fetch for the whole accumulated window (a
        per-batch float() fetch is a round trip per step that can dominate
        the step over a remote device link)."""
        if not pending:
            return
        steps = [s for s, _ in pending]
        vals = np.asarray(jnp.stack([v for _, v in pending]))  # [B, K]
        for gstep, vrow in zip(steps, vals):
            m = dict(zip(metric_keys, vrow))
            meters.update([float(m[k]) for k in LOSS_NAMES])
            n_drop = m.get("RasterDroppedPairs", 0.0)
            n_trunc = m.get("RasterTruncated", 0.0)
            if n_drop + n_trunc > 0:
                logging.warning(
                    "[Epoch %d][step %d] rasterizer binning overflow: "
                    "%d dropped pairs, %d truncated tiles — raise "
                    "rasterizer.tile_capacity / max_tiles_per_gaussian",
                    epoch_idx, gstep, int(n_drop), int(n_trunc))
            if m.get("RasterGradTruncated", 0.0) > 0:
                logging.warning(
                    "[Epoch %d][step %d] rasterizer backward truncated %d "
                    "gradient slots — raise rasterizer.grad_capacity (or "
                    "set 0 for the unbounded exact scatter)",
                    epoch_idx, gstep, int(m["RasterGradTruncated"]))
            if m.get("PTv3PoolOverflow", 0.0) > 0:
                logging.warning(
                    "[Epoch %d][step %d] PTv3 pooled-capacity overflow: "
                    "%d clusters clamped — raise network.pt_v3."
                    "pool_capacity_divisor headroom",
                    epoch_idx, gstep, int(m["PTv3PoolOverflow"]))
            if writer is not None:
                writer.add_scalars(
                    {f"Loss/Batch/{k}": float(m[k]) for k in LOSS_NAMES},
                    gstep)
                writer.add_scalars(
                    {f"Raster/Batch/{k}": float(m[k])
                     for k in ("RasterDroppedPairs", "RasterTruncated",
                               "RasterGradTruncated", "PTv3PoolOverflow")
                     if k in m},
                    gstep)
        last = dict(zip(metric_keys, vals[-1]))
        logging.info(
            "[Epoch %d/%d][Batch %d/%d] BatchTime %.3fs DataTime "
            "%.3fs Losses %s",
            epoch_idx, cfg.train.n_epochs, batch_idx + 1, n_batches,
            batch_time.val(), data_time.val(),
            ["%.4f" % float(last[k]) for k in LOSS_NAMES])
        pending.clear()

    for epoch_idx in range(init_epoch + 1, cfg.train.n_epochs + 1):
        epoch_t0 = time.time()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        meters = AverageMeter(LOSS_NAMES)
        t_end = time.time()
        pending = []  # (global_step, stacked device metrics) per batch
        for batch_idx, batch in enumerate(train_loader.epoch(epoch_idx)):
            data_time.update(time.time() - t_end)
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            key = jax.random.fold_in(rng, global_step)
            state, metrics = run_step(state, batch, key)
            if metric_keys is None:
                metric_keys = sorted(metrics)
            # one tiny on-device stack per batch; NO host sync here
            pending.append((global_step + 1, jnp.stack(
                [jnp.asarray(metrics[k], jnp.float32) for k in metric_keys])))
            batch_time.update(time.time() - t_end)
            t_end = time.time()
            global_step += 1
            if len(pending) >= log_freq:
                flush_pending(pending, epoch_idx, batch_idx)
            if max_steps is not None and global_step >= max_steps:
                break
        flush_pending(pending, epoch_idx, n_batches - 1)

        if writer is not None:
            writer.add_scalars(
                {f"Loss/Epoch/{k}/Train": v
                 for k, v in meters.as_dict().items()}, epoch_idx)
        logging.info("[Epoch %d/%d] done in %.2fs; avg %s",
                     epoch_idx, cfg.train.n_epochs,
                     time.time() - epoch_t0,
                     ["%.4f" % v for v in meters.avg()])

        # Per-epoch validation (reference: core/train.py:361-365)
        if epoch_idx % cfg.test.test_freq == 0:
            run_test(cfg, trainer, state, val_loader, writer=writer,
                     epoch=epoch_idx)

        # Checkpointing (reference: core/train.py:374-394)
        if dist.is_master():
            if (epoch_idx % cfg.train.ckpt_save_freq == 0
                    or epoch_idx == cfg.train.n_epochs):
                ckpt.save_checkpoint(ckpt_dir, epoch_idx,
                                     jax.device_get(state), cfg)
        if max_steps is not None and global_step >= max_steps:
            if dist.is_master():
                ckpt.save_checkpoint(ckpt_dir, epoch_idx,
                                     jax.device_get(state), cfg)
            break

    if writer is not None:
        writer.close()
