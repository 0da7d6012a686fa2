# -*- coding: utf-8 -*-
"""TensorBoard/W&B façade (reference: utils/summary_writer.py:22-99).

One API (`add_config/add_scalars/add_images/close`) backed by tensorboardX
when available, wandb when configured, or a JSONL file fallback (always on,
so headless runs keep a record).  Master-process-only by construction:
instantiate behind ``is_master()``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, output_dir: str, exp_name: str = "",
                 use_tensorboard: bool = True, use_wandb: bool = False,
                 wandb_project: str = "GaussianCityTPU",
                 wandb_run_id: Optional[str] = None):
        self.log_dir = os.path.join(output_dir, "logs", exp_name or "default")
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter as TBWriter

                self._tb = TBWriter(self.log_dir)
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, id=wandb_run_id,
                           resume="allow" if wandb_run_id else None,
                           dir=self.log_dir)
                # snapshot the source tree into the run (reference:
                # utils/summary_writer.py:33-39 logs the code dir)
                code_dir = os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))
                try:
                    wandb.run.log_code(code_dir)
                except Exception:
                    pass
            except Exception:
                self._wandb = None

    def add_config(self, cfg_dict: Dict):
        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=2)
        if self._wandb is not None:
            self._wandb.config.update(cfg_dict, allow_val_change=True)

    def add_scalars(self, scalars: Dict[str, float], step: int):
        rec = {"step": step, "ts": time.time(), **{
            k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def add_images(self, images: Dict[str, "object"], step: int):
        """images: name -> HWC uint8/float arrays."""
        import numpy as np

        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        for k, v in images.items():
            arr = np.asarray(v)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            if self._tb is not None:
                self._tb.add_image(k, arr, step, dataformats="HWC")
            try:
                import imageio

                safe = k.replace("/", "_")
                imageio.imwrite(
                    os.path.join(img_dir, f"{safe}_{step:06d}.png"), arr)
            except Exception:
                pass
        if self._wandb is not None:
            self._wandb.log(
                {k: self._wandb.Image(np.asarray(v))
                 for k, v in images.items()}, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
