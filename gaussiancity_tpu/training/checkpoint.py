# -*- coding: utf-8 -*-
"""Atomic checkpoint/resume via Orbax (reference: core/train.py:374-394).

Improvements over the reference by design (SURVEY.md §5):
  - optimizer state IS saved (the reference drops it, so its resume
    restarts Adam moments)
  - the config is embedded so checkpoints stay self-describing
    (parity with cfg-in-ckpt, core/train.py:377; inference reconstructs
    models from it, scripts/inference.py:61-84)
  - writes are atomic (Orbax) instead of torch.save-over-file
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from gaussiancity_tpu.config import Config


def _mngr(ckpt_dir: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(create=True, max_to_keep=None),
    )


def save_checkpoint(ckpt_dir: str, epoch: int, state, cfg: Config) -> None:
    import orbax.checkpoint as ocp

    mngr = _mngr(ckpt_dir)
    mngr.save(
        epoch,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave({"cfg": cfg.to_dict(), "epoch": epoch}),
        ),
    )
    mngr.wait_until_finished()
    mngr.close()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mngr = _mngr(ckpt_dir)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_checkpoint(ckpt_dir: str, abstract_state,
                       epoch: Optional[int] = None
                       ) -> Tuple[Any, Config, int]:
    """Returns (state, cfg, epoch). ``abstract_state`` is a pytree of the
    same structure (e.g. a freshly initialized TrainState)."""
    import orbax.checkpoint as ocp

    mngr = _mngr(ckpt_dir)
    step = epoch if epoch is not None else mngr.latest_step()
    assert step is not None, f"no checkpoint found in {ckpt_dir}"
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            meta=ocp.args.JsonRestore(),
        ),
    )
    mngr.close()
    cfg = Config.from_dict(restored["meta"]["cfg"])
    return restored["state"], cfg, restored["meta"]["epoch"]
