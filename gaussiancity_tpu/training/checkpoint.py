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
    try:
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
    except Exception as e:
        _raise_if_legacy_hash_table(mngr, step, abstract_state, e)
        raise
    finally:
        mngr.close()
    cfg = Config.from_dict(restored["meta"]["cfg"])
    return restored["state"], cfg, restored["meta"]["epoch"]


def _raise_if_legacy_hash_table(mngr, step, abstract_state, err) -> None:
    """Turn the opaque Orbax shape/structure mismatch a pre-[L, R_max, C]
    checkpoint produces into an actionable migration error (the round-1
    GridEncoder stored one packed [total_rows, C] ``embeddings`` array;
    see ops/hash_grid.py::repack_legacy_table for the exact row mapping).
    """
    import jax
    import numpy as np

    try:
        meta = mngr.item_metadata(step)["state"]
        saved = {"/".join(str(k.key) for k in path): leaf.shape
                 for path, leaf in jax.tree_util.tree_flatten_with_path(
                     meta, is_leaf=lambda x: hasattr(x, "shape"))[0]}
        expect = {"/".join(str(k.key) for k in path): np.shape(leaf)
                  for path, leaf in jax.tree_util.tree_flatten_with_path(
                      abstract_state)[0]}
    except Exception:
        return  # diagnosis failed; re-raise the original error
    for name, shp in saved.items():
        if not name.endswith("embeddings"):
            continue
        want = expect.get(name)
        if shp is not None and len(shp) == 2 and want and len(want) == 3:
            raise ValueError(
                f"checkpoint step {step} stores a legacy packed hash table "
                f"'{name}' of shape {tuple(shp)} but the current "
                f"GridEncoder expects {tuple(want)} ([levels, rows, "
                "channels]).  Migrate it once with ops.hash_grid."
                "repack_legacy_table(packed, in_channels, n_levels, "
                "base_resolution, desired_resolution, log2_hashmap_size) "
                "and re-save; row r of level l == packed row offsets[l]+r."
            ) from err
