# -*- coding: utf-8 -*-
"""Checkpoint -> inference-ready models (reference: scripts/inference.py
:57-133).

``get_models`` restores 1-3 trained generator checkpoints (REST/BLDG/CAR),
rebuilds each ``Generator`` module from the config embedded in its
checkpoint, and returns the ``name -> (module, params)`` map the
``InferencePipeline`` consumes — the full path from a training run to a
rendered video.  ``get_city_projections`` / ``get_random_city`` load the
projection maps + CENTERS a city directory provides
(reference: scripts/inference.py:111-133, dataset_generator.py:909-933).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from gaussiancity_tpu.config import Config
from gaussiancity_tpu.models import Generator


def load_generator(ckpt_dir: str, epoch: Optional[int] = None
                   ) -> Tuple[Config, Generator, dict, Optional[dict]]:
    """Restore one checkpoint dir -> (cfg, module, g_params, z_bank).

    The checkpoint is self-describing (cfg embedded at save time,
    training/checkpoint.py), so no abstract state template is needed —
    mirrors the reference rebuilding models from ``ckpt["cfg"]``
    (scripts/inference.py:61-84).  ``z_bank`` is a per-instance style dict
    if the checkpoint carries one (reference reads ``module.z``,
    :91-92); absent otherwise.
    """
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = epoch if epoch is not None else mngr.latest_step()
    assert step is not None, f"no checkpoint found in {ckpt_dir}"
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            meta=ocp.args.JsonRestore(),
        ),
    )
    mngr.close()
    cfg = Config.from_dict(restored["meta"]["cfg"])
    state = restored["state"]
    # Full variable dict: params + the BN running averages the eval path
    # normalizes with (torch eval semantics; see models/ptv3.py
    # MaskedBatchNorm).
    g_vars = {"params": state["g_params"]}
    if state.get("g_stats"):
        g_vars["batch_stats"] = state["g_stats"]
    elif cfg.network.ptv3.enabled:
        # a PTv3 generator applied at eval reads the batch_stats
        # collection; a ckpt without it would crash deep inside apply
        raise ValueError(
            f"checkpoint {ckpt_dir} has a PTv3 generator but no BN "
            "running stats ('g_stats') — it predates the running-average "
            "BatchNorm; re-save it from a resumed training run")
    z_bank = state.get("z_bank")
    module = Generator(cfg=cfg.network, n_classes=cfg.dataset.n_classes,
                       proj_size=cfg.dataset.proj_size)
    logging.info("restored %s (epoch %s): %d param arrays", ckpt_dir, step,
                 len(jax_leaves(g_vars["params"])))
    return cfg, module, g_vars, z_bank


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def get_models(ckpt_dirs: Dict[str, str]
               ) -> Tuple[Config, Dict[str, Tuple[Generator, dict]],
                          Dict[str, Optional[dict]]]:
    """Restore the per-class generators (reference: scripts/inference.py
    :57-108).

    ckpt_dirs: e.g. {"REST": dir, "BLDG": dir[, "CAR": dir]}.
    Returns (cfg of the REST model — the rig/dataset source of truth,
    models map, z banks map).
    """
    assert ckpt_dirs, "at least one checkpoint dir required"
    models: Dict[str, Tuple[Generator, dict]] = {}
    z_banks: Dict[str, Optional[dict]] = {}
    base_cfg = None
    for name, d in ckpt_dirs.items():
        cfg, module, params, z_bank = load_generator(d)
        models[name] = (module, params)
        z_banks[name] = z_bank
        if name == "REST" or base_cfg is None:
            base_cfg = cfg
    return base_cfg, models, z_banks


def get_city_projections(city_dir: str):
    """One city dir -> (projections, centers) (reference:
    dataset_generator.py:909-933 + inference.py:126-133)."""
    from gaussiancity_tpu.data.dataset_generator import load_projections

    projections = load_projections(os.path.join(city_dir, "Projection"))
    assert projections, f"no Projection/*.png found under {city_dir}"
    centers_path = os.path.join(city_dir, "CENTERS.pkl")
    if os.path.exists(centers_path):
        with open(centers_path, "rb") as fp:
            centers = pickle.load(fp)
    else:
        from gaussiancity_tpu.data.dataset_generator import (
            get_centers_from_projections,
        )

        centers = get_centers_from_projections("GOOGLE_EARTH", projections)
    return projections, centers


def get_random_city(data_root: str,
                    rng: Optional[np.random.Generator] = None) -> str:
    """Pick a random city dir under a dataset root
    (reference: scripts/inference.py:111-124)."""
    rng = rng or np.random.default_rng()
    cities = sorted(
        d for d in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, d, "Projection"))
    )
    assert cities, f"no city dirs with Projection/ under {data_root}"
    return os.path.join(data_root, cities[int(rng.integers(len(cities)))])
