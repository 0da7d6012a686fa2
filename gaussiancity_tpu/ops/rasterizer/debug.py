# -*- coding: utf-8 -*-
"""Rasterizer debug snapshots.

TPU analogue of the reference's ``debug=True`` path, which deep-copies
all rasterizer inputs and dumps ``snapshot_fw.dump`` / ``snapshot_bw.dump``
when a CUDA kernel faults (reference:
extensions/diff_gaussian_rasterization/__init__.py:65-83,155-175).

CUDA faults don't exist here — the failure mode that remains is
non-finite values flowing through the pipeline.  ``rasterize_checked``
renders normally, then (host-side, after the jitted computation) checks
the outputs and saves a self-contained pickle of every input when
something is non-finite, so the bad step can be replayed offline::

    out = rasterize_checked(means, opac, scales, quats, colors, cam, cfg)
    ...
    snap = load_snapshot("/tmp/snapshot_fw.pkl")
    rasterize(**snap["arrays"], cam=snap["cam"], cfg=snap["cfg"])

For NaNs *inside* the pipeline (outputs still finite), JAX's global
``jax.config.update("jax_debug_nans", True)`` remains the heavier tool.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussiancity_tpu.ops.rasterizer.api import RenderOutput, rasterize


def dump_snapshot(path: str, arrays: dict, cam=None, cfg=None,
                  note: str = "") -> str:
    """Pickle a dict of (host-fetched) arrays + camera/config for replay."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "arrays": {k: np.asarray(v) for k, v in arrays.items()
                   if v is not None},
        "cam": cam,
        "cfg": cfg,
        "note": note,
    }
    with open(path, "wb") as fp:
        pickle.dump(payload, fp)
    return path


def load_snapshot(path: str) -> dict:
    with open(path, "rb") as fp:
        return pickle.load(fp)


def rasterize_checked(
    means3d, opacities, scales, quats, colors, cam, cfg,
    snapshot_path: str = "/tmp/snapshot_fw.pkl",
    raise_on_nonfinite: bool = True,
    **kwargs,
) -> Optional[RenderOutput]:
    """``rasterize`` + host-side output finiteness check.

    On a non-finite image or final_T, every input is dumped to
    ``snapshot_path`` (reference's snapshot_fw.dump) and, unless
    ``raise_on_nonfinite=False``, a FloatingPointError is raised.  Adds
    one device->host scalar fetch per call — use in debugging sessions,
    not in the hot training loop.
    """
    out = rasterize(means3d, opacities, scales, quats, colors, cam, cfg,
                    **kwargs)
    finite = bool(jnp.isfinite(out.image).all()
                  & jnp.isfinite(out.final_T).all())
    if not finite:
        arrays = dict(means3d=means3d, opacities=opacities, scales=scales,
                      quats=quats, colors=colors)
        arrays.update({k: v for k, v in kwargs.items()
                       if isinstance(v, (np.ndarray, jnp.ndarray))})
        dump_snapshot(snapshot_path, arrays, cam=cam, cfg=cfg,
                      note="non-finite rasterize output")
        logging.error("rasterize produced non-finite output; inputs "
                      "dumped to %s", snapshot_path)
        if raise_on_nonfinite:
            raise FloatingPointError(
                f"non-finite rasterize output (snapshot: {snapshot_path})")
    return out
