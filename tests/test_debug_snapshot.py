# -*- coding: utf-8 -*-
"""Debug snapshot dumps (reference debug=True path:
extensions/diff_gaussian_rasterization/__init__.py:65-83)."""

import jax
import numpy as np
import pytest

from gaussiancity_tpu.config import RasterizerConfig
from gaussiancity_tpu.ops.rasterizer import rasterize
from gaussiancity_tpu.ops.rasterizer.debug import (
    load_snapshot, rasterize_checked,
)
from test_rasterizer import make_camera, make_scene

CFG = RasterizerConfig(tile_h=8, tile_w=128, max_tiles_per_gaussian=64,
                       tile_capacity=256, backend="xla")


def test_clean_scene_passes_and_matches_rasterize(tmp_path):
    cam = make_camera()
    scene = make_scene(jax.random.PRNGKey(0))
    snap = str(tmp_path / "snap.pkl")
    out = rasterize_checked(*scene, cam, CFG, snapshot_path=snap)
    ref = rasterize(*scene, cam, CFG)
    np.testing.assert_array_equal(np.asarray(out.image),
                                  np.asarray(ref.image))
    assert not (tmp_path / "snap.pkl").exists()


def test_nonfinite_dumps_replayable_snapshot(tmp_path):
    cam = make_camera()
    means, opac, scales, quats, colors = make_scene(jax.random.PRNGKey(1))
    colors = colors.at[7, 1].set(np.nan)
    snap = str(tmp_path / "snap.pkl")
    with pytest.raises(FloatingPointError):
        rasterize_checked(means, opac, scales, quats, colors, cam, CFG,
                          snapshot_path=snap)
    payload = load_snapshot(snap)
    assert payload["note"] == "non-finite rasterize output"
    np.testing.assert_array_equal(payload["arrays"]["means3d"],
                                  np.asarray(means))
    # the snapshot replays the failure offline
    out = rasterize(cam=payload["cam"], cfg=payload["cfg"],
                    **{k: payload["arrays"][k] for k in
                       ("means3d", "opacities", "scales", "quats",
                        "colors")})
    assert not np.isfinite(np.asarray(out.image)).all()
    # and warn-only mode returns the output without raising
    out2 = rasterize_checked(means, opac, scales, quats, colors, cam, CFG,
                             snapshot_path=str(tmp_path / "s2.pkl"),
                             raise_on_nonfinite=False)
    assert out2 is not None
