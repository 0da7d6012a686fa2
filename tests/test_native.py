# -*- coding: utf-8 -*-
"""Native C++ extruder vs the NumPy mirror (which is itself verified against
the JAX dense extruder)."""

import numpy as np
import pytest

from gaussiancity_tpu.ops.extrusion import (
    GOOGLE_EARTH_CLASS_SCALES, SegInsRelation, extrude_points_np,
)

try:
    from gaussiancity_tpu.native import extrude_points_native
    _ = extrude_points_native  # noqa
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
class TestNativeExtruder:
    def _maps(self, seed=0, H=48, W=48):
        rng = np.random.default_rng(seed)
        ins = np.ones((H, W), np.int32)
        for b in range(5):
            x0, y0 = rng.integers(2, W - 16, 2)
            w0, h0 = rng.integers(4, 12, 2)
            ins[y0: y0 + h0, x0: x0 + w0] = 100 + 2 * b
        ins[40:, 40:] = 5
        td = np.where(ins >= 100, rng.integers(6, 20), 2).astype(np.int32)
        bu = np.zeros((H, W), np.int32)
        pts = rng.random((H, W)) > 0.2
        return ins, td, bu, pts

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("include_btm", [True, False])
    def test_matches_numpy(self, seed, include_btm):
        from gaussiancity_tpu.native import extrude_points_native

        rel = SegInsRelation()
        ins, td, bu, pts = self._maps(seed)
        want = extrude_points_np(ins, td, bu, pts, rel,
                                 GOOGLE_EARTH_CLASS_SCALES, include_btm)
        got = extrude_points_native(ins, td, bu, pts, rel,
                                    GOOGLE_EARTH_CLASS_SCALES, include_btm)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_multithreaded_order_is_deterministic(self):
        from gaussiancity_tpu.native import extrude_points_native

        rel = SegInsRelation()
        ins, td, bu, pts = self._maps(3, H=128, W=96)
        a = extrude_points_native(ins, td, bu, pts, rel,
                                  GOOGLE_EARTH_CLASS_SCALES, n_threads=1)
        b = extrude_points_native(ins, td, bu, pts, rel,
                                  GOOGLE_EARTH_CLASS_SCALES, n_threads=8)
        np.testing.assert_array_equal(a, b)
