# -*- coding: utf-8 -*-
"""Second-derivative filter-bank smoothness loss
(reference: losses/smoothness.py:15-80 — defined there but unused by the
training loops; provided for capability parity).

NHWC layout; filters applied depthwise over a single channel input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FILTER_X = np.array([[0, 0, 0.0], [1, -2, 1], [0, 0, 0]], np.float32)
_FILTER_Y = np.array([[0, 1, 0.0], [0, -2, 0], [0, 1, 0]], np.float32)
_FILTER_D1 = np.array([[1, 0, 0.0], [0, -2, 0], [0, 0, 1]], np.float32)
_FILTER_D2 = np.array([[0, 0, 1.0], [0, -2, 0], [1, 0, 0]], np.float32)


def _filters(use_diag: bool) -> jnp.ndarray:
    fs = [_FILTER_X, _FILTER_Y] + ([_FILTER_D1, _FILTER_D2] if use_diag else [])
    # HWIO: [3, 3, 1, n_filters]
    return jnp.asarray(np.stack(fs, axis=-1)[:, :, None, :])


def _masks(H: int, W: int, use_diag: bool) -> jnp.ndarray:
    def mask(pad_ud, pad_lr):
        m = np.zeros((H, W), np.float32)
        m[pad_ud[0]: H - pad_ud[1] or None, pad_lr[0]: W - pad_lr[1] or None] = 1.0
        return m

    mx = mask((0, 0), (0, 1))
    my = mask((0, 1), (0, 0))
    md = mask((1, 1), (1, 1))
    ms = [mx, my] + ([md, md] if use_diag else [])
    return jnp.asarray(np.stack(ms, axis=-1))  # [H, W, n_filters]


def smoothness_loss(inp: jnp.ndarray, target: jnp.ndarray,
                    use_diag: bool = True) -> jnp.ndarray:
    """inp/target: [B, H, W, 1]."""
    B, H, W, C = inp.shape
    assert C == 1
    filt = _filters(use_diag)

    def grads(x):
        return jax.lax.conv_general_dilated(
            x, filt, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    gi = grads(inp)
    gt = grads(target)
    diff = gi - gt
    # smooth_l1 (huber, beta=1)
    ad = jnp.abs(diff)
    huber = jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5)
    return jnp.mean(huber * _masks(H, W, use_diag)[None])
