# -*- coding: utf-8 -*-
"""N+1-label semantic GAN loss (reference: losses/gan.py:15-97).

Pure function (no module state).  ``pred`` is the discriminator output with
``n_classes + 1`` channels; ``label`` is the n_classes one-hot seg map.
Channel 0 (NULL class) is zeroed in both before the log-softmax; the last
prediction channel is the "fake" class.

Layout: NHWC ([B, H, W, C]) — the TPU-native layout used throughout; the
reference uses NCHW.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gan_loss(
    pred: jnp.ndarray,  # [B, H, W, n_classes + 1]
    label: jnp.ndarray,  # [B, H, W, n_classes]
    t_real: bool,
    weight: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, W, 1]
    dis_update: bool = True,
) -> jnp.ndarray:
    assert pred.shape[-1] == label.shape[-1] + 1
    # ignore label 0 (reference: losses/gan.py:72-74)
    label = label.at[..., 0].set(0.0)
    pred = pred.at[..., 0].set(0.0)
    logp = jax.nn.log_softmax(pred, axis=-1)
    if dis_update:
        if t_real:
            loss = -jnp.sum(label * logp[..., :-1], axis=-1, keepdims=True)
        else:
            loss = -logp[..., -1:]
    else:
        assert t_real, "GAN loss must be aiming for real."
        loss = -jnp.sum(label * logp[..., :-1], axis=-1, keepdims=True)
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)
