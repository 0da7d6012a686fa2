# -*- coding: utf-8 -*-
"""FPN discriminator with spectral-norm convs
(reference: models/discriminator.py:14-221).

NHWC layout.  Spectral norm via ``flax.linen.SpectralNorm`` (power
iteration state lives in the ``batch_stats`` collection, updated during
training steps — the functional analogue of torch's hook-based
spectral_norm).

Outputs a dict {pred: [B, H/4, W/4, n_classes+1], label: [B, H/4, W/4,
n_classes]} where ``label`` is the area-downsampled, re-argmaxed one-hot seg
map (reference: models/discriminator.py:177-189).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaussiancity_tpu.models.generator import torch_bias_uniform, torch_kaiming_uniform


class SNConv(nn.Module):
    features: int
    kernel: int
    stride: int
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, update_sn: bool = True):
        fan_in = x.shape[-1] * self.kernel * self.kernel
        # Explicit symmetric padding: torch's Conv2d(padding=1) pads (1, 1)
        # on both sides even at stride 2, where XLA "SAME" would pad (0, 1)
        # on even inputs — same output size, shifted taps (weight-parity
        # breaker, caught by tests/test_reference_parity.py).
        conv = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)) if self.kernel > 1 else "VALID",
            use_bias=True,
            kernel_init=torch_kaiming_uniform,
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.dtype,
        )
        sn = nn.SpectralNorm(conv, collection_name="batch_stats")
        x = sn(x, update_stats=update_sn)
        return nn.leaky_relu(x, negative_slope=0.2)


def smooth_interp(x: jnp.ndarray, size) -> jnp.ndarray:
    """Area-downsample a one-hot seg map then re-onehot by argmax
    (reference: models/discriminator.py:177-189). x: [B, H, W, C]."""
    B, H, W, C = x.shape
    th, tw = size
    # area interpolation == average pooling when sizes divide evenly;
    # use jax.image.resize linear+antialias analog via reduce_window when
    # integral factor, else fall back to resize 'linear'.
    if H % th == 0 and W % tw == 0:
        fh, fw = H // th, W // tw
        y = nn.avg_pool(x, (fh, fw), strides=(fh, fw))
    else:
        y = jax.image.resize(x, (B, th, tw, C), method="linear")
    idx = jnp.argmax(y, axis=-1)
    return jax.nn.one_hot(idx, C, dtype=x.dtype)


class Discriminator(nn.Module):
    """N+1-class patch discriminator FPN."""

    n_channel_base: int = 128
    n_classes: int = 8
    dtype: object = None  # compute dtype, e.g. jnp.bfloat16 (params f32)

    @nn.compact
    def __call__(self, images, seg_maps, masks, update_sn: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        """images [B,H,W,3], seg_maps [B,H,W,n_classes], masks [B,H,W,1]."""
        nc = self.n_channel_base
        dt = self.dtype

        def sn(f, k, st, name):
            return SNConv(f, k, st, dtype=dt, name=name)

        feat11 = sn(nc, 3, 2, "enc1")(images * masks, update_sn)
        feat12 = sn(2 * nc, 3, 2, "enc2")(feat11, update_sn)
        feat13 = sn(4 * nc, 3, 2, "enc3")(feat12, update_sn)
        feat14 = sn(8 * nc, 3, 2, "enc4")(feat13, update_sn)
        feat15 = sn(8 * nc, 3, 2, "enc5")(feat14, update_sn)

        feat25 = sn(4 * nc, 1, 1, "lat5")(feat15, update_sn)
        feat24 = _up2x(feat25, feat14.shape) + sn(4 * nc, 1, 1,
                                                  "lat4")(feat14, update_sn)
        feat23 = _up2x(feat24, feat13.shape) + sn(4 * nc, 1, 1,
                                                  "lat3")(feat13, update_sn)
        feat22 = _up2x(feat23, feat12.shape) + sn(4 * nc, 1, 1,
                                                  "lat2")(feat12, update_sn)
        feat32 = sn(2 * nc, 3, 1, "final2")(feat22, update_sn)

        out_conv = nn.Conv(
            self.n_classes + 1, (1, 1), use_bias=True,
            kernel_init=torch_kaiming_uniform,
            bias_init=torch_bias_uniform(2 * nc),
            name="output",
        )
        pred = nn.leaky_relu(out_conv(feat32.astype(jnp.float32)),
                             negative_slope=0.2)
        label = smooth_interp(seg_maps * masks, feat32.shape[1:3])
        return {"pred": pred, "label": label}


def _up2x(x: jnp.ndarray, target_shape) -> jnp.ndarray:
    """Bilinear 2x upsample (align_corners=False), cropped/fit to the
    lateral feature's spatial dims."""
    B, H, W, C = x.shape
    th, tw = target_shape[1], target_shape[2]
    return jax.image.resize(x, (B, th, tw, C), method="bilinear")
