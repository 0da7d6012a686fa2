# -*- coding: utf-8 -*-
"""VGG perceptual loss (reference: losses/perceptual.py:16-235).

A Flax VGG19/VGG16 feature extractor with the reference's layer naming
(relu_3_1, relu_4_1, relu_5_1, ...), ImageNet renormalization from [-1, 1]
inputs, L1/L2 feature distance, and multi-scale evaluation.

The reference loads torchvision ImageNet weights.  This build has no
torchvision; weights are loaded from a ``.npz`` file (see
``load_vgg19_npz`` / ``convert_torch_state_dict``) pointed to by
``GAUSSIANCITY_VGG19_NPZ``, falling back to random init (documented: quality
parity requires the pretrained weights, training still runs without).

Layout: NHWC.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Conv plan: (out_channels, n_convs per stage) — VGG19 features
_VGG19_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class VGGFeatures(nn.Module):
    """VGG feature trunk emitting a dict of named relu activations
    (named like the reference's layer_name_mapping,
    losses/perceptual.py:195-214)."""

    stages: Tuple[Tuple[int, int], ...] = _VGG19_STAGES
    wanted: Tuple[str, ...] = ("relu_3_1", "relu_4_1", "relu_5_1")
    dtype: object = None  # compute dtype (weights stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        for si, (ch, n_convs) in enumerate(self.stages, start=1):
            for ci in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv_{si}_{ci}")(x)
                x = nn.relu(x)
                name = f"relu_{si}_{ci}"
                if name in self.wanted:
                    out[name] = x
                # Stop early once every wanted layer is collected.
                if len(out) == len(self.wanted):
                    return out
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return out


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] NHWC -> ImageNet-normalized (losses/perceptual.py:76-91)."""
    x01 = (x + 1.0) / 2.0
    return (x01 - _IMAGENET_MEAN) / _IMAGENET_STD


class PerceptualLoss:
    """Stateless-params perceptual loss wrapper.

    Usage::
        ploss = PerceptualLoss(layers=..., weights=...)
        params = ploss.init(rng)          # or ploss.load_npz(path)
        value = ploss(params, fake, real)  # NHWC in [-1, 1]
    """

    def __init__(
        self,
        network: str = "vgg19",
        layers: Sequence[str] = ("relu_3_1", "relu_4_1", "relu_5_1"),
        weights: Optional[Sequence[float]] = None,
        criterion: str = "l1",
        num_scales: int = 1,
        dtype=None,
    ):
        self.layers = tuple(layers)
        self.weights = tuple(weights) if weights is not None else (1.0,) * len(layers)
        assert len(self.layers) == len(self.weights)
        stages = _VGG19_STAGES if network == "vgg19" else _VGG16_STAGES
        self.model = VGGFeatures(stages=stages, wanted=self.layers,
                                 dtype=dtype)
        self.criterion = criterion
        self.num_scales = num_scales

    def init(self, rng, image_shape=(1, 64, 64, 3)):
        params = self.model.init(rng, jnp.zeros(image_shape))
        path = os.environ.get("GAUSSIANCITY_VGG19_NPZ")
        if path and os.path.exists(path):
            params = load_vgg19_npz(path, params)
        return params

    def __call__(self, params, inp, target, per_pixel_weight=None):
        loss = 0.0
        for scale in range(self.num_scales):
            fi = self.model.apply(params, normalize_imagenet(inp))
            ft = self.model.apply(params, normalize_imagenet(target))
            for layer, w in zip(self.layers, self.weights):
                diff = (fi[layer].astype(jnp.float32)
                        - jax.lax.stop_gradient(
                            ft[layer].astype(jnp.float32)))
                if self.criterion == "l1":
                    l_tmp = jnp.mean(jnp.abs(diff))
                else:
                    l_tmp = jnp.mean(diff ** 2)
                loss = loss + w * l_tmp
            if scale != self.num_scales - 1:
                inp = _downsample2x(inp)
                target = _downsample2x(target)
        return loss


def _downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch ``F.interpolate(scale_factor=0.5, bilinear,
    align_corners=False)``: at a half-pixel grid every output sample sits
    exactly between four inputs, so the op reduces to a 2x2 average pool
    (jax.image.resize would apply an antialias kernel instead)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def load_vgg19_npz(path: str, params):
    """Load conv weights from an npz with keys conv_{s}_{c}/kernel|bias
    (HWIO kernels) into the initialized param tree."""
    import flax

    data = np.load(path)
    flat = flax.traverse_util.flatten_dict(params)
    new = {}
    for kpath, v in flat.items():
        name = "/".join(str(p) for p in kpath if p not in ("params",))
        if name in data and data[name].shape == v.shape:
            new[kpath] = jnp.asarray(data[name])
        else:
            new[kpath] = v
    return flax.traverse_util.unflatten_dict(new)


def convert_torch_state_dict(state_dict, network: str = "vgg19") -> Dict[str, np.ndarray]:
    """Convert torchvision vgg features state_dict -> our npz key scheme.
    torch conv kernels are OIHW; flax wants HWIO."""
    stages = _VGG19_STAGES if network == "vgg19" else _VGG16_STAGES
    out = {}
    idx = 0
    for si, (ch, n_convs) in enumerate(stages, start=1):
        for ci in range(1, n_convs + 1):
            w = state_dict[f"features.{idx}.weight"]
            b = state_dict[f"features.{idx}.bias"]
            w = np.asarray(w).transpose(2, 3, 1, 0)
            out[f"conv_{si}_{ci}/kernel"] = w.astype(np.float32)
            out[f"conv_{si}_{ci}/bias"] = np.asarray(b).astype(np.float32)
            idx += 2  # conv + relu
        idx += 1  # maxpool
    return out
