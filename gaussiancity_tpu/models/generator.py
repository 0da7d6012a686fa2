# -*- coding: utf-8 -*-
"""Gaussian-attribute generator models (Flax).

TPU-native re-design of the reference generator stack
(reference: models/generator.py:18-536):

- ``Generator``: (optional GLOBAL/LOCAL scene encoder) -> positional
  encoding (hash-grid or sin/cos) -> (optional PTv3 backbone) ->
  style-modulated per-attribute MLP.
- ``ModLinear``: StyleGAN2-style affine modulation.  The reference loops
  over instances with a python dict of z codes
  (models/generator.py:395-400); here modulation is **dense**: a per-point
  style vector (gathered once from an instance-indexed z table) drives an
  elementwise input modulation, turning the per-instance bmm loop into one
  big MXU matmul:  y = (x * alpha(z)) @ W^T + b + beta(z).

Layout: images are NHWC (TPU-native), points are [B, N, C] padded with a
validity mask.  Parameter init follows torch defaults (kaiming-uniform
fan-in, a=sqrt(5)) so training dynamics match the reference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaussiancity_tpu.config import GaussianNetworkConfig
from gaussiancity_tpu.ops.hash_grid import GridEncoder


# ---------------------------------------------------------------------------
# torch-style initializers (parity with torch.nn.Linear/Conv2d defaults)
# ---------------------------------------------------------------------------


def torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) over fan_in — torch Linear/Conv default.

    shape: flax kernel layouts — Linear (in, out); Conv (kh, kw, in, out).
    """
    if len(shape) == 2:
        fan_in = shape[0]
    else:
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_uniform(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def TorchLinear(features: int, use_bias: bool = True, name: Optional[str] = None,
                fan_in: Optional[int] = None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(fan_in) if fan_in else nn.initializers.zeros,
        name=name,
    )


class TorchDense(nn.Module):
    """Dense with full torch default init (bias bound from actual fan_in).

    ``dtype`` is the compute dtype (params stay f32): inputs and the
    kernel are cast before the matmul, so on TPU a bf16 dtype runs the
    MXU at double rate with f32 accumulation.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_uniform,
                            (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_bias_uniform(fan_in),
                              (self.features,))
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class TorchConv(nn.Module):
    """NHWC conv with torch default init and torch padding semantics.

    Default padding is the symmetric ``k // 2`` per side that every
    reference conv uses (``padding=k//2`` in torch).  This must stay
    explicit: XLA "SAME" pads (0, 1) for stride-2 even inputs where torch
    pads (1, 1) — same output size, shifted taps (weight-parity breaker).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = None  # None => torch-style ((k//2, k//2), ...)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        padding = self.padding
        if padding is None:
            padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        fan_in = x.shape[-1] * kh * kw
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform,
            bias_init=torch_bias_uniform(fan_in),
        )
        return conv(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k, s, p) with exact torch semantics: dilate the
    input by the stride, pad ``k - 1 - p`` per side, correlate with the
    spatially-flipped kernel.  Kernel layout (kh, kw, in, out); torch init
    (ConvTranspose2d fan_in = out_channels * kh * kw)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.features * kh * kw
        bound = math.sqrt(3.0 / fan_in)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (kh, kw, x.shape[-1], self.features),
        )
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel[::-1, ::-1],
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_uniform(fan_in),
                              (self.features,))
            y = y + bias
        return y


def leaky_relu(x, slope=0.2):
    return nn.leaky_relu(x, negative_slope=slope)


# ---------------------------------------------------------------------------
# Scene encoders (reference: models/generator.py:111-288)
# ---------------------------------------------------------------------------


class SRTConvBlock(nn.Module):
    """conv3x3(s1) -> ReLU -> conv3x3(s2, 2x channels) -> ReLU
    (reference: models/generator.py:188-218)."""

    hidden_channels: Optional[int] = None
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_channels or x.shape[-1]
        out = self.out_channels or 2 * hidden
        x = TorchConv(hidden, (3, 3), (1, 1), use_bias=False)(x)
        x = nn.relu(x)
        x = TorchConv(out, (3, 3), (2, 2), use_bias=False)(x)
        return nn.relu(x)


class GlobalEncoder(nn.Module):
    """Scene-level conditioning vector (reference: models/generator.py:111-146).

    Input: proj_hf [B, H, W, 1], proj_seg [B, H, W, n_classes] (NHWC).
    Output: [B, out_channels] in (-1, 1).
    """

    n_blocks: int
    out_channels: int

    @nn.compact
    def __call__(self, proj_hf, proj_seg):
        hf = leaky_relu(TorchConv(8, (3, 3), (2, 2))(proj_hf))
        seg = leaky_relu(TorchConv(8, (3, 3), (2, 2))(proj_seg))
        out = jnp.concatenate([hf, seg], axis=-1)
        for _ in range(1, self.n_blocks):
            out = leaky_relu(SRTConvBlock()(out))
        out = jnp.mean(out.reshape(out.shape[0], -1, out.shape[-1]), axis=1)
        cond = leaky_relu(TorchDense(16)(out))
        return jnp.tanh(TorchDense(self.out_channels)(cond))


class ResConvBlock(nn.Module):
    """Pre-norm residual conv block with channel-concat trunk
    (reference: models/generator.py:221-288)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.out_channels
        gn = lambda: nn.GroupNorm(num_groups=32, epsilon=1e-5)  # torch eps
        residual = x
        out1 = nn.relu(gn()(x))
        out1 = TorchConv(cout // 2, (3, 3), use_bias=False)(out1)
        out2 = nn.relu(gn()(out1))
        out2 = TorchConv(cout // 4, (3, 3), use_bias=False)(out2)
        out3 = nn.relu(gn()(out2))
        out3 = TorchConv(cout // 4, (3, 3), use_bias=False)(out3)
        out3 = jnp.concatenate([out1, out2, out3], axis=-1)
        if cin != cout:
            residual = nn.relu(gn()(residual))
            residual = TorchConv(cout, (1, 1), use_bias=False)(residual)
        return out3 + residual


class LocalEncoder(nn.Module):
    """Per-pixel conditioning feature map, sampled at proj_uv by the caller
    (reference: models/generator.py:149-185). NHWC in/out."""

    out_channels: int

    @nn.compact
    def __call__(self, proj_hf, proj_seg):
        hf = TorchConv(32, (7, 7), (2, 2))(proj_hf)
        seg = TorchConv(32, (7, 7), (2, 2))(proj_seg)
        out = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5)(
            jnp.concatenate([hf, seg], axis=-1)))
        out = ResConvBlock(128)(out)
        out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        out = ResConvBlock(256)(out)
        out = ResConvBlock(512)(out)
        out = TorchConvTranspose(128, (4, 4), (2, 2), (1, 1))(out)
        out = TorchConvTranspose(32, (4, 4), (2, 2), (1, 1))(out)
        out = TorchConv(self.out_channels, (1, 1))(out)
        return jnp.tanh(out)


def grid_sample_uv(feat_nhwc: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [B, H, W, C] at uv in [-1, 1] ([B, N, 2]),
    align_corners=True — matches F.grid_sample in the reference
    (models/generator.py:85-89)."""
    B, H, W, C = feat_nhwc.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def gather(yi, xi):
        return jax.vmap(lambda f, yy, xx: f[yy, xx])(feat_nhwc, yi, xi)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


# ---------------------------------------------------------------------------
# Positional encoders
# ---------------------------------------------------------------------------


class SinCosEncoder(nn.Module):
    """NeRF-style frequency encoding (reference: models/generator.py:291-307)."""

    n_freq_bands: int = 8

    @nn.compact
    def __call__(self, features):
        freq = 2.0 ** jnp.arange(self.n_freq_bands, dtype=jnp.float32)
        sin = jnp.concatenate(
            [jnp.sin(features * fb) for fb in freq], axis=-1)
        cos = jnp.concatenate(
            [jnp.cos(features * fb) for fb in freq], axis=-1)
        return jnp.concatenate([sin, cos], axis=-1)


# ---------------------------------------------------------------------------
# Style-modulated MLP (reference: models/generator.py:310-536)
# ---------------------------------------------------------------------------


class ModLinear(nn.Module):
    """Affine-modulated linear (StyleGAN2 mod, output_mode=True, mod_bias):
    y = (x * alpha(z)) @ W^T + bias + beta(z), with alpha/beta linear in z
    (reference: models/generator.py:433-536).  Densely vectorized over
    points: z is per-point [.., Cz]."""

    in_features: int
    out_features: int
    style_features: int
    use_bias: bool = False
    weight_gain: float = 1.0
    bias_init_val: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, z):
        wg = self.weight_gain / math.sqrt(self.in_features)
        weight = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) * wg,
            (self.out_features, self.in_features),
        )
        weight_alpha = self.param(
            "weight_alpha",
            lambda k, s: jax.random.normal(k, s) / math.sqrt(self.style_features),
            (self.in_features, self.style_features),
        )
        bias_alpha = self.param(
            "bias_alpha", lambda k, s: jnp.ones(s), (self.in_features,)
        )
        weight_beta = self.param(
            "weight_beta",
            lambda k, s: jax.random.normal(k, s) / math.sqrt(self.style_features),
            (self.out_features, self.style_features),
        )
        bias_beta = self.param(
            "bias_beta", lambda k, s: jnp.zeros(s), (self.out_features,)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            z = z.astype(self.dtype)
            weight, weight_alpha, bias_alpha, weight_beta, bias_beta = (
                a.astype(self.dtype)
                for a in (weight, weight_alpha, bias_alpha, weight_beta,
                          bias_beta))
        alpha = z @ weight_alpha.T + bias_alpha  # [..., I]
        beta = z @ weight_beta.T + bias_beta  # [..., O]
        y = (x * alpha) @ weight.T + beta
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jnp.full(s, self.bias_init_val),
                (self.out_features,),
            )
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class GaussianAttrMLP(nn.Module):
    """Per-attribute MLP with class-onehot embedding and optional style
    modulation (reference: models/generator.py:310-431).

    forward(pt_feat [B,N,F], onehots [B,N,n_classes], z [B,N,z_dim] or None)
    -> dict attr -> [B,N,3|1].
    """

    n_classes: int
    in_dim: int
    z_dim: Optional[int]
    hidden_dim: int
    n_shared_layers: int
    factors: Mapping[str, float]
    n_layers: Mapping[str, int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pt_feat, onehots, z):
        act = leaky_relu
        f = TorchDense(self.hidden_dim, name="fc_1",
                       dtype=self.dtype)(pt_feat)
        f = f + TorchDense(self.hidden_dim, use_bias=False,
                           name="fc_m_a", dtype=self.dtype)(onehots)
        f = act(f)

        def layer(name):
            if self.z_dim is not None:
                return lambda x: ModLinear(
                    self.hidden_dim, self.hidden_dim, self.z_dim,
                    use_bias=False, name=name, dtype=self.dtype,
                )(x, z)
            return TorchDense(self.hidden_dim, name=name, dtype=self.dtype)

        for i in range(2, self.n_shared_layers + 1):
            f = act(layer(f"fc_{i}")(f))

        output: Dict[str, jnp.ndarray] = {}
        for k in self.factors.keys():
            assert k in ("xyz", "rgb", "scale", "opacity"), f"Unknown key: {k}"
            _f = f
            for i in range(self.n_layers[k]):
                fc = layer(f"fc_{self.n_shared_layers + 1}_{k}_{i}")
                # NOTE: faithful to the reference quirk — without z the
                # attribute layers re-consume the shared feature ``f``
                # rather than chaining (models/generator.py:414).
                _f = act(fc(_f) if self.z_dim is not None else fc(f))
            out_dim = 1 if k == "opacity" else 3
            # output heads + squashing in f32: the rasterizer consumes
            # these directly and position/scale precision matters
            output[k] = TorchDense(out_dim, name=f"fc_out_{k}")(
                _f.astype(jnp.float32))

        # attribute squashing (reference: models/generator.py:419-428)
        if "xyz" in self.factors:
            output["xyz"] = (nn.sigmoid(output["xyz"]) - 0.5) * self.factors["xyz"]
        if "rgb" in self.factors:
            output["rgb"] = (nn.sigmoid(output["rgb"]) - 0.5) * self.factors["rgb"]
        if "scale" in self.factors:
            output["scale"] = 1 + jnp.clip(output["scale"], -1, 1) * self.factors["scale"]
        if "opacity" in self.factors:
            fo = self.factors["opacity"]
            output["opacity"] = nn.sigmoid(output["opacity"]) * fo + (1 - fo)
        return output


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


class Generator(nn.Module):
    """Full generator (reference: models/generator.py:18-108).

    __call__(proj_uv [B,N,2], rel_xyz [B,N,3], batch_idx [B,N], onehots
    [B,N,n_classes], z [B,N,z_dim]|None, proj_hf [B,H,W,1]|None, proj_seg
    [B,H,W,n_classes]|None, point_mask [B,N]) -> dict of attrs.
    """

    cfg: GaussianNetworkConfig
    n_classes: int
    proj_size: int

    @nn.compact
    def __call__(self, proj_uv, rel_xyz, batch_idx, onehots, z,
                 proj_hf=None, proj_seg=None, point_mask=None,
                 train: bool = False):
        cfg = self.cfg
        B, N = rel_xyz.shape[:2]
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        if cfg.encoder == "GLOBAL":
            proj_feat = GlobalEncoder(
                cfg.global_encoder_n_blocks, cfg.encoder_out_dim - 3,
                name="proj_encoder",
            )(proj_hf, proj_seg)
            pt_feat = jnp.broadcast_to(
                proj_feat[:, None, :], (B, N, proj_feat.shape[-1])
            )
        elif cfg.encoder == "LOCAL":
            fmap = LocalEncoder(cfg.encoder_out_dim - 3,
                                name="proj_encoder")(proj_hf, proj_seg)
            pt_feat = grid_sample_uv(fmap, proj_uv)
        elif cfg.encoder is None:
            assert cfg.encoder_out_dim == 3
            pt_feat = jnp.zeros((B, N, 0), dtype=rel_xyz.dtype)
        else:
            raise ValueError(f"Unknown encoder: {cfg.encoder}")

        pt_feat = jnp.concatenate([pt_feat, rel_xyz], axis=-1)

        if cfg.pos_emd == "HASH_GRID":
            pos_encoder = GridEncoder(
                in_channels=cfg.encoder_out_dim,
                n_levels=cfg.hash_grid_n_levels,
                lvl_channels=cfg.hash_grid_level_dim,
                desired_resolution=self.proj_size,
                base_resolution=cfg.hash_grid_base_res,
                log2_hashmap_size=cfg.hash_grid_map_size,
                # GLOBAL broadcasts one scene code to every point, so the
                # leading encoder dims are per-sample constants — enables
                # the table-collapse fast path (ops/hash_grid.py)
                n_const_dims=(cfg.encoder_out_dim - 3
                              if cfg.encoder == "GLOBAL" else 0),
                name="pos_encoder",
            )
            pt_feat1 = pos_encoder(pt_feat)
        elif cfg.pos_emd == "SIN_COS":
            pt_feat1 = SinCosEncoder(cfg.sin_cos_freq_bends,
                                     name="pos_encoder")(pt_feat)
        else:
            raise ValueError(f"Unknown positional encoder: {cfg.pos_emd}")

        feat_dim = pt_feat1.shape[-1]
        if cfg.ptv3.enabled:
            from gaussiancity_tpu.models.ptv3 import PointTransformerV3

            pt_feat2 = PointTransformerV3(cfg.ptv3, in_channels=feat_dim,
                                          dtype=dt, name="pt_net")(
                pt_feat1, rel_xyz, point_mask, train
            )
            pt_feat1 = jnp.concatenate(
                [pt_feat1.astype(pt_feat2.dtype), pt_feat2], axis=-1)

        return GaussianAttrMLP(
            n_classes=self.n_classes,
            in_dim=pt_feat1.shape[-1],
            z_dim=cfg.z_dim,
            hidden_dim=cfg.mlp_hidden_dim,
            n_shared_layers=cfg.mlp_n_shared_layers,
            factors=dict(cfg.attr_factors),
            n_layers=dict(cfg.attr_n_layers),
            dtype=dt,
            name="ga_mlp",
        )(pt_feat1, onehots, z)
