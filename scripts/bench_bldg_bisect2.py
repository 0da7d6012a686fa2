# -*- coding: utf-8 -*-
"""Bisect the exact BLDG Generator wiring: same modules, same dims,
truncated after each stage.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bldg_bisect2.py
"""

import time
from typing import Any, Optional

import flax.linen as nn


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.models.generator import (
        GaussianAttrMLP, SinCosEncoder)
    from gaussiancity_tpu.models.ptv3 import PointTransformerV3
    from gaussiancity_tpu.utils import helpers

    cfg = cfg_mod.bldg_recipe()
    net = cfg.network
    N = cfg.train.max_points
    n_classes = cfg.dataset.n_classes

    class GenTrunc(nn.Module):
        stage: int  # 1=sincos, 2=+ptv3, 3=+mlp

        @nn.compact
        def __call__(self, rel_xyz, onehots, z, mask):
            B, Np = rel_xyz.shape[:2]
            pt_feat = jnp.concatenate(
                [jnp.zeros((B, Np, 0), rel_xyz.dtype), rel_xyz], axis=-1)
            pt_feat1 = SinCosEncoder(net.sin_cos_freq_bends,
                                     name="pos_encoder")(pt_feat)
            if self.stage == 1:
                return pt_feat1
            pt_feat2 = PointTransformerV3(
                net.ptv3, in_channels=pt_feat1.shape[-1], name="pt_net")(
                pt_feat1, rel_xyz, mask, False)
            pt_feat1 = jnp.concatenate(
                [pt_feat1.astype(pt_feat2.dtype), pt_feat2], axis=-1)
            if self.stage == 2:
                return pt_feat1
            return GaussianAttrMLP(
                n_classes=n_classes, in_dim=pt_feat1.shape[-1],
                z_dim=net.z_dim, hidden_dim=net.mlp_hidden_dim,
                n_shared_layers=net.mlp_n_shared_layers,
                factors=dict(net.attr_factors),
                n_layers=dict(net.attr_n_layers), name="ga_mlp",
            )(pt_feat1, onehots, z)["rgb"]

    rng = jax.random.PRNGKey(0)
    rel_xyz = jax.random.uniform(rng, (1, N, 3), minval=-1, maxval=1)
    onehots = helpers.get_one_hot(jnp.full((1, N), 2, jnp.int32), n_classes)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, N, net.z_dim))
    mask = jnp.ones((1, N), bool)

    for stage in (1, 2, 3):
        m = GenTrunc(stage=stage)
        p = jax.jit(m.init)(rng, rel_xyz, onehots, z, mask)

        def step(a, eps, m=m):
            return jnp.sum(m.apply(a[0], a[1] + eps, a[2], a[3], a[4]))

        try:
            v = round(chain_time(step, (p, rel_xyz, onehots, z, mask)), 2)
        except Exception as e:
            v = repr(e)[:160]
        print(f"stage{stage}_fwd_ms {v}", flush=True)


if __name__ == "__main__":
    main()
