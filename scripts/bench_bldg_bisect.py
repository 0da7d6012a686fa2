# -*- coding: utf-8 -*-
"""Bisect the BLDG generator forward: sincos, attr MLP (with z), ModLinear.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bldg_bisect.py
"""

import time


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
        GaussianAttrMLP, ModLinear, SinCosEncoder)
    from gaussiancity_tpu.utils import helpers

    cfg = cfg_mod.bldg_recipe()
    net = cfg.network
    N = cfg.train.max_points
    n_classes = cfg.dataset.n_classes
    in_dim = 2 * 3 * net.sin_cos_freq_bends + 64  # sincos + ptv3 out

    def section(name, fn):
        try:
            v = round(fn(), 2)
        except Exception as e:
            v = repr(e)[:160]
        print(f"{name:32s} {v}", flush=True)

    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (1, N, 3), minval=-1, maxval=1)

    sc = SinCosEncoder(net.sin_cos_freq_bends)
    scp = sc.init(rng, xyz)
    section("sincos_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(sc.apply(a[0], a[1] + eps)), (scp, xyz)))

    feat = jax.random.normal(rng, (1, N, in_dim))
    onehots = helpers.get_one_hot(jnp.full((1, N), 2, jnp.int32), n_classes)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, N, net.z_dim))

    mlp = GaussianAttrMLP(
        n_classes=n_classes, in_dim=in_dim, z_dim=net.z_dim,
        hidden_dim=net.mlp_hidden_dim,
        n_shared_layers=net.mlp_n_shared_layers,
        factors=dict(net.attr_factors), n_layers=dict(net.attr_n_layers))
    mp = jax.jit(mlp.init)(rng, feat, onehots, z)
    section("attr_mlp_z_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(mlp.apply(a[0], a[1] + eps, a[2],
                                         a[3])["rgb"]),
        (mp, feat, onehots, z)))

    ml = ModLinear(net.mlp_hidden_dim, net.mlp_hidden_dim, net.z_dim)
    x = jax.random.normal(rng, (1, N, net.mlp_hidden_dim))
    mlp_p = jax.jit(ml.init)(rng, x, z)
    section("modlinear_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(ml.apply(a[0], a[1] + eps, a[2])),
        (mlp_p, x, z)))


if __name__ == "__main__":
    main()
