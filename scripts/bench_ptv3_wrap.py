# -*- coding: utf-8 -*-
"""Is the vmapped PointTransformerV3 slower than PTv3Single? Times both at
the BLDG recipe shape, plus the generator's full fwd minus rasterizer.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ptv3_wrap.py
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
    from gaussiancity_tpu.models import Generator
    from gaussiancity_tpu.models.ptv3 import PTv3Single, PointTransformerV3
    from gaussiancity_tpu.utils import helpers

    cfg = cfg_mod.bldg_recipe()
    net = cfg.network
    pcfg = net.ptv3
    N = cfg.train.max_points
    in_ch = 2 * 3 * net.sin_cos_freq_bends

    def section(name, fn):
        try:
            v = round(fn(), 2)
        except Exception as e:
            v = repr(e)[:160]
        print(f"{name:32s} {v}", flush=True)

    feat = jax.random.normal(jax.random.PRNGKey(0), (N, in_ch))
    coord = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                               minval=-1, maxval=1)
    valid = jnp.ones((N,), bool)

    single = PTv3Single(cfg=pcfg, in_channels=in_ch)
    sp = jax.jit(single.init)(jax.random.PRNGKey(2), feat, coord, valid)
    section("single_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(single.apply(a[0], a[1] + eps, a[2], a[3])),
        (sp, feat, coord, valid)))

    wrap = PointTransformerV3(cfg=pcfg, in_channels=in_ch)
    wp = jax.jit(wrap.init)(jax.random.PRNGKey(2), feat[None], coord[None],
                            valid[None])
    section("vmapped_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(wrap.apply(a[0], a[1] + eps, a[2], a[3])),
        (wp, feat[None], coord[None], valid[None])))

    # full generator fwd (no rasterizer)
    gen = Generator(cfg=net, n_classes=cfg.dataset.n_classes,
                    proj_size=cfg.dataset.proj_size)
    onehots = helpers.get_one_hot(jnp.full((1, N), 2, jnp.int32),
                                  cfg.dataset.n_classes)
    z = helpers.get_z(jax.random.PRNGKey(7),
                      jnp.full((1, N), 100, jnp.int32), net.z_dim)
    gp = jax.jit(gen.init)(jax.random.PRNGKey(3), None, coord[None], None,
                           onehots, z, None, None, valid[None])
    section("generator_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(gen.apply(
            a[0], None, a[1] + eps, None, a[2], a[3], None, None,
            a[4])["rgb"]),
        (gp, coord[None], onehots, z, valid[None])))


if __name__ == "__main__":
    main()
