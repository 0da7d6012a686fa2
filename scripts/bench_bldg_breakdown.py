# -*- coding: utf-8 -*-
"""BLDG-recipe breakdown: full GAN step, PTv3 fwd / fwd+bwd at 16k points,
and PTv3 sub-pieces (stem conv, one attention stage) on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bldg_breakdown.py
"""

import time

import numpy as np


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.models.ptv3 import PTv3Single, PointTransformerV3
    from gaussiancity_tpu.training.step import Trainer, make_train_step
    import bench as bench_mod

    cfg = cfg_mod.bldg_recipe()
    cfg = cfg.replace(
        dataset=cfg.dataset.replace(train_crop_size=(640, 448)),
        rasterizer=cfg.rasterizer.replace(
            backend="pallas" if jax.default_backend() == "tpu" else "xla"),
    )
    N = cfg.train.max_points

    res = {}

    def section(name, fn):
        try:
            res[name] = round(fn(), 2)
        except Exception as e:
            res[name] = repr(e)[:160]
        print(f"{name:32s} {res[name]}", flush=True)

    # --- PTv3 alone at 16k points (bldg feature dim: sin_cos of 3 dims)
    pcfg = cfg.network.ptv3
    in_ch = 2 * 3 * cfg.network.sin_cos_freq_bends  # sin/cos encoding dim
    feat = jax.random.normal(jax.random.PRNGKey(0), (N, in_ch))
    coord = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                               minval=-1, maxval=1)
    valid = jnp.ones((N,), bool)
    model = PTv3Single(cfg=pcfg, in_channels=in_ch)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), feat, coord, valid)

    def p_fwd(a, eps):
        out = model.apply(a[0], a[1] + eps, a[2], a[3])
        return jnp.sum(out)

    section("ptv3_fwd_ms", lambda: chain_time(
        p_fwd, (params, feat, coord, valid)))

    def p_bwd(a, eps):
        g = jax.grad(lambda f: jnp.sum(
            model.apply(a[0], f, a[2], a[3]) ** 2))(a[1] + eps)
        return jnp.sum(g)

    section("ptv3_fwd_bwd_ms", lambda: chain_time(
        p_bwd, (params, feat, coord, valid)))

    # --- full BLDG GAN step
    trainer = Trainer(cfg)
    batch = bench_mod.synthetic_rest_batch(jax, jnp, cfg, N)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = make_train_step(trainer)
    s = jax.block_until_ready(step(state, batch, jax.random.PRNGKey(2)))[0]
    n = 5
    t0 = time.time()
    for i in range(n):
        s, m = step(s, batch, jax.random.PRNGKey(3 + i))
    jax.block_until_ready((s, m))
    print(f"{'bldg_full_step_ms':32s} {(time.time() - t0) / n * 1e3:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
