# -*- coding: utf-8 -*-
"""Train-step time breakdown on the real chip: times each component of the
REST-recipe GAN step (generator fwd, rasterize fwd+bwd, D fwd, VGG fwd,
full fused step) pipelined, to direct optimization work.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_breakdown.py
"""

import time

import numpy as np


def timed(fn, args, n=10, fetch=None):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.training.step import Trainer, make_train_step
    import bench as bench_mod

    import os

    recipe = os.environ.get("BENCH_RECIPE", "rest")
    cfg = (cfg_mod.bldg_recipe() if recipe == "bldg"
           else cfg_mod.rest_recipe())
    cfg = cfg.replace(
        dataset=cfg.dataset.replace(train_crop_size=(640, 448)),
        rasterizer=cfg.rasterizer.replace(
            backend="pallas" if jax.default_backend() == "tpu" else "xla"),
    )
    trainer = Trainer(cfg)
    batch = bench_mod.synthetic_rest_batch(jax, jnp, cfg, cfg.train.max_points)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(2)

    res = {}

    def section(name, fn):
        try:
            res[name] = fn()
        except Exception as e:  # keep the rest of the breakdown alive
            res[name] = repr(e)[:120]
        print(f"{name:28s} {res[name]}", flush=True)


    # 2. generator forward only (with feature prep)
    def gen_fwd(g_params, g_stats, batch, r):
        feats = trainer._point_features(batch, r)
        img, _ = trainer._render_fake(g_params, batch, feats,
                                      g_stats=g_stats, train=False)
        return img

    f = jax.jit(gen_fwd)
    section("gen_fwd_raster_ms", lambda: timed(
        f, (state.g_params, state.g_stats, batch, rng)) * 1e3)

    # 3. generator fwd+bwd (render + L1 grad, no D/VGG)
    def gen_l1(g_params, g_stats, batch, r):
        feats = trainer._point_features(batch, r)
        img, _ = trainer._render_fake(g_params, batch, feats,
                                      g_stats=g_stats, train=False)
        return jnp.mean(jnp.abs(img - batch["rgb"]))

    g = jax.jit(jax.grad(gen_l1))
    section("gen_fwd_bwd_raster_ms", lambda: timed(
        g, (state.g_params, state.g_stats, batch, rng)) * 1e3)

    # 4. discriminator fwd
    if trainer.use_disc:
        def d_fwd(d_params, d_stats, batch):
            return trainer.discriminator.apply(
                {"params": d_params, "batch_stats": d_stats},
                batch["rgb"], batch["seg"], batch["msk"],
                mutable=["batch_stats"])[0]

        df = jax.jit(d_fwd)
        section("disc_fwd_ms", lambda: timed(
            df, (state.d_params, state.d_stats, batch)) * 1e3)

    # 5. VGG perceptual fwd
    pv = state.ploss_params
    pf = jax.jit(lambda a, b: trainer.ploss(pv, a, b))
    section("vgg_fwd_ms", lambda: timed(pf, (batch["rgb"], batch["rgb"])) * 1e3)

    # full fused step LAST: make_train_step donates the state
    def full_step():
        step = make_train_step(trainer)
        s = jax.block_until_ready(step(state, batch, rng))[0]
        n = 8
        t0 = time.time()
        for i in range(n):
            s, m = step(s, batch, jax.random.PRNGKey(3 + i))
        jax.block_until_ready((s, m))
        return (time.time() - t0) / n * 1e3

    section("full_step_ms", full_step)


if __name__ == "__main__":
    main()
