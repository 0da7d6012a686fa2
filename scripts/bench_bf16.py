# -*- coding: utf-8 -*-
"""Measure the train step with bf16 compute (f32 params/losses) vs f32,
both recipes, on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bf16.py
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.training.step import Trainer, make_train_step
    import bench as bench_mod

    for recipe in ("rest", "bldg"):
        for dt in ("float32", "bfloat16"):
            cfg = (cfg_mod.bldg_recipe() if recipe == "bldg"
                   else cfg_mod.rest_recipe())
            cfg = cfg.replace(
                dataset=cfg.dataset.replace(train_crop_size=(640, 448)),
                network=cfg.network.replace(compute_dtype=dt),
                train=cfg.train.replace(compute_dtype=dt),
                rasterizer=cfg.rasterizer.replace(backend="pallas"),
            )
            try:
                trainer = Trainer(cfg)
                batch = bench_mod.synthetic_rest_batch(
                    jax, jnp, cfg, cfg.train.max_points)
                state = trainer.init_state(jax.random.PRNGKey(0), batch)
                step = make_train_step(trainer)
                s = jax.block_until_ready(
                    step(state, batch, jax.random.PRNGKey(2)))[0]
                n = 6
                t0 = time.time()
                for i in range(n):
                    s, m = step(s, batch, jax.random.PRNGKey(3 + i))
                jax.block_until_ready((s, m))
                ms = (time.time() - t0) / n * 1e3
                gl = float(m["GenLoss"])
                print(f"{recipe} {dt}: {ms:.1f} ms  GenLoss={gl:.4f}",
                      flush=True)
            except Exception as e:
                print(f"{recipe} {dt}: {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
