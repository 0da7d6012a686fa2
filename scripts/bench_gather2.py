# -*- coding: utf-8 -*-
"""Gather rate vs table size + per-level slicing variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather2.py
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

    M = 16 * 32 * 16384  # 8.4M total queries
    C = 8

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    def g_step(a, eps):
        return jnp.sum(a[1][a[0] + eps.astype(jnp.int32)][:4096])

    for rows in (2048, 16384, 131072, 524288, 8388608):
        emb = jax.random.normal(jax.random.PRNGKey(0), (rows, C))
        idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, rows)
        section(f"rows_{rows}_ms", lambda e=emb, i=idx: chain_time(
            g_step, (i, e)))

    # per-level slicing: 16 gathers of 524288 queries each from a 16.8MB
    # slice (vs one global gather from 268MB)
    L, Ml, R = 16, 524288, 524288
    emb_g = jax.random.normal(jax.random.PRNGKey(0), (L * R, C))
    idx_l = jax.random.randint(jax.random.PRNGKey(1), (L, Ml), 0, R)

    def per_level(a, eps):
        tot = 0.0
        for lvl in range(L):
            sub = jax.lax.dynamic_slice(a[1], (lvl * R, 0), (R, C))
            tot += jnp.sum(sub[a[0][lvl] + eps.astype(jnp.int32)][:4096])
        return tot

    section("per_level_slices_ms", lambda: chain_time(per_level,
                                                      (idx_l, emb_g)))

    # batched gather: vmap over levels of [R, C] tables stacked [L, R, C]
    emb_s = emb_g.reshape(L, R, C)

    def batched(a, eps):
        out = jax.vmap(lambda t, i: t[i])(a[1],
                                          a[0] + eps.astype(jnp.int32))
        return jnp.sum(out[:, :4096])

    section("vmap_levels_ms", lambda: chain_time(batched, (idx_l, emb_s)))


if __name__ == "__main__":
    main()
