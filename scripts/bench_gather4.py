# -*- coding: utf-8 -*-
"""Gather benchmarks, DCE-proof: every variant consumes the FULL gather
output via a fused jnp.sum (slicing the output lets XLA shrink the gather).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather4.py
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

    L, Ml, C = 16, 524288, 8
    M = L * Ml

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    # ---- single global gather, full consume
    for rows, dt in ((8388608, jnp.float32), (8388608, jnp.bfloat16),
                     (524288, jnp.float32), (131072, jnp.float32),
                     (16384, jnp.float32)):
        emb = jax.random.normal(jax.random.PRNGKey(0), (rows, C)).astype(dt)
        idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, rows)

        def step(a, eps):
            v = a[1][a[0] + eps.astype(jnp.int32)]
            return jnp.sum(v.astype(jnp.float32))

        tag = f"global_{rows}_{dt.__name__}"
        section(tag, lambda s=step, a=(idx, emb): chain_time(s, a))

    # ---- per-level (16 x 524288 queries), full consume
    for rows, dt in ((524288, jnp.float32), (524288, jnp.bfloat16),
                     (262144, jnp.bfloat16), (131072, jnp.float32)):
        emb = jax.random.normal(jax.random.PRNGKey(0),
                                (L, rows, C)).astype(dt)
        idx = jax.random.randint(jax.random.PRNGKey(1), (L, Ml), 0, rows)

        def step(a, eps):
            tot = jnp.float32(0.0)
            for lvl in range(L):
                v = a[1][lvl][a[0][lvl] + eps.astype(jnp.int32)]
                tot += jnp.sum(v.astype(jnp.float32))
            return tot

        tag = f"perlvl_{rows}_{dt.__name__}"
        section(tag, lambda s=step, a=(idx, emb): chain_time(s, a))


if __name__ == "__main__":
    main()
