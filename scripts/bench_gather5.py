# -*- coding: utf-8 -*-
"""Quartered per-level hash gather: 4 gathers from 4.2MB static slices +
select vs one gather from the 16.8MB level table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather5.py
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

    L, Ml, C, R = 16, 524288, 8, 524288
    emb = jax.random.normal(jax.random.PRNGKey(0), (L, R, C))
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, Ml), 0, R)

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    def baseline(a, eps):
        tot = jnp.float32(0.0)
        for lvl in range(L):
            v = a[1][lvl][a[0][lvl] + eps.astype(jnp.int32)]
            tot += jnp.sum(v)
        return tot

    section("perlvl_full_ms", lambda: chain_time(baseline, (idx, emb)))

    def quartered(a, eps, Q=4):
        Rq = R // Q
        tot = jnp.float32(0.0)
        for lvl in range(L):
            ii = a[0][lvl] + eps.astype(jnp.int32)
            qq = ii // Rq
            loc = ii % Rq
            acc = jnp.zeros((Ml, C))
            for q in range(Q):
                v = a[1][lvl, q * Rq:(q + 1) * Rq][loc]
                acc = jnp.where((qq == q)[:, None], v, acc)
            tot += jnp.sum(acc)
        return tot

    section("perlvl_quartered_ms", lambda: chain_time(quartered, (idx, emb)))
    section("perlvl_eighth_ms", lambda: chain_time(
        lambda a, eps: quartered(a, eps, Q=8), (idx, emb)))

    # clamped variant: gather only in-range (clamp), avoids reading all
    # quarters... same gather count; included for completeness with Q=2
    section("perlvl_halved_ms", lambda: chain_time(
        lambda a, eps: quartered(a, eps, Q=2), (idx, emb)))


if __name__ == "__main__":
    main()
