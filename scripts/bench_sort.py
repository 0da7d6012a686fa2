# -*- coding: utf-8 -*-
"""Batched lax.sort cost on chip: [16, 524288] int32 keys with k payload
channels — the building block for the sort-based hash-grid gather.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sort.py
"""

import time


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    L, M = 16, 524288
    keys = jax.random.randint(jax.random.PRNGKey(0), (L, M), 0, M)
    pays = [jax.random.normal(jax.random.PRNGKey(i + 1), (L, M))
            for i in range(8)]

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    def sort_k(n_pay):
        def step(a, eps):
            ks = a[0] + eps.astype(jnp.int32)
            out = lax.sort((ks,) + a[1:1 + n_pay], dimension=1, num_keys=1)
            return sum(jnp.sum(o[:, :128].astype(jnp.float32)) for o in out)
        return step

    section("sort_k0_ms", lambda: chain_time(sort_k(0), (keys,)))
    section("sort_k1_ms", lambda: chain_time(sort_k(1), (keys, pays[0])))
    section("sort_k2_ms", lambda: chain_time(sort_k(2), tuple([keys] + pays[:2])))
    section("sort_k8_ms", lambda: chain_time(sort_k(8), tuple([keys] + pays)))

    # 21-bit keys (hash rows): does key width matter?
    keys21 = keys % (1 << 19)
    section("sort_k1_19bit_ms", lambda: chain_time(
        sort_k(1), (keys21, pays[0])))

    # packed trick: (key << 10 | payload-bits)? single-array sort
    def sort_packed(a, eps):
        ks = a[0] + eps.astype(jnp.int32)
        out = lax.sort(ks, dimension=1)
        return jnp.sum(out[:, :128].astype(jnp.float32))

    section("sort_single_ms", lambda: chain_time(sort_packed, (keys,)))

    # existing bwd pipeline cost for reference: hash_grad_embeddings
    from gaussiancity_tpu.ops import hash_grid_bwd
    from gaussiancity_tpu.ops.hash_grid import level_params

    D, Lv, C, N, CN = 5, 16, 8, 16384, 32
    _, offsets, _, _, total = level_params(D, Lv, 16, 2048, 19)
    level_rows = [(list(offsets) + [total])[l + 1] - offsets[l]
                  for l in range(Lv)]
    idx = jax.random.randint(jax.random.PRNGKey(7), (Lv, CN, N), 0, M)
    idx = idx + jnp.asarray(offsets, jnp.int32)[:, None, None]
    w = jax.random.uniform(jax.random.PRNGKey(8), (Lv, CN, N))
    g_l = jax.random.normal(jax.random.PRNGKey(9), (Lv, N, C))

    def bwd_step(a, eps):
        d = hash_grid_bwd.hash_grad_embeddings(
            a[0], a[1] + eps, a[2], offsets, level_rows, total)
        return jnp.sum(d[:128])

    section("bwd_scatter_pipeline_ms", lambda: chain_time(
        bwd_step, (idx, w, g_l)))


if __name__ == "__main__":
    main()
