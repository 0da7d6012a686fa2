# -*- coding: utf-8 -*-
"""TR/U sweep of the sorted one-hot MXU scatter at the two flagship
update counts (r5: the kernel cost is max(program overhead ~ R/TR,
matmul FLOPs ~ TR*M); the r3 sweep only went DOWN from TR=512).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_hash_bwd2.py
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from _bench_util import chain_time
from gaussiancity_tpu.ops import hash_grid_bwd as hb

L, R, C = 16, 524288, 8
rng = np.random.default_rng(0)
for NC, N in ((32, 16384), (8, 16384), (8, 196608)):
    idx = jnp.asarray(rng.integers(0, R, (L, NC, N)), jnp.int32)
    w = jnp.asarray(rng.random((L, NC, N)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(L, N, C)), jnp.float32)
    for TR, U in ((512, 1024), (1024, 1024), (2048, 1024), (4096, 1024),
                  (2048, 2048), (4096, 2048)):
        ms = chain_time(
            lambda a, eps, t=(TR, U): jnp.sum(hb.hash_grad_embeddings(
                a[0], a[1] + eps, a[2], R, tile_sizes=t)),
            (idx, w, g), repeats=2)
        print(f"M={NC*N:>8} (NC={NC}, N={N}) TR={TR} U={U}: {ms:.1f} ms",
              flush=True)
