# -*- coding: utf-8 -*-
"""r5: is the sorted one-hot kernel program-overhead bound?

Same M (8.4M updates), halving/quartering the table rows halves/quarters
the PROGRAM count (grid = (L, R/TR)) while the chunk count stays ~M/U —
if cost tracks programs, a merged multi-tile-per-program kernel with
double-buffered DMA is the win; if it tracks FLOPs (TR*M), the envelope
claim stands.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_hash_bwd3.py
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from _bench_util import chain_time
from gaussiancity_tpu.ops import hash_grid_bwd as hb

L, C = 16, 8
NC, N = 32, 16384
rng = np.random.default_rng(0)
w = jnp.asarray(rng.random((L, NC, N)), jnp.float32)
g = jnp.asarray(rng.normal(size=(L, N, C)), jnp.float32)
for R in (524288, 262144, 131072):
    idx = jnp.asarray(rng.integers(0, R, (L, NC, N)), jnp.int32)
    for TR, U in ((512, 1024), (512, 2048)):
        ms = [chain_time(
            lambda a, eps, t=(TR, U), R=R: jnp.sum(hb.hash_grad_embeddings(
                a[0], a[1] + eps, a[2], R, tile_sizes=t)),
            (idx, w, g), repeats=3) for _ in range(2)]
        print(f"R={R:>7} (programs {L * R // TR:>6}) TR={TR} U={U}: "
              f"{min(ms):6.1f} ms (runs {[round(m, 1) for m in ms]})",
              flush=True)
