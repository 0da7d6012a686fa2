# -*- coding: utf-8 -*-
"""Round-5 PTv3 index-machinery breakdown: subm_neighbors (k5 stem, k3
CPE at each stage size), serialization, pooling cluster build.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ptv3_idx2.py
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from _bench_util import chain_time
from gaussiancity_tpu.models import ptv3 as P
from gaussiancity_tpu.ops import serialization as ser

rng = np.random.default_rng(0)
for N in (16384, 4096, 1024):
    gc = jnp.asarray(rng.integers(0, 200, (N, 3)), jnp.int32)
    valid = jnp.ones((N,), bool)
    for k in ((5,) if N == 16384 else ()) + (3,):
        ms = chain_time(
            lambda a, eps, kk=k: sum(jnp.sum(t.astype(jnp.float32))
                                     for t in P.subm_neighbors(
                a[0] + eps.astype(jnp.int32), a[1], kk, 10)),
            (gc, valid), repeats=2)
        print(f"subm_neighbors N={N} k={k}: {ms:.2f} ms", flush=True)

N = 16384
coord = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
valid = jnp.ones((N,), bool)
orders = ("z", "z-trans", "hilbert", "hilbert-trans")
ms = chain_time(
    lambda a, eps: sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree_util.tree_leaves(ser.serialize(
        a[0] + eps, a[1], 0.01, orders, 10))),
    (coord, valid), repeats=2)
print(f"serialize 4 orders N={N}: {ms:.2f} ms", flush=True)

from gaussiancity_tpu.models.ptv3 import subm_neighbors_dense
for N in (16384,):
    gc = jnp.asarray(rng.integers(0, 200, (N, 3)), jnp.int32)
    valid = jnp.ones((N,), bool)
    for k in (5, 3):
        ms = chain_time(
            lambda a, eps, kk=k: sum(jnp.sum(t.astype(jnp.float32))
                                     for t in subm_neighbors_dense(
                a[0] + eps.astype(jnp.int32), a[1], kk, 10, 256)),
            (gc, valid), repeats=2)
        print(f"subm_neighbors_DENSE N={N} k={k}: {ms:.2f} ms", flush=True)
