# -*- coding: utf-8 -*-
"""PTv3 index-machinery costs on chip (coords VARY per iteration so
nothing hoists): serialization codes+orders, subm_neighbors (k3/k5),
pool_clusters, and PTv3 fwd with feat-only variation (machinery hoisted)
vs coord variation (machinery included).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ptv3_idx.py
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

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.models import ptv3 as p3
    from gaussiancity_tpu.ops import serialization as ser

    N = 16384

    def section(name, fn):
        try:
            v = round(fn(), 2)
        except Exception as e:
            v = repr(e)[:160]
        print(f"{name:32s} {v}", flush=True)

    rng = jax.random.PRNGKey(0)
    coord = jax.random.uniform(rng, (N, 3), minval=-1, maxval=1)
    valid = jnp.ones((N,), bool)
    grid = jnp.floor((coord - coord.min()) / 0.01).astype(jnp.int32)

    # serialization: codes + argsort orders (what PTv3Single computes)
    def ser_step(a, eps):
        out = ser.serialize(a[0] + eps, a[1], 0.01, ("cord",))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out[1:])

    section("serialize_argsort_ms", lambda: chain_time(
        ser_step, (coord, valid)))

    # subm_neighbors k3 / k5 on one grid
    for k in (3, 5):
        def nb_step(a, eps, k=k):
            g = (a[0] + eps.astype(jnp.int32))
            nb, found = p3.subm_neighbors(g, a[1], k)
            return (jnp.sum(nb.astype(jnp.float32))
                    + jnp.sum(found.astype(jnp.float32)))

        section(f"subm_neighbors_k{k}_ms", lambda s=nb_step: chain_time(
            s, (grid, valid)))

    # pool_clusters on sorted codes
    codes = ser.encode(grid, 0.01, "cord", 10)[None]
    order = jnp.argsort(codes[0])[None]

    def pool_step(a, eps):
        c = a[0] + eps.astype(jnp.int64 if a[0].dtype == jnp.int64
                              else jnp.int32)
        out = p3.pool_clusters(c, a[1], a[2], 2)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out[:4])

    section("pool_clusters_ms", lambda: chain_time(
        pool_step, (codes, order, valid)))

    # full PTv3: feat-varying (machinery hoisted) vs coord-varying
    cfg = cfg_mod.bldg_recipe()
    pcfg = cfg.network.ptv3
    in_ch = 60
    feat = jax.random.normal(rng, (N, in_ch))
    model = p3.PTv3Single(cfg=pcfg, in_channels=in_ch)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), feat, coord, valid)

    section("ptv3_featvary_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(model.apply(a[0], a[1] + eps, a[2], a[3])),
        (params, feat, coord, valid)))
    section("ptv3_coordvary_fwd_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(model.apply(a[0], a[1], a[2] + eps, a[3])),
        (params, feat, coord, valid)))


if __name__ == "__main__":
    main()
