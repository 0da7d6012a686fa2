# -*- coding: utf-8 -*-
"""Decompose the hash-grid backward at the REST shape: sort, g-gather,
payload packing, pallas MXU scatter, d_inputs chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_hash_bwd.py
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

    from gaussiancity_tpu.ops import hash_grid_bwd
    from gaussiancity_tpu.ops.hash_grid import (
        _corner_weights, _level_geometry, hash_encode, table_shape)

    D, L, C, N = 5, 16, 8, 16384
    base, desired, lg = 16, 2048, 19
    NC = 1 << D
    M = NC * N
    R = table_shape(D, L, base, desired, lg, C)[1]

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N, D), minval=-1, maxval=1)
    idx, frac, oob, _ = _level_geometry(x, D, L, base, desired, lg, 1.0)
    w = _corner_weights(frac, D)
    g_l = jax.random.normal(jax.random.PRNGKey(1), (L, N, C))

    def section(name, fn):
        try:
            v = round(fn(), 2)
        except Exception as e:
            v = repr(e)[:160]
        print(f"{name:32s} {v}", flush=True)

    # full d_emb pipeline
    section("d_emb_full_ms", lambda: chain_time(
        lambda a, eps: jnp.sum(hash_grid_bwd.hash_grad_embeddings(
            a[0], a[1] + eps, a[2], R)[:, :64]),
        (idx, w, g_l)))

    # sort alone (keys + pos + w)
    keys = idx.reshape(L, M)
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (L, M))

    def sort_step(a, eps):
        out = lax.sort((a[0], pos, a[1].reshape(L, M) + eps),
                       dimension=1, num_keys=1)
        return sum(jnp.sum(o[:, :128].astype(jnp.float32)) for o in out)

    section("sort_k2_ms", lambda: chain_time(sort_step, (keys, w)))

    # g-row gather + payload build (post-sort steps up to uaug)
    sk, sp, sw = lax.sort((keys, pos, w.reshape(L, M)), dimension=1,
                          num_keys=1)

    def payload_step(a, eps):
        n_sorted = a[0] % N
        g_sorted = jnp.stack([(a[1] + eps)[lvl][n_sorted[lvl]]
                              for lvl in range(L)])
        u_sorted = a[2][:, :, None] * g_sorted
        uT = u_sorted.transpose(0, 2, 1)
        return jnp.sum(uT[:, :, :128])

    section("g_gather_payload_ms", lambda: chain_time(
        payload_step, (sp, g_l, sw)))

    # d_inputs chain (the non-emb half of the custom bwd)
    out, res = jax.vjp(
        lambda xx, ee: hash_encode(xx, ee, D, L, base, desired, lg), x,
        jax.random.normal(jax.random.PRNGKey(2), (L, R, C)) * 0.1)

    # isolate: full hash bwd vs d_emb -> d_inputs ~ difference
    g_out = jax.random.normal(jax.random.PRNGKey(3), (N, L * C))
    section("full_vjp_bwd_ms", lambda: chain_time(
        lambda a, eps: sum(jnp.sum(t) for t in res(a[0] + eps)),
        (g_out,)))


if __name__ == "__main__" and not __import__("os").environ.get("SWEEP"):
    main()


def sweep():
    """Sweep scatter-kernel (TR, U) tile sizes via monkeypatch."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu.ops import hash_grid_bwd
    from gaussiancity_tpu.ops.hash_grid import (
        _corner_weights, _level_geometry, table_shape)

    D, L, C, N = 5, 16, 8, 16384
    base, desired, lg = 16, 2048, 19
    R = table_shape(D, L, base, desired, lg, C)[1]
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (N, D), minval=-1, maxval=1)
    idx, frac, oob, _ = _level_geometry(x, D, L, base, desired, lg, 1.0)
    w = _corner_weights(frac, D)
    g_l = jax.random.normal(jax.random.PRNGKey(1), (L, N, C))

    for tr, u in ((512, 512), (256, 512), (1024, 512), (512, 1024),
                  (256, 1024), (128, 512)):
        hash_grid_bwd.TR_TPU, hash_grid_bwd.U_TPU = tr, u
        try:
            v = round(chain_time(
                lambda a, eps: jnp.sum(hash_grid_bwd.hash_grad_embeddings(
                    a[0], a[1] + eps, a[2], R)[:, :64]),
                (idx, w, g_l)), 2)
        except Exception as e:
            v = repr(e)[:120]
        print(f"TR={tr} U={u}: {v}", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("SWEEP"):
    sweep()
