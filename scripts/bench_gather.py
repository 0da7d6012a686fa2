# -*- coding: utf-8 -*-
"""Hash-grid gather formulation experiments on the real chip.

hash_encode's 8.4M row-gathers (L16 x 32 corners x 16k pts x 8ch) measure
121 ms fwd — the REST train step's dominant cost. This times isolated
variants to find the fast TPU formulation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather.py
"""

import time


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import chain_time  # noqa: E402


def _ct(ms, a, k_lo=1, k_hi=5):
    return chain_time(ms, a, k_lo, k_hi)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    L, CN, N, C = 16, 32, 16384, 8
    ROWS = 524288  # per-level table rows (2^19)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (L * ROWS, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, CN, N), 0, L * ROWS)

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    # 1. plain row gather [M] from [R, 8]
    section("rows_f32_ms", lambda: _ct(
        lambda a, eps: jnp.sum(a[1][a[0] + eps.astype(jnp.int32)][:, :2, :2, :]),
        (idx, emb)))

    # 2. bf16 table
    embh = emb.astype(jnp.bfloat16)
    section("rows_bf16_ms", lambda: _ct(
        lambda a, eps: jnp.sum(
            a[1][a[0] + eps.astype(jnp.int32)][:, :2, :2, :]
            .astype(jnp.float32)),
        (idx, embh)))

    # 3. transposed table, gather on minor axis [8, R][:, idx]
    embt = emb.T.copy()  # [8, R]
    section("cols_f32_ms", lambda: _ct(
        lambda a, eps: jnp.sum(
            a[1][:, a[0] + eps.astype(jnp.int32)][:, :, :2, :2]),
        (idx, embt)))

    # 4. take_along_axis formulation on flattened channel-major table
    # out[c, m] = embt[c, idx[m]]
    idx_flat = idx.reshape(1, -1)
    section("taa_cols_f32_ms", lambda: _ct(
        lambda a, eps: jnp.sum(jnp.take_along_axis(
            a[1], a[0] + eps.astype(jnp.int32), axis=1)[:, :128]),
        (jnp.broadcast_to(idx_flat, (C, idx_flat.shape[1])), embt)))

    # 5. wide rows: pack 16 channel-copies -> rows of 128 f32 (fewer,
    # lane-aligned gathers; 16x bytes). Table shrunk 16x to keep memory.
    emb128 = jax.random.normal(rng, (L * ROWS // 16, 128), jnp.float32)
    idx16 = idx // 16
    section("rows128_f32_ms", lambda: _ct(
        lambda a, eps: jnp.sum(
            a[1][a[0] + eps.astype(jnp.int32)][:, :2, :2, :]),
        (idx16, emb128)))

    # 6. one-hot MXU gather, 2^14-row table (config-shrunk alternative):
    # per level: onehot(idx) [CN*N, 2^14] @ table [2^14, 8]
    ROWS14 = 16384
    emb14 = jax.random.normal(rng, (ROWS14, C), jnp.bfloat16)
    idx14 = (idx[0] % ROWS14).reshape(-1)  # one level's worth

    def onehot_mm(a, eps):
        ii = a[0] + eps.astype(jnp.int32)
        oh = jax.nn.one_hot(ii, ROWS14, dtype=jnp.bfloat16)
        return jnp.sum((oh @ a[1]).astype(jnp.float32)[:256])

    section("onehot14_1level_ms", lambda: _ct(onehot_mm, (idx14, emb14)))

    # 7. sorted gather: sort indices first (locality), gather, unsort
    def sorted_gather(a, eps):
        ii = (a[0] + eps.astype(jnp.int32)).reshape(-1)
        si = jnp.argsort(ii)
        vals = a[1][ii[si]]
        return jnp.sum(vals[:128])

    section("sorted_rows_f32_ms", lambda: _ct(sorted_gather, (idx, emb)))

    # 8. the index computation alone (integer hash math, no gather)
    from gaussiancity_tpu.ops.hash_grid import _level_geometry

    x = jax.random.uniform(jax.random.PRNGKey(2), (N, 5), minval=-1, maxval=1)
    section("index_math_ms", lambda: _ct(
        lambda a, eps: jnp.sum(_level_geometry(
            a[0] + eps, 5, L, 16, 2048, 19, 1.0)[1][:, :, :128]),
        (x,)))


if __name__ == "__main__":
    main()
