# -*- coding: utf-8 -*-
"""Round-5: bisect blend.scatter_packed_grads (4.85 ms at the headline
shape — the largest rasterizer stage) and race alternatives.

Shape: M = grad_budget = 131072 compacted update rows x R = 16 channels,
keys in [0, N], N = 65536 Gaussians (~2 updates/row — LOW duplication,
unlike the hash-grid backward's 16x, so the sorted one-hot MXU pays
TR x M work for little dedup win).

Candidates:
  A. current MXU path (_reduce_rows_mxu)
  B. plain XLA .at[].add scatter (the r4 implementation)
  C. sort + row-gather + cumsum + merge-rank boundary diff (no scatter,
     no one-hot): out[n] = csum[start[n+1]] - csum[start[n]]
  D. MXU path with bigger tiles (fewer pallas programs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from _bench_util import chain_time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu.ops import hash_grid_bwd
    from gaussiancity_tpu.ops.rasterizer import blend

    M, R, N = 131072, 16, 65536
    rng = np.random.default_rng(0)
    # realistic key distribution: tile-major pages, keys random within
    # each tile (spatially-local Gaussians have arbitrary indices in the
    # bench scene), ~55% of rows valid
    keys = rng.integers(0, N, M).astype(np.int32)
    inval = rng.random(M) > 0.55
    keys[inval] = N
    rows = rng.normal(size=(M, R)).astype(np.float32)
    keys_d = jnp.asarray(keys)
    rows_d = jnp.asarray(rows)

    def section(name, fn, ref=None):
        try:
            out = jax.jit(fn)(keys_d, rows_d)
            out.block_until_ready()
            if ref is not None:
                err = float(jnp.max(jnp.abs(out - ref)))
                tag = f" maxerr {err:.2e}"
            else:
                tag = ""
            ms = [chain_time(
                lambda a, eps: jnp.sum(fn(a[0], a[1] + eps)),
                (keys_d, rows_d), repeats=4) for _ in range(2)]
            print(f"{name:28s} {min(ms):7.3f} ms "
                  f"(runs {[round(m, 2) for m in ms]}){tag}", flush=True)
            return out
        except Exception as e:
            print(f"{name:28s} FAIL {repr(e)[:160]}", flush=True)
            return None

    def xla_scatter(k, r):
        return jnp.zeros((N, R), jnp.float32).at[k].add(
            r, mode="drop")

    ref = jax.jit(xla_scatter)(keys_d, rows_d)
    ref.block_until_ready()

    section("B_xla_scatter", xla_scatter, ref)
    section("A_mxu_tr512_u1024",
            lambda k, r: blend._reduce_rows_mxu(k, r, N), ref)

    def mxu_sized(tr, u):
        def fn(k, r):
            return hash_grid_bwd.hash_grad_embeddings(
                k.reshape(1, 1, M), jnp.ones((1, 1, M), jnp.float32),
                r[None], n_rows=N, tile_sizes=(tr, u))[0]
        return fn

    for tr, u in ((512, 2048), (512, 4096), (256, 2048)):
        section(f"D_mxu_tr{tr}_u{u}", mxu_sized(tr, u), ref)

    def csum_merge(k, r):
        # sort keys, carry position; gather rows into sorted order
        pos = jnp.arange(M, dtype=jnp.int32)
        sk, sp = jax.lax.sort((k, pos), num_keys=1, is_stable=False)
        rs = r[sp]  # [M, R] row gather (~2 ns/row)
        # inclusive cumsum along rows; prepend zero row
        csum = jnp.concatenate(
            [jnp.zeros((1, R), jnp.float32), jnp.cumsum(rs, axis=0)])
        # boundaries via merge-rank (CLAUDE.md: never searchsorted over
        # many queries): query sentinel q with key 2q-1 sorts after all
        # real keys < q and before all >= q, so the inclusive prefix
        # count of real keys at its merged position is start[q]
        q = jnp.arange(N + 1, dtype=jnp.int32)
        mk = jnp.concatenate([sk * 2, q * 2 - 1])
        ident = jnp.arange(M + N + 1, dtype=jnp.int32)
        _, sid = jax.lax.sort((mk, ident), num_keys=1, is_stable=True)
        is_key = (sid < M).astype(jnp.int32)
        keys_before = jnp.cumsum(is_key)
        # compact query rows (stable: they stay in q order) to the front
        _, startv = jax.lax.sort((is_key, keys_before), num_keys=1,
                                 is_stable=True)
        start = startv[: N + 1]
        return csum[start[1:]] - csum[start[:-1]]

    section("C_csum_merge", csum_merge, ref)


if __name__ == "__main__":
    main()
