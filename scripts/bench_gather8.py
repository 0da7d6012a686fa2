# -*- coding: utf-8 -*-
"""Full xor_perm formulation shootout (VERDICT r5 hash-grid collapse).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather8.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from _bench_util import chain_time

L, R, C = 16, 524288, 8
BLK = 256


def hi_gather(X, m):
    nb = R // BLK
    Xg = X.reshape(L, nb, BLK * C)
    rows = (jnp.arange(nb, dtype=jnp.int32)[None, :] ^ (m // BLK)[:, None])
    return jax.vmap(lambda x, r: x[r])(Xg, rows).reshape(L, nb, BLK, C)


def onehot(m, G):
    gi = jnp.arange(G, dtype=jnp.int32)
    return (gi[None, :, None] ^ m[:, None, None]
            == gi[None, None, :])  # [L, G, G] bool


def v_hilo_4d(X, m):
    Xh4 = hi_gather(X, m)
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)
    xh = Xh4.astype(jnp.bfloat16)
    xl = (Xh4 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lrgb,lgh->lrhb", xh, P,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrgb,lgh->lrhb", xl, P,
                        preferred_element_type=jnp.float32))
    return out.reshape(L, R, C)


def v_highest_4d(X, m):
    Xh4 = hi_gather(X, m)
    P = onehot(m % BLK, BLK).astype(jnp.float32)
    return jnp.einsum("lrgb,lgh->lrhb", Xh4, P,
                      precision=jax.lax.Precision.HIGHEST).reshape(L, R, C)


def v_hilo_pleft(X, m):
    Xh4 = hi_gather(X, m)
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)  # symmetric
    xh = Xh4.astype(jnp.bfloat16)
    xl = (Xh4 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lhg,lrgb->lrhb", P, xh,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lhg,lrgb->lrhb", P, xl,
                        preferred_element_type=jnp.float32))
    return out.reshape(L, R, C)


def v_flat_noC(X, m):
    # contract over a [BLK, BLK] one-hot with C folded into the ROW axis:
    # view rows as [L, R//BLK, BLK, C] -> move C next to r (transpose),
    # matmul [r*C, BLK] @ [BLK, BLK], transpose back
    Xh4 = hi_gather(X, m)  # [L, nb, BLK, C]
    Xt = Xh4.transpose(0, 1, 3, 2)  # [L, nb, C, BLK]
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)
    xh = Xt.astype(jnp.bfloat16)
    xl = (Xt - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lrcg,lgh->lrch", xh, P,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrcg,lgh->lrch", xl, P,
                        preferred_element_type=jnp.float32))
    return out.transpose(0, 1, 3, 2).reshape(L, R, C)


def main():
    X = jax.random.normal(jax.random.PRNGKey(0), (L, R, C)) * 0.1
    m = jnp.asarray(np.random.default_rng(0).integers(1, R, L), jnp.int32)

    # correctness spot-check vs direct gather on a slice
    want = jax.vmap(lambda x, mm: x[jnp.arange(4096) ^ mm])(X, m)
    for name, fn in (("hilo_4d", v_hilo_4d), ("highest_4d", v_highest_4d),
                     ("hilo_pleft", v_hilo_pleft), ("flat_noC", v_flat_noC)):
        got = fn(X, m)[:, :4096]
        err = float(jnp.max(jnp.abs(got - want)))
        ms = chain_time(lambda a, eps, f=fn: jnp.sum(f(a[0] + eps, a[1])),
                        (X, m), repeats=2)
        print(f"{name}: {ms:.3f} ms (max err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()


def v_barrier(X, m):
    Xh4 = jax.lax.optimization_barrier(hi_gather(X, m))
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)
    xh = Xh4.astype(jnp.bfloat16)
    xl = (Xh4 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lrgb,lgh->lrhb", xh, P,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrgb,lgh->lrhb", xl, P,
                        preferred_element_type=jnp.float32))
    return out.reshape(L, R, C)


def v_einsum_first(X, m):
    # inner and outer perms commute: matmul on the CONTIGUOUS table,
    # then block-gather the result
    X4 = X.reshape(L, R // BLK, BLK, C)
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)
    xh = X4.astype(jnp.bfloat16)
    xl = (X4 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lrgb,lgh->lrhb", xh, P,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrgb,lgh->lrhb", xl, P,
                        preferred_element_type=jnp.float32))
    return hi_gather(out.reshape(L, R, C), (m // BLK) * BLK).reshape(L, R, C)


def v_einsum_first_barrier(X, m):
    X4 = X.reshape(L, R // BLK, BLK, C)
    P = onehot(m % BLK, BLK).astype(jnp.bfloat16)
    xh = X4.astype(jnp.bfloat16)
    xl = (X4 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = (jnp.einsum("lrgb,lgh->lrhb", xh, P,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrgb,lgh->lrhb", xl, P,
                        preferred_element_type=jnp.float32))
    out = jax.lax.optimization_barrier(out)
    return hi_gather(out.reshape(L, R, C), (m // BLK) * BLK).reshape(L, R, C)


def main2():
    X = jax.random.normal(jax.random.PRNGKey(0), (L, R, C)) * 0.1
    m = jnp.asarray(np.random.default_rng(0).integers(1, R, L), jnp.int32)
    want = jax.vmap(lambda x, mm: x[jnp.arange(4096) ^ mm])(X, m)
    for name, fn in (("barrier", v_barrier),
                     ("einsum_first", v_einsum_first),
                     ("einsum_first_barrier", v_einsum_first_barrier)):
        got = fn(X, m)[:, :4096]
        err = float(jnp.max(jnp.abs(got - want)))
        ms = chain_time(lambda a, eps, f=fn: jnp.sum(f(a[0] + eps, a[1])),
                        (X, m), repeats=2)
        print(f"{name}: {ms:.3f} ms (max err {err:.2e})", flush=True)


if __name__ == "__main__":
    main2()
