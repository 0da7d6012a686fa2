# -*- coding: utf-8 -*-
"""Channel-major xor_perm: transpose cost + lane-axis matmul formulation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather9.py
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
LANE = 128


def perm_cm(Xc, m):
    """Channel-major [L, C, R] xor-perm by m [L]."""
    nb = R // LANE
    # high bits: gather whole 128-lane groups (rows of [128])
    Xg = Xc.reshape(L, C * nb, LANE)
    rows_hi = (jnp.arange(nb, dtype=jnp.int32)[None, :]
               ^ (m // LANE)[:, None])  # [L, nb]
    # per (l, c) the same block perm: index [L, C*nb]
    idx = (jnp.arange(C, dtype=jnp.int32)[None, :, None] * nb
           + rows_hi[:, None, :]).reshape(L, C * nb)
    Xh = jax.vmap(lambda x, r: x[r])(Xg, idx)  # [L, C*nb, 128]
    # low 7 bits: one-hot matmul on the lane axis
    gi = jnp.arange(LANE, dtype=jnp.int32)
    P = (gi[None, :, None] ^ (m % LANE)[:, None, None]
         == gi[None, None, :])
    xh = Xh.astype(jnp.bfloat16)
    xl = (Xh - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    Pb = P.astype(jnp.bfloat16)
    out = (jnp.einsum("lrg,lgh->lrh", xh, Pb,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("lrg,lgh->lrh", xl, Pb,
                        preferred_element_type=jnp.float32))
    return out.reshape(L, C, R)


def main():
    X = jax.random.normal(jax.random.PRNGKey(0), (L, R, C)) * 0.1
    Xc = jnp.asarray(np.moveaxis(np.asarray(X), 2, 1).copy())
    m = jnp.asarray(np.random.default_rng(0).integers(1, R, L), jnp.int32)

    t_t1 = chain_time(
        lambda a, eps: jnp.sum((a[0] + eps).transpose(0, 2, 1)),
        (X,), repeats=2)
    print(f"transpose [L,R,C]->[L,C,R]: {t_t1:.3f} ms", flush=True)
    t_t2 = chain_time(
        lambda a, eps: jnp.sum((a[0] + eps).transpose(0, 2, 1)),
        (Xc,), repeats=2)
    print(f"transpose [L,C,R]->[L,R,C]: {t_t2:.3f} ms", flush=True)

    # correctness
    got = perm_cm(Xc, m)
    want = jax.vmap(lambda x, mm: x[jnp.arange(R) ^ mm])(X, m)
    err = float(jnp.max(jnp.abs(got.transpose(0, 2, 1) - want)))
    t_p = chain_time(
        lambda a, eps: jnp.sum(perm_cm(a[0] + eps, a[1])), (Xc, m),
        repeats=2)
    print(f"perm_cm apply: {t_p:.3f} ms (max err {err:.2e})", flush=True)

    # full round trip: transpose in, 2 applies (val collapse), transpose out
    def full(a, eps):
        xc = (a[0] + eps).transpose(0, 2, 1)
        y = perm_cm(xc, a[1])
        y = 0.5 * xc + 0.5 * y
        y2 = perm_cm(y, a[1] ^ 12345)
        y = 0.3 * y + 0.7 * y2
        return jnp.sum(y.transpose(0, 2, 1))

    t_f = chain_time(full, (X, m), repeats=2)
    print(f"full val-collapse (2 applies + 2 transposes): {t_f:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
