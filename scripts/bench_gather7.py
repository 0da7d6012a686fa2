# -*- coding: utf-8 -*-
"""Bisect _xor_perm cost (gather vs one-hot matmul) and compare
formulations.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/bench_gather7.py
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


def main():
    X = jax.random.normal(jax.random.PRNGKey(0), (L, R, C)) * 0.1
    m = jnp.asarray(np.random.default_rng(0).integers(1, R, L), jnp.int32)

    for G in (32, 64, 128, 256):
        Xg = X.reshape(L, R // G, G * C)

        def gather_only(a, eps):
            rows = (jnp.arange(R // G, dtype=jnp.int32)[None, :]
                    ^ (a[1][:, None] // G)) ^ eps.astype(jnp.int32)
            return jnp.sum(jax.vmap(lambda x, r: x[r])(a[0] + eps, rows))

        t_g = chain_time(gather_only, (Xg, m), repeats=2)

        def kron_only(a, eps):
            # P_kron[b*C+k, d*C+k'] = (b ^ mlo == d) & (k == k')
            mlo = a[1] % G
            gi = jnp.arange(G, dtype=jnp.int32)
            P = (gi[None, :, None] ^ mlo[:, None, None]
                 == gi[None, None, :]).astype(jnp.float32)  # [L, G, G]
            eye = jnp.eye(C, dtype=jnp.float32)
            Pk = (P[:, :, None, :, None] * eye[None, None, :, None, :]
                  ).reshape(L, G * C, G * C)
            x = a[0] + eps
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            pb = Pk.astype(jnp.bfloat16)
            out = (jnp.einsum("lrb,lbd->lrd", x_hi, pb,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("lrb,lbd->lrd", x_lo, pb,
                                preferred_element_type=jnp.float32))
            return jnp.sum(out)

        t_k = chain_time(kron_only, (Xg, m), repeats=2)

        def old_einsum(a, eps):
            mlo = a[1] % G
            gi = jnp.arange(G, dtype=jnp.int32)
            P = (gi[None, :, None] ^ mlo[:, None, None]
                 == gi[None, None, :]).astype(jnp.float32)
            Xh = (a[0] + eps).reshape(L, R // G, G, C)
            return jnp.sum(jnp.einsum(
                "lrbk,lbd->lrdk", Xh, P,
                precision=jax.lax.Precision.HIGHEST))

        t_o = chain_time(old_einsum, (Xg, m), repeats=2)
        print(f"G={G}: gather {t_g:.2f} ms | kron-bf16 {t_k:.2f} ms | "
              f"old-HIGHEST {t_o:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
