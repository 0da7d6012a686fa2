# -*- coding: utf-8 -*-
"""Hash-grid const-dims table-collapse fast path vs generic path, on chip.

Measures at the two flagship shapes (REST GAN train step: 16,384 points;
inference REST slab: 196,608 points), fwd and fwd+bwd, plus the
_xor_perm group-size sweep that sets _XOR_PERM_GROUP.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather6.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from _bench_util import chain_time

from gaussiancity_tpu.ops import hash_grid as hg

D, L, C, BASE, LG = 5, 16, 8, 16, 19
DESIRED = 1536  # rest_recipe proj_size
DC = 2


def make_inputs(n, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    const = jax.random.uniform(k1, (1, 1, DC), minval=-0.9, maxval=0.9)
    spatial = jax.random.uniform(k2, (1, n, D - DC), minval=-0.95,
                                 maxval=0.95)
    return jnp.concatenate(
        [jnp.broadcast_to(const, (1, n, DC)), spatial], -1)


def main():
    assert hg.const_fast_path_ok(D, L, BASE, DESIRED, LG, DC)
    shape3 = hg.table_shape(D, L, BASE, DESIRED, LG, C)
    emb = jax.random.normal(jax.random.PRNGKey(1), shape3) * 0.1
    print(f"table {shape3} = {np.prod(shape3) * 4 / 1e6:.1f} MB", flush=True)

    # one full perm apply over all 16 levels (channel-major, incl. the
    # to/from transposes a standalone apply would pay)
    m = jnp.asarray(np.random.default_rng(0).integers(1, 2 ** 19, L),
                    jnp.int32)
    ms = chain_time(
        lambda a, eps: jnp.sum(hg._from_cm(hg._xor_perm_cm(
            hg._to_cm(a[0] + eps), a[1]))),
        (emb, m), repeats=2)
    print(f"xor_perm cm (+2 transposes): {ms:.3f} ms", flush=True)

    for n in (16384, 196608):
        x = make_inputs(n)
        gen_args = (x.reshape(-1, D), emb)
        fast_args = (x, emb)

        def gen_fwd(a, eps):
            return jnp.sum(hg.hash_encode(
                a[0] + eps, a[1], D, L, BASE, DESIRED, LG, 1.0))

        def fast_fwd(a, eps):
            return jnp.sum(hg.hash_encode_const(
                a[0] + eps, a[1], D, L, BASE, DESIRED, LG, 1.0, DC))

        t_gen = chain_time(gen_fwd, gen_args, repeats=2)
        t_fast = chain_time(fast_fwd, fast_args, repeats=2)
        print(f"n={n}: fwd generic {t_gen:.1f} ms | fast {t_fast:.1f} ms",
              flush=True)

        def gen_fb(a, eps):
            g = jax.grad(lambda xx, ee: jnp.sum(hg.hash_encode(
                xx, ee, D, L, BASE, DESIRED, LG, 1.0) ** 2),
                argnums=(0, 1))(a[0] + eps, a[1])
            return sum(jnp.sum(t) for t in g)

        def fast_fb(a, eps):
            g = jax.grad(lambda xx, ee: jnp.sum(hg.hash_encode_const(
                xx, ee, D, L, BASE, DESIRED, LG, 1.0, DC) ** 2),
                argnums=(0, 1))(a[0] + eps, a[1])
            return sum(jnp.sum(t) for t in g)

        t_gen = chain_time(gen_fb, gen_args, repeats=2)
        t_fast = chain_time(fast_fb, fast_args, repeats=2)
        print(f"n={n}: fwd+bwd generic {t_gen:.1f} ms | fast {t_fast:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
