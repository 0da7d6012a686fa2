# -*- coding: utf-8 -*-
"""Map the gather cache cliff (bf16/f32, various rows) with per-level
query counts, and probe Mosaic VMEM gather support.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather3.py
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

    L, Ml, C = 16, 524288, 8

    def section(name, fn):
        try:
            v = round(fn(), 3)
        except Exception as e:
            v = repr(e)[:140]
        print(f"{name:36s} {v}", flush=True)

    # 16-level loop, each level gathers 524288 queries from its own table
    def make_pl(rows, dtype):
        emb = jax.random.normal(jax.random.PRNGKey(0),
                                (L, rows, C)).astype(dtype)
        idx = jax.random.randint(jax.random.PRNGKey(1), (L, Ml), 0, rows)

        def step(a, eps):
            tot = jnp.float32(0.0)
            for lvl in range(L):
                v = a[1][lvl][a[0][lvl] + eps.astype(jnp.int32)]
                tot += jnp.sum(v[:1024].astype(jnp.float32))
            return tot

        return step, (idx, emb)

    for rows, dt, tag in (
        (524288, jnp.bfloat16, "bf16_2^19_8.4MB"),
        (262144, jnp.bfloat16, "bf16_2^18_4.2MB"),
        (262144, jnp.float32, "f32_2^18_8.4MB"),
        (131072, jnp.float32, "f32_2^17_4.2MB"),
        (524288, jnp.float32, "f32_2^19_16.8MB"),
    ):
        step, args = make_pl(rows, dt)
        section(f"perlvl_{tag}_ms", lambda s=step, a=args: chain_time(s, a))

    # Mosaic VMEM gather probe: table resident in VMEM, idx vector, out rows
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R, U = 65536, 524288  # 1MB bf16 table, one level's queries

        def kern(idx_ref, tab_ref, out_ref):
            ii = idx_ref[:]  # [8, U/8] int32
            # take rows: tab[ii] — does Mosaic lower a vector gather?
            out_ref[:] = jnp.sum(
                tab_ref[:][ii.reshape(-1)].astype(jnp.float32), axis=-1
            ).reshape(idx_ref.shape)

        tab = jax.random.normal(jax.random.PRNGKey(0),
                                (R, C)).astype(jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (8, U // 8), 0, R)

        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, U // 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        def pstep(a, eps):
            return jnp.sum(fn(a[0] + eps.astype(jnp.int32), a[1])[:, :128])

        section("pallas_vmem_gather_ms", lambda: chain_time(pstep, (idx, tab)))
    except Exception as e:
        print("pallas_vmem_gather_ms", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
