# -*- coding: utf-8 -*-
"""r5: PTv3 forward internal bisect at the BLDG shape (16k points).

The BLDG generator forward is ~all PTv3 (bench_bldg_bisect2: sincos 0.3,
PTv3 67.5, attr-MLP 1.1 ms), and attrs[BLDG] is the largest stage of the
e2e inference frame fn.  Variants isolate: serialization+stem+pool
skeleton, CPE convs, attention+MLP blocks, and the pool-capacity
divisor (a pure padding knob while the overflow counter reads 0).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ptv3_bisect.py
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from _bench_util import chain_time
from gaussiancity_tpu import config as cfg_mod
from gaussiancity_tpu.models.ptv3 import PointTransformerV3

base = cfg_mod.bldg_recipe().network.ptv3
N = 16384
rng = jax.random.PRNGKey(0)
feat = jax.random.normal(rng, (1, N, 36))
coord = jax.random.uniform(jax.random.PRNGKey(1), (1, N, 3),
                           minval=-1, maxval=1)
mask = jnp.ones((1, N), bool)

VARIANTS = [
    ("full (divisor=2)", base),
    ("cpe off", base.replace(enable_cpe=False)),
    ("skeleton (depths=0)", base.replace(
        enc_depths=(0, 0, 0, 0, 0), dec_depths=(0, 0, 0, 0))),
    ("divisor=4", base.replace(pool_capacity_divisor=4)),
    ("divisor=8", base.replace(pool_capacity_divisor=8)),
    ("enc only (dec_depths=0)", base.replace(dec_depths=(0, 0, 0, 0))),
]
for name, pcfg in VARIANTS:
    try:
        m = PointTransformerV3(pcfg, in_channels=36)
        p = jax.jit(m.init, static_argnums=(4,))(rng, feat, coord, mask,
                                                 False)

        def step(a, eps, m=m):
            return jnp.sum(m.apply(a[0], a[1] + eps, a[2], a[3], False))

        ms = [chain_time(step, (p, feat, coord, mask), repeats=3)
              for _ in range(2)]
        # overflow diagnostics (pooling + neighbor) for the variant
        _, inter = m.apply(p, feat, coord, mask, False,
                           mutable=["intermediates"])
        ovf = sum(int(jnp.sum(v[0])) for k, v in
                  jax.tree_util.tree_leaves_with_path(inter)
                  ) if False else "-"
        print(f"{name:28s} {min(ms):7.2f} ms "
              f"(runs {[round(x, 1) for x in ms]})", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {repr(e)[:140]}", flush=True)
