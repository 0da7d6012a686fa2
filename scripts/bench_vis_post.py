# -*- coding: utf-8 -*-
"""On-chip timing of the visibility post-pass (round 4).

``vis_compact`` (inference/pipeline.py) turns the raycast's vp_map into
a per-point visibility bitmask with a 518k-row bool scatter — CLAUDE.md
says TPU scatters run ~90 ns/row, which would make this ~46 ms/frame of
the e2e visibility stage.  Candidates:

- scatter (current): zeros.at[vp+1].set(True)
- sort-merge: membership of point ids in sorted(vp_map) via the repo's
  stable-sort rank trick (queries are iota, i.e. already sorted keys, so
  ONE sort of [vp ++ iota] with a flag payload + segment-or suffices...
  in practice: sort vp (518k), then merge-count).
"""

import os
import sys

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

    R = 518400  # 960x540 rays
    N = 631323  # extruded points
    rng = np.random.default_rng(0)
    vp = rng.integers(-1, N, R).astype(np.int32)
    vp[rng.random(R) < 0.5] = -1  # half sky
    vp_dev = jnp.asarray(vp)

    def t(name, fn, args):
        ms = chain_time(fn, args, repeats=3)
        print(f"{name:32s} {max(ms, 0.0):8.3f} ms", flush=True)

    def scatter(a, eps):
        v = a[0] + eps.astype(jnp.int32)
        seen = jnp.zeros((N + 2,), bool).at[(v + 1)].set(
            True, mode="promise_in_bounds")
        return jnp.sum(seen.astype(jnp.float32))
    t("bool scatter (current)", scatter, (vp_dev,))

    def sort_merge(a, eps):
        v = a[0] + eps.astype(jnp.int32)
        # merge-rank membership (CLAUDE.md): stable-sort [keys ++ queries]
        # with an is-query flag; a query is a member iff the element
        # before it in the merged order is a key with the same value.
        q = jnp.arange(N, dtype=jnp.int32)
        allv = jnp.concatenate([v, q])
        flag = jnp.concatenate([jnp.zeros((R,), jnp.int32),
                                jnp.ones((N,), jnp.int32)])
        sv, sf = jax.lax.sort((allv, flag), num_keys=2, is_stable=True)
        prev_same_key = jnp.concatenate([
            jnp.zeros((1,), bool),
            (sv[1:] == sv[:-1]) & (sf[:-1] == 0)])
        # scatter-free inverse: the queries' merged positions are those
        # with sf == 1, in query order (stable sort keeps iota order);
        # compact their membership bits by a second sort on (1 - sf)
        memb = prev_same_key.astype(jnp.int32)
        _, memb_q = jax.lax.sort((1 - sf, memb), num_keys=1)
        return jnp.sum(memb_q[:N].astype(jnp.float32))
    t("sort-merge membership", sort_merge, (vp_dev,))

    def sort_only(a, eps):
        v = a[0] + eps.astype(jnp.int32)
        (sv,) = jax.lax.sort((v,), num_keys=1)
        return jnp.sum(sv.astype(jnp.float32))
    t("sort vp only (floor)", sort_only, (vp_dev,))


if __name__ == "__main__":
    main()
