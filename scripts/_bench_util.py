# -*- coding: utf-8 -*-
"""Shared on-chip timing harness for the scripts/ benches.

``chain_time`` measures one op as a device-chained ``fori_loop`` inside a
single jit — iteration k+1 consumes a scalar derived from iteration k's
output, so the device must run the iterations sequentially — with ONE
host fetch at the end.  Per-iteration cost is the slope between two chain
lengths, cancelling fixed dispatch/fetch overhead.  This is the only
methodology the axon tunnel cannot under-report: pipelined per-call
timing of sub-ms dispatches has measured 0.1 ms for 150 ms ops
(CLAUDE.md benchmark rules).
"""

import os
import time

# scripts/ benches time synthetic steps (no VGG weights artifact needed)
os.environ.setdefault("GAUSSIANCITY_ALLOW_RANDOM_VGG", "1")


def chain_time(make_step, args, k_lo=1, k_hi=4, repeats=3):
    """make_step(args, eps) -> f32 scalar; ``eps`` is a zero scalar derived
    from the previous iteration (multiply into an input to chain)."""
    import jax
    import jax.numpy as jnp

    def run(k):
        @jax.jit
        def chained(*a):
            def body(_, acc):
                return make_step(a, acc * 0.0)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        out = chained(*args)
        out.block_until_ready()
        t0 = time.time()
        out = chained(*args)
        float(out)  # host fetch forces real completion
        return time.time() - t0

    t_lo = min(run(k_lo) for _ in range(repeats))
    t_hi = min(run(k_hi) for _ in range(repeats))
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3
