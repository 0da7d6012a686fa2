#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""Headline benchmark: rays/s (pixels/s) forward+backward at 640x448.

Renders a synthetic city scene (131k padded Gaussians) through the full
differentiable rasterizer (preprocess -> binning -> Pallas blend -> custom
VJP) and times jitted fwd+bwd of an L2 loss.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
reported as the ratio to the driver-recorded value of round 1
(2.0 Mrays/s fwd+bwd) so later rounds show relative progress.
"""

import json
import sys
import time

import numpy as np


ROUND1_BASELINE_RAYS_PER_S = 2.0e6


def build_scene(n=65536, seed=0):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(5, 250, n).astype(np.float32)
    means = np.stack(
        [depth,
         rng.uniform(-1.0, 1.0, n) * depth,
         rng.uniform(-0.45, 0.45, n) * depth], 1).astype(np.float32)
    scales = rng.uniform(0.05, 0.8, (n, 3)).astype(np.float32)
    quats = np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.9, n).astype(np.float32)
    return means, opacity, scales, quats, colors


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.config import RasterizerConfig
    from gaussiancity_tpu.ops.rasterizer import rasterize

    W, H = 640, 448
    f = 400.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(
        np.zeros(3), np.array([0, 0, 0, 1.0]))
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterizerConfig(tile_capacity=2048, max_tiles_per_gaussian=32,
                           backend=backend)
    scene = tuple(map(jnp.asarray, build_scene()))

    def loss(*s):
        out = rasterize(*s, cam, cfg)
        return jnp.sum(out.image ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g = jax.block_until_ready(gfn(*scene))  # compile + warmup
    n_iter = 20
    # pipelined: enqueue all steps, block once — gradients stay on device
    # like in a real training loop (per-iteration sync would measure the
    # host round-trip, not the device)
    t0 = time.time()
    outs = [gfn(*scene) for _ in range(n_iter)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n_iter
    rays_per_s = W * H / dt

    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_640x448",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / ROUND1_BASELINE_RAYS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
