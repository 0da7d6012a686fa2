# -*- coding: utf-8 -*-
"""Generator-internal breakdown at the REST recipe (N=16384, 640x448).

Methodology (CLAUDE.md): the axon tunnel can wildly under-report pipelined
sub-ms dispatches, so each op is timed as a device-chained fori_loop inside
ONE jit (iteration k+1 consumes a scalar derived from iteration k's output,
so the device must run them sequentially), with a single host fetch at the
end; per-iter cost = (t(K_hi) - t(K_lo)) / (K_hi - K_lo) cancels fixed
dispatch/fetch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gen_breakdown.py
"""

import time

import numpy as np


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import chain_time  # noqa: E402


def _ct(ms, a, k_lo=2, k_hi=12):
    return chain_time(ms, a, k_lo, k_hi)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussiancity_tpu import config as cfg_mod
    from gaussiancity_tpu.models.generator import GlobalEncoder, GaussianAttrMLP
    from gaussiancity_tpu.ops.hash_grid import hash_encode, table_shape

    cfg = cfg_mod.rest_recipe()
    net = cfg.network
    N = cfg.train.max_points
    P = cfg.dataset.proj_size
    n_classes = cfg.dataset.n_classes
    rng = jax.random.PRNGKey(0)
    results = {}

    def section(name, fn):
        try:
            results[name] = round(fn(), 3)
        except Exception as e:
            results[name] = repr(e)[:160]
        print(f"{name:32s} {results[name]}", flush=True)

    # --- hash grid: D=5, 16 levels x 8ch, table 2^19
    D = net.encoder_out_dim
    L = net.hash_grid_n_levels
    C = net.hash_grid_level_dim
    emb = jax.random.uniform(
        rng, table_shape(D, L, net.hash_grid_base_res, P,
                         net.hash_grid_map_size, C),
        minval=-1e-4, maxval=1e-4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, D), minval=-1, maxval=1)

    def hg_step(a, eps):
        out = hash_encode(a[0] + eps, a[1], D, L, net.hash_grid_base_res, P,
                          net.hash_grid_map_size, 1.0)
        return jnp.sum(out[:8, :8])

    section("hash_fwd_ms", lambda: _ct(hg_step, (x, emb)))

    hg_loss = lambda a, b: jnp.sum(hash_encode(
        a, b, D, L, net.hash_grid_base_res, P,
        net.hash_grid_map_size, 1.0) ** 2)

    def hg_bwd_step(a, eps):
        gx, ge = jax.grad(hg_loss, argnums=(0, 1))(a[0] + eps, a[1])
        return jnp.sum(gx[:8]) + jnp.sum(ge[:8, :])

    section("hash_fwd_bwd_ms", lambda: _ct(hg_bwd_step, (x, emb)))

    # --- GlobalEncoder on 2048^2 maps
    ge_mod = GlobalEncoder(net.global_encoder_n_blocks, net.encoder_out_dim - 3)
    hf = jnp.zeros((1, P, P, 1))
    seg = jnp.zeros((1, P, P, n_classes))
    ge_params = jax.jit(ge_mod.init)(rng, hf, seg)

    def ge_step(a, eps):
        return jnp.sum(ge_mod.apply(a[0], a[1] + eps, a[2]))

    section("global_enc_fwd_ms",
            lambda: _ct(ge_step, (ge_params, hf, seg)))

    def ge_bwd_step(a, eps):
        g = jax.grad(lambda h: jnp.sum(ge_mod.apply(a[0], h, a[2]) ** 2))(
            a[1] + eps)
        return jnp.sum(g[:, :8, :8, :])

    section("global_enc_fwd_bwd_ms",
            lambda: _ct(ge_bwd_step, (ge_params, hf, seg)))

    # --- attr MLP (in_dim 128, hidden 512)
    mlp = GaussianAttrMLP(
        n_classes=n_classes, in_dim=L * C, z_dim=net.z_dim,
        hidden_dim=net.mlp_hidden_dim,
        n_shared_layers=net.mlp_n_shared_layers,
        factors=dict(net.attr_factors), n_layers=dict(net.attr_n_layers))
    feat = jax.random.normal(rng, (1, N, L * C))
    oh = jax.nn.one_hot(jnp.zeros((1, N), jnp.int32), n_classes)
    mp = jax.jit(mlp.init)(rng, feat, oh, None)

    def mlp_step(a, eps):
        out = mlp.apply(a[0], a[1] + eps, a[2], None)
        return jnp.sum(out["rgb"][:, :8])

    section("attr_mlp_fwd_ms", lambda: _ct(mlp_step, (mp, feat, oh)))

    def mlp_bwd_step(a, eps):
        g = jax.grad(lambda f: sum(
            jnp.sum(v ** 2) for v in mlp.apply(a[0], f, a[2], None).values()
        ))(a[1] + eps)
        return jnp.sum(g[:, :8, :8])

    section("attr_mlp_fwd_bwd_ms",
            lambda: _ct(mlp_bwd_step, (mp, feat, oh)))

    # --- rasterizer at 16k points, 640x448 crop
    from gaussiancity_tpu.camera import CameraModel
    from gaussiancity_tpu.ops.rasterizer import rasterize

    W, H = 640, 448
    K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]])
    cam = CameraModel(K, (W, H)).params(np.zeros(3), np.array([0, 0, 0, 1.0]))
    rcfg = cfg.rasterizer.replace(
        backend="pallas" if jax.default_backend() == "tpu" else "xla")
    rk = jax.random.split(jax.random.PRNGKey(2), 6)
    depth = jax.random.uniform(rk[0], (N,), minval=5.0, maxval=250.0)
    means = jnp.stack([
        depth,
        jax.random.uniform(rk[1], (N,), minval=-1, maxval=1) * depth,
        jax.random.uniform(rk[2], (N,), minval=-0.45, maxval=0.45) * depth,
    ], 1)
    scales = jax.random.uniform(rk[3], (N, 3), minval=0.05, maxval=0.8)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
    colors = jax.random.uniform(rk[4], (N, 3))
    opac = jax.random.uniform(rk[5], (N,), minval=0.2, maxval=0.9)
    scene = (means, opac, scales, quats, colors)

    def r_step(a, eps):
        img = rasterize(a[0] + eps, *a[1:], cam, rcfg).image
        return jnp.sum(img[:8, :8])

    section("raster16k_fwd_ms", lambda: _ct(r_step, scene, 1, 6))

    def r_bwd_step(a, eps):
        g = jax.grad(lambda m: jnp.sum(
            rasterize(m, *a[1:], cam, rcfg).image ** 2))(a[0] + eps)
        return jnp.sum(g[:8])

    section("raster16k_fwd_bwd_ms", lambda: _ct(r_bwd_step, scene, 1, 6))


if __name__ == "__main__":
    main()
