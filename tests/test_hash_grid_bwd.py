# -*- coding: utf-8 -*-
"""Hash-grid custom VJP: sorted one-hot MXU reduction vs scatter oracle.

The TPU embedding-gradient path (ops/hash_grid_bwd.py) runs here in
Pallas interpret mode with tiny tiles; the CPU VJP branch (plain
scatter-add) and the closed-form input gradient are checked against full
autodiff of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiancity_tpu.ops import hash_grid_bwd
from gaussiancity_tpu.ops.hash_grid import (
    _corner_weights,
    _level_geometry,
    hash_encode,
    level_params,
    table_shape,
)


def _setup(D=3, L=4, base=4, desired=32, lg=8, N=201, seed=0):
    _, offsets, _, hashed, total = level_params(D, L, base, desired, lg)
    level_rows = [(list(offsets) + [total])[l + 1] - offsets[l]
                  for l in range(L)]
    x = jax.random.uniform(jax.random.PRNGKey(seed), (N, D), minval=-0.9,
                           maxval=0.9)
    return offsets, level_rows, total, hashed, x


class TestHashGradEmbeddings:
    def _check(self, idx, w, g_l, n_rows):
        d_emb = hash_grid_bwd.hash_grad_embeddings(idx, w, g_l, n_rows)
        C = g_l.shape[-1]
        d_vals = w[..., None] * g_l[:, None]  # [L, 2^D, N, C]
        oracle = jax.vmap(
            lambda il, dl: jnp.zeros((n_rows, C)).at[il.reshape(-1)].add(
                dl.reshape(-1, C)))(idx, d_vals)
        # the kernel's payload rides through a bf16 hi/lo split (exact
        # one-hot x ~2^-16-accurate values): loose enough for that,
        # tight enough to catch any placement/duplicate logic bug
        np.testing.assert_allclose(np.asarray(d_emb), np.asarray(oracle),
                                   rtol=1e-3, atol=1e-4)

    def test_mixed_dense_hashed_levels(self):
        D, L, C = 3, 4, 8
        _, level_rows, _, hashed, x = _setup(D=D, L=L)
        assert (not hashed[0]) and hashed[-1]  # covers both index paths
        idx, frac, _, _ = _level_geometry(x, D, L, 4, 32, 8, 1.0)
        w = _corner_weights(frac, D)
        g_l = jax.random.normal(jax.random.PRNGKey(2), (L, x.shape[0], C))
        self._check(idx, w, g_l, max(level_rows))

    def test_skewed_all_points_one_cell(self):
        # every point in the same cell: one table tile receives ALL
        # updates — the chunk loop must stream them without truncation
        D, L, C = 3, 2, 4
        _, level_rows, _, _, _ = _setup(D=D, L=L, N=7)
        N = 300
        x = jnp.full((N, D), 0.123)
        idx, frac, _, _ = _level_geometry(x, D, L, 4, 32, 8, 1.0)
        w = _corner_weights(frac, D)
        g_l = jax.random.normal(jax.random.PRNGKey(3), (L, N, C))
        self._check(idx, w, g_l, max(level_rows))

    def test_five_dim_hashed(self):
        D, L, C = 5, 3, 8
        _, offsets, _, hashed, total = level_params(D, L, 4, 16, 9)
        level_rows = [(list(offsets) + [total])[l + 1] - offsets[l]
                      for l in range(L)]
        assert all(hashed)
        N = 123
        x = jax.random.uniform(jax.random.PRNGKey(5), (N, D), minval=-1,
                               maxval=1)
        idx, frac, _, _ = _level_geometry(x, D, L, 4, 16, 9, 1.0)
        w = _corner_weights(frac, D)
        g_l = jax.random.normal(jax.random.PRNGKey(6), (L, N, C))
        self._check(idx, w, g_l, max(level_rows))


class TestHashEncodeCustomVJP:
    def _oracle(self, D, L, base, desired, lg):
        def fn(xx, ee):
            idx, frac, oob, _ = _level_geometry(xx, D, L, base, desired,
                                                lg, 1.0)
            w = _corner_weights(frac, D)
            vals = jnp.stack([ee[lvl][idx[lvl]] for lvl in range(L)])
            o = jnp.sum(vals * w[..., None], axis=1)
            o = o.transpose(1, 0, 2).reshape(xx.shape[0], -1)
            return jnp.where(oob[:, None], 0.0, o)
        return fn

    @pytest.mark.parametrize("D", [2, 5])
    def test_grads_match_autodiff(self, D):
        L, C, base, desired, lg = 4, 8, 4, 32, 10
        N = 257
        x = jax.random.uniform(jax.random.PRNGKey(0), (N, D), minval=-0.95,
                               maxval=0.95)
        x = x.at[0].set(jnp.full((D,), 1.5))  # oob row
        emb = jax.random.normal(
            jax.random.PRNGKey(1),
            table_shape(D, L, base, desired, lg, C)) * 0.1
        g = jax.random.normal(jax.random.PRNGKey(3), (N, L * C))
        oracle = self._oracle(D, L, base, desired, lg)

        out = hash_encode(x, emb, D, L, base, desired, lg)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(oracle(x, emb)),
                                   rtol=1e-6, atol=1e-6)
        assert float(jnp.abs(out[0]).max()) == 0.0  # oob -> 0

        gx, ge = jax.grad(
            lambda xx, ee: jnp.sum(
                hash_encode(xx, ee, D, L, base, desired, lg) * g),
            argnums=(0, 1))(x, emb)
        gxo, geo = jax.grad(
            lambda xx, ee: jnp.sum(oracle(xx, ee) * g), argnums=(0, 1))(
            x, emb)
        np.testing.assert_allclose(np.asarray(ge), np.asarray(geo),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxo),
                                   rtol=1e-4, atol=2e-5)
        # oob points receive zero input grad
        np.testing.assert_allclose(np.asarray(gx[0]), 0.0)

    def test_jit_and_value_and_grad(self):
        D, L, C, base, desired, lg = 3, 2, 4, 4, 16, 8
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, D), minval=-1,
                               maxval=1)
        emb = jax.random.normal(
            jax.random.PRNGKey(1),
            table_shape(D, L, base, desired, lg, C)) * 0.1

        @jax.jit
        def loss(xx, ee):
            return jnp.sum(hash_encode(xx, ee, D, L, base, desired, lg) ** 2)

        v, g = jax.value_and_grad(loss, argnums=1)(x, emb)
        assert np.isfinite(float(v))
        assert float(jnp.abs(g).sum()) > 0


class TestHashEncodeConstFastPath:
    """Table-collapse fast path (constant leading dims) vs generic path."""

    def _shapes(self):
        # all levels hashed into the same power-of-two table (the REST
        # structural condition, scaled down): D=5, corners 5^5 > 2^9
        D, L, C, base, desired, lg, Dc = 5, 4, 8, 4, 16, 9, 2
        from gaussiancity_tpu.ops.hash_grid import const_fast_path_ok
        assert const_fast_path_ok(D, L, base, desired, lg, Dc)
        return D, L, C, base, desired, lg, Dc

    def _inputs(self, D, Dc, B=2, N=193, seed=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        const = jax.random.uniform(k1, (B, 1, Dc), minval=-0.9, maxval=0.9)
        spatial = jax.random.uniform(k2, (B, N, D - Dc), minval=-0.95,
                                     maxval=0.95)
        x = jnp.concatenate(
            [jnp.broadcast_to(const, (B, N, Dc)), spatial], -1)
        # one oob point (spatial dims only — const dims must stay
        # constant across N, that is the fast path's caller contract)
        return x.at[0, 0, Dc:].set(jnp.full((D - Dc,), 1.7))

    def test_forward_matches_generic(self):
        from gaussiancity_tpu.ops.hash_grid import hash_encode_const
        D, L, C, base, desired, lg, Dc = self._shapes()
        x = self._inputs(D, Dc)
        emb = jax.random.normal(
            jax.random.PRNGKey(1),
            table_shape(D, L, base, desired, lg, C)) * 0.1
        fast = hash_encode_const(x, emb, D, L, base, desired, lg, 1.0, Dc)
        B, N = x.shape[:2]
        ref = hash_encode(x.reshape(B * N, D), emb, D, L, base, desired,
                          lg).reshape(B, N, L * C)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        assert float(jnp.abs(fast[0, 0]).max()) == 0.0  # oob -> 0

    def test_grads_match_generic(self):
        from gaussiancity_tpu.ops.hash_grid import hash_encode_const
        D, L, C, base, desired, lg, Dc = self._shapes()
        x = self._inputs(D, Dc, B=1, N=211, seed=3)
        emb = jax.random.normal(
            jax.random.PRNGKey(1),
            table_shape(D, L, base, desired, lg, C)) * 0.1
        g = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 211, L * C))

        gx, ge = jax.grad(
            lambda xx, ee: jnp.sum(hash_encode_const(
                xx, ee, D, L, base, desired, lg, 1.0, Dc) * g),
            argnums=(0, 1))(x, emb)
        B, N = x.shape[:2]
        gxo, geo = jax.grad(
            lambda xx, ee: jnp.sum(hash_encode(
                xx.reshape(B * N, D), ee, D, L, base, desired,
                lg).reshape(B, N, -1) * g),
            argnums=(0, 1))(x, emb)
        np.testing.assert_allclose(np.asarray(ge), np.asarray(geo),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxo),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx[0, 0]), 0.0)  # oob

    def test_xor_perm(self):
        from gaussiancity_tpu.ops.hash_grid import (_from_cm, _to_cm,
                                                    _xor_perm_cm)
        L, R, C = 3, 256, 4
        X = jax.random.normal(jax.random.PRNGKey(0), (L, R, C))
        m = jnp.asarray([0, 255, 137], jnp.int32)
        out = _from_cm(_xor_perm_cm(_to_cm(X), m))
        want = np.stack([np.asarray(X[l])[np.arange(R) ^ int(m[l])]
                         for l in range(L)])
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                                   atol=1e-7)

    def test_grid_encoder_dispatch(self):
        # GridEncoder(n_const_dims=2) returns the same values as the
        # generic module at identical params
        from gaussiancity_tpu.ops.hash_grid import GridEncoder
        D, L, C, base, desired, lg, Dc = self._shapes()
        x = self._inputs(D, Dc, B=1, N=65, seed=7)
        enc = GridEncoder(in_channels=D, n_levels=L, lvl_channels=C,
                          desired_resolution=desired, base_resolution=base,
                          log2_hashmap_size=lg, n_const_dims=Dc)
        enc0 = GridEncoder(in_channels=D, n_levels=L, lvl_channels=C,
                          desired_resolution=desired, base_resolution=base,
                          log2_hashmap_size=lg)
        params = enc.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(enc.apply(params, x)),
            np.asarray(enc0.apply(params, x)), rtol=1e-5, atol=1e-6)


class TestReduceRowsMXU:
    def test_matches_scatter(self):
        # the rasterizer grad-scatter reduction (blend._reduce_rows_mxu):
        # keys == N are dropped; duplicates sum; runs in interpret mode
        from gaussiancity_tpu.ops.rasterizer.blend import _reduce_rows_mxu
        M, N, R = 513, 96, 16
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.integers(0, N + 1, M), jnp.int32)  # incl N
        rows = jnp.asarray(rng.normal(size=(M, R)), jnp.float32)
        got = _reduce_rows_mxu(keys, rows, N)
        want = np.zeros((N, R), np.float32)
        for k, r in zip(np.asarray(keys), np.asarray(rows)):
            if k < N:
                want[k] += r
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-4)
