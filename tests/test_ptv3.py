# -*- coding: utf-8 -*-
"""PTv3 tests: serialization codes, pooling clusters, attention padding,
mask invariance, full backbone + generator integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiancity_tpu.config import GaussianNetworkConfig, PTv3Config
from gaussiancity_tpu.models.ptv3 import PointTransformerV3, PTv3Single
from gaussiancity_tpu.ops import serialization as ser


def ref_morton(x, y, z, depth):
    """Bit-by-bit Morton with the reference's x-major layout."""
    code = 0
    for i in range(depth):
        code |= ((x >> i) & 1) << (3 * i + 2)
        code |= ((y >> i) & 1) << (3 * i + 1)
        code |= ((z >> i) & 1) << (3 * i)
    return code


class TestSerialization:
    def test_cord_code(self):
        g = jnp.array([[1, 2, 3], [0, 0, 7]], dtype=jnp.int32)
        code = ser.cord_encode(g, 0.01)
        # x/gs^2 + y/gs + z = x*10000 + y*100 + z
        np.testing.assert_array_equal(np.asarray(code), [10203, 7])

    def test_z_order_matches_bitwise(self):
        rng = np.random.default_rng(0)
        pts = rng.integers(0, 512, size=(64, 3))
        code = ser.z_order_encode(jnp.asarray(pts, jnp.int32), depth=10)
        want = [ref_morton(x, y, z, 10) for x, y, z in pts]
        np.testing.assert_array_equal(np.asarray(code), want)

    def test_hilbert_is_bijective_and_local(self):
        d = 4
        n = 1 << d
        coords = np.stack(np.meshgrid(
            np.arange(n), np.arange(n), np.arange(n), indexing="ij"),
            axis=-1).reshape(-1, 3)
        code = np.asarray(ser.hilbert_encode(
            jnp.asarray(coords, jnp.int32), depth=d))
        # bijective over the full cube
        assert len(np.unique(code)) == len(coords)
        assert code.min() == 0 and code.max() == len(coords) - 1
        # true Hilbert curve: consecutive codes are adjacent cells
        order = np.argsort(code)
        diffs = np.abs(np.diff(coords[order], axis=0)).sum(axis=1)
        assert np.all(diffs == 1), "hilbert curve must move one step at a time"

    def test_serialize_sorts_invalid_last(self):
        coord = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (32, 3)),
                            jnp.float32)
        valid = jnp.arange(32) < 20
        g, codes, order, inverse = ser.serialize(
            coord, valid, 0.01, ("cord",), 10)
        v_sorted = np.asarray(valid)[np.asarray(order[0])]
        assert v_sorted[:20].all() and not v_sorted[20:].any()
        # inverse is the inverse permutation
        np.testing.assert_array_equal(
            np.asarray(order[0])[np.asarray(inverse[0])], np.arange(32))


class TestPooling:
    def test_clusters_match_numpy_unique(self):
        from gaussiancity_tpu.models.ptv3 import pool_clusters

        rng = np.random.default_rng(2)
        N = 64
        codes_np = rng.integers(0, 200, size=N).astype(np.int32)
        valid = np.ones(N, bool)
        valid[50:] = False
        codes = jnp.where(jnp.asarray(valid), jnp.asarray(codes_np),
                          ser.INVALID_CODE)[None]
        order = jnp.argsort(codes, axis=1, stable=True).astype(jnp.int32)
        cluster, head, n_clusters, seg, code_sorted, pd = pool_clusters(
            codes, order, jnp.asarray(valid), stride=2)
        want_unique = np.unique(codes_np[:50] >> 3)
        assert int(n_clusters) == len(want_unique)
        # points sharing a shifted code share a cluster id
        cl = np.asarray(cluster)
        for u in want_unique:
            ids = cl[(codes_np >> 3) == u]
            # restrict to valid points
            mask = ((codes_np >> 3) == u) & valid
            assert len(np.unique(cl[mask])) == 1


def tiny_ptv3_cfg():
    return PTv3Config(
        order=("cord",),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 32),
        enc_n_head=(1, 2, 4),
        enc_patch_size=(32, 32, 32),
        dec_depths=(1, 1),
        dec_channels=(8, 16),
        dec_n_head=(1, 2),
        dec_patch_size=(32, 32),
        mlp_ratio=2.0,
    )


def make_points(key, N=96, n_valid=80):
    coord = jax.random.uniform(key, (N, 3), minval=-1, maxval=1)
    feat = jax.random.normal(jax.random.fold_in(key, 1), (N, 12))
    valid = jnp.arange(N) < n_valid
    return feat, coord, valid


class TestPTv3:
    def test_forward_shapes(self):
        cfg = tiny_ptv3_cfg()
        feat, coord, valid = make_points(jax.random.PRNGKey(0))
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        out = model.apply(params, feat, coord, valid)
        assert out.shape == (96, cfg.dec_channels[0])
        assert np.all(np.isfinite(np.asarray(out)))

    def test_padding_invariance(self):
        # changing padded points' features/coords must not change valid outputs
        cfg = tiny_ptv3_cfg()
        feat, coord, valid = make_points(jax.random.PRNGKey(2), n_valid=72)
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        out1 = model.apply(params, feat, coord, valid)
        feat2 = feat.at[72:].set(99.0)
        coord2 = coord.at[72:].set(0.123)
        out2 = model.apply(params, feat2, coord2, valid)
        np.testing.assert_allclose(
            np.asarray(out1[:72]), np.asarray(out2[:72]), atol=1e-5)

    def test_batched_wrapper(self):
        cfg = tiny_ptv3_cfg()
        f1, c1, v1 = make_points(jax.random.PRNGKey(3))
        f2, c2, v2 = make_points(jax.random.PRNGKey(4), n_valid=96)
        feat = jnp.stack([f1, f2])
        coord = jnp.stack([c1, c2])
        valid = jnp.stack([v1, v2])
        model = PointTransformerV3(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(5), feat, coord, valid)
        out = model.apply(params, feat, coord, valid)
        assert out.shape == (2, 96, cfg.dec_channels[0])
        # batch elements are independent
        out_b0 = model.apply(params, f1[None], c1[None], v1[None])
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_b0[0]),
                                   atol=1e-5)

    def test_generator_with_ptv3(self):
        from gaussiancity_tpu.models import Generator
        from gaussiancity_tpu.utils import helpers

        net = GaussianNetworkConfig(
            encoder=None, encoder_out_dim=3, pos_emd="SIN_COS",
            sin_cos_freq_bends=2, z_dim=16, mlp_hidden_dim=32,
            ptv3=tiny_ptv3_cfg().replace(enabled=True),
        )
        B, N = 1, 96
        gen = Generator(cfg=net, n_classes=8, proj_size=32)
        rng = jax.random.PRNGKey(0)
        rel_xyz = jax.random.uniform(rng, (B, N, 3), minval=-1, maxval=1)
        onehots = helpers.get_one_hot(jnp.full((B, N), 2, jnp.int32), 8)
        z = helpers.get_z(rng, jnp.full((B, N), 100, jnp.int32), 16)
        mask = jnp.ones((B, N), dtype=bool)
        params = gen.init(rng, None, rel_xyz, None, onehots, z, None, None,
                          mask)
        out = gen.apply(params, None, rel_xyz, None, onehots, z, None, None,
                        mask)
        assert out["rgb"].shape == (B, N, 3)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))


class TestPooledCapacity:
    def test_divisor_shrinks_and_stays_correct(self):
        # clustered synthetic data: vertical shell columns -> runs of
        # consecutive cord codes merge under >>3, so capacity N/2 is safe
        cfg = tiny_ptv3_cfg().replace(pool_capacity_divisor=2)
        N = 128
        key = jax.random.PRNGKey(0)
        base = jax.random.uniform(key, (16, 2), minval=-1, maxval=1)
        cols = jnp.repeat(base, 8, axis=0)  # 16 columns x 8 z-steps
        z = jnp.tile(jnp.linspace(-1, 1, 8), 16)[:, None] * 0.04
        coord = jnp.concatenate([cols, z], axis=-1)
        feat = jax.random.normal(jax.random.fold_in(key, 1), (N, 12))
        valid = jnp.ones((N,), bool)
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        out = model.apply(params, feat, coord, valid)
        assert out.shape == (N, cfg.dec_channels[0])
        assert np.all(np.isfinite(np.asarray(out)))
        # padding invariance still holds with capacities
        valid2 = jnp.arange(N) < 120
        o1 = model.apply(params, feat, coord, valid2)
        o2 = model.apply(params, feat.at[120:].set(7.0),
                         coord.at[120:].set(0.9), valid2)
        np.testing.assert_allclose(np.asarray(o1[:120]),
                                   np.asarray(o2[:120]), atol=1e-5)


class TestPoolOverflowCounter:
    def _run(self, divisor, patch):
        # every point in its own grid cell -> n_clusters == n_valid at the
        # first pooling; capacity = max(N//divisor, min(patch, N))
        cfg = tiny_ptv3_cfg().replace(
            pool_capacity_divisor=divisor,
            enc_patch_size=(patch,) * 3, dec_patch_size=(patch,) * 2)
        N = 64
        side = jnp.linspace(-0.9, 0.9, 4)
        coord = jnp.stack(jnp.meshgrid(side, side, side, indexing="ij"),
                          axis=-1).reshape(-1, 3)
        feat = jax.random.normal(jax.random.PRNGKey(0), (N, 12))
        valid = jnp.ones((N,), bool)
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        out, vs = model.apply(params, feat, coord, valid,
                              mutable=["intermediates"])
        total = sum(
            int(jnp.sum(v))
            for v in jax.tree_util.tree_leaves(vs["intermediates"]))
        return total

    def test_overflow_is_counted(self):
        # cap at stage1 = max(64//8, 8) = 8 < 64 distinct clusters
        assert self._run(divisor=8, patch=8) > 0

    def test_no_overflow_when_capacity_suffices(self):
        # divisor=1 keeps full N at every stage -> no clamping possible
        assert self._run(divisor=1, patch=64) == 0


class TestSubMNeighbors:
    """Merge-rank neighbor search vs the searchsorted oracle
    (reference semantics: spconv SubMConv3d gathers the feature of the
    occupied voxel at each kernel offset)."""

    def _oracle(self, grid, valid, k, depth=10):
        import numpy as np

        from gaussiancity_tpu.models.ptv3 import voxel_keys

        N = grid.shape[0]
        r = k // 2
        M = 1 << depth
        keys = np.asarray(voxel_keys(grid, valid, depth))
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        offs = [dx * M * M + dy * M + dz
                for dx in range(-r, r + 1)
                for dy in range(-r, r + 1)
                for dz in range(-r, r + 1)]
        nb, fnd = [], []
        for off in offs:
            q = keys + off
            pos = np.clip(np.searchsorted(skeys, q), 0, N - 1)
            found = (skeys[pos] == q) & np.asarray(valid)
            nb.append(order[pos])
            fnd.append(found)
        return np.stack(nb), np.stack(fnd)

    @pytest.mark.parametrize("k", [3, 5])
    def test_matches_searchsorted_oracle(self, k):
        import numpy as np

        from gaussiancity_tpu.models.ptv3 import subm_neighbors

        rng = np.random.RandomState(0)
        N = 300
        # clustered coords -> duplicates and dense neighborhoods
        grid = jnp.asarray(rng.randint(0, 12, (N, 3)), jnp.int32)
        valid = jnp.asarray(rng.rand(N) > 0.2)
        nb, fnd = subm_neighbors(grid, valid, k)
        nb_o, fnd_o = self._oracle(grid, valid, k)
        np.testing.assert_array_equal(np.asarray(fnd), fnd_o)
        # where found, the chosen neighbor voxel must hold the same KEY
        # (several points can share a voxel; searchsorted-left picks the
        # first sorted slot — the merge must too)
        np.testing.assert_array_equal(
            np.asarray(nb)[fnd_o], nb_o[fnd_o])


class TestRPEAndShuffle:
    def test_rpe_runs_and_adds_param(self):
        cfg = tiny_ptv3_cfg().replace(enable_rpe=True)
        feat, coord, valid = make_points(jax.random.PRNGKey(0))
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert any("rpe_table" in jax.tree_util.keystr(p) for p, _ in flat)
        out = model.apply(params, feat, coord, valid)
        assert np.all(np.isfinite(np.asarray(out)))
        # bias actually reaches the logits: zero vs trained table differ
        import flax

        params2 = flax.core.unfreeze(params)

        def bump(path, leaf):
            if "rpe_table" in jax.tree_util.keystr(path):
                return leaf + 0.5
            return leaf

        params2 = jax.tree_util.tree_map_with_path(bump, params2)
        out2 = model.apply(params2, feat, coord, valid)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_rpe_bias_matches_reference_formula(self):
        # index math vs a direct numpy re-derivation of pt_v3.py:604-626
        from gaussiancity_tpu.models.ptv3 import PatchAttention

        K, H = 8, 2
        att = PatchAttention(channels=4, num_heads=H, patch_size=K,
                             enable_rpe=True)
        gc = jax.random.randint(jax.random.PRNGKey(0), (3, K, 3), 0, 40)
        feat = jax.random.normal(jax.random.PRNGKey(1), (3 * K, 4))
        order = jnp.arange(3 * K, dtype=jnp.int32)
        params = att.init(jax.random.PRNGKey(2), feat, order, order,
                          jnp.int32(3 * K), gc.reshape(-1, 3))
        table = np.asarray(params["params"]["rpe_table"])
        pos_bnd = int((4 * K) ** (1 / 3) * 2)
        rpe_num = 2 * pos_bnd + 1
        gcn = np.asarray(gc)
        rel = gcn[:, :, None, :] - gcn[:, None, :, :]
        idx = np.clip(rel, -pos_bnd, pos_bnd) + pos_bnd \
            + np.arange(3) * rpe_num
        want = table[idx].sum(3).transpose(0, 3, 1, 2)

        from gaussiancity_tpu.models.ptv3 import rpe_bias_fn

        got = np.asarray(rpe_bias_fn(jnp.asarray(table), K, gc))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_shuffle_orders_noop_single_order_and_active_multi(self):
        cfg = tiny_ptv3_cfg().replace(shuffle_orders=True)
        feat, coord, valid = make_points(jax.random.PRNGKey(3))
        model = PTv3Single(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        base = model.apply(params, feat, coord, valid)
        # single order: providing the rng changes nothing
        out_rng = model.apply(params, feat, coord, valid,
                              rngs={"shuffle": jax.random.PRNGKey(9)})
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out_rng))

        cfg2 = tiny_ptv3_cfg().replace(order=("cord", "z"),
                                       shuffle_orders=True)
        model2 = PTv3Single(cfg=cfg2, in_channels=12)
        params2 = model2.init(jax.random.PRNGKey(1), feat, coord, valid)
        out_a = model2.apply(params2, feat, coord, valid)  # no rng: unshuffled
        outs = [np.asarray(model2.apply(
            params2, feat, coord, valid,
            rngs={"shuffle": jax.random.PRNGKey(s)})) for s in range(6)]
        assert all(np.all(np.isfinite(o)) for o in outs)
        # some seed must produce a different block->order assignment
        assert any(not np.allclose(o, np.asarray(out_a), atol=1e-6)
                   for o in outs)

    def test_shuffle_rng_through_batched_wrapper(self):
        # the nn.vmap lift must split the "shuffle" stream per sample
        cfg = tiny_ptv3_cfg().replace(order=("cord", "z"),
                                      shuffle_orders=True)
        f1, c1, v1 = make_points(jax.random.PRNGKey(3))
        feat = jnp.stack([f1, f1])
        coord = jnp.stack([c1, c1])
        valid = jnp.stack([v1, v1])
        model = PointTransformerV3(cfg=cfg, in_channels=12)
        params = model.init(jax.random.PRNGKey(1), feat, coord, valid)
        out = model.apply(params, feat, coord, valid,
                          rngs={"shuffle": jax.random.PRNGKey(4)})
        assert out.shape[0] == 2
        assert np.all(np.isfinite(np.asarray(out)))


class TestSubmNeighborsDense:
    def test_matches_sorted_merge(self):
        from gaussiancity_tpu.models.ptv3 import (subm_neighbors,
                                                  subm_neighbors_dense)
        rng = np.random.default_rng(0)
        N = 500
        # duplicates on purpose: co-voxel points must resolve to the
        # lowest index in BOTH paths (stable merge == scatter-min)
        gc = jnp.asarray(rng.integers(0, 12, (N, 3)), jnp.int32)
        valid = jnp.asarray(rng.random(N) > 0.1)
        for k in (3, 5):
            nb_m, fnd_m = subm_neighbors(gc, valid, k, 10)
            nb_d, fnd_d, ovf = subm_neighbors_dense(gc, valid, k, 10,
                                                    extent=16)
            assert int(ovf) == 0
            np.testing.assert_array_equal(np.asarray(fnd_d),
                                          np.asarray(fnd_m))
            f = np.asarray(fnd_m)
            np.testing.assert_array_equal(np.asarray(nb_d)[f],
                                          np.asarray(nb_m)[f])

    def test_overflow_counted(self):
        from gaussiancity_tpu.models.ptv3 import subm_neighbors_dense
        gc = jnp.asarray([[0, 0, 0], [20, 3, 3], [1, 1, 1]], jnp.int32)
        valid = jnp.ones((3,), bool)
        _, fnd, ovf = subm_neighbors_dense(gc, valid, 3, 10, extent=16)
        assert int(ovf) == 1  # the out-of-extent point
        # the center offset (k^3 // 2) finds every in-extent point
        center = 27 // 2
        assert bool(fnd[center, 0]) and bool(fnd[center, 2])
        assert not bool(fnd[center, 1])  # overflowed point missed
