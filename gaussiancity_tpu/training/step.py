# -*- coding: utf-8 -*-
"""GAN training step (reference: core/train.py:30-397), TPU-native.

One fused, jittable step containing the reference's alternating D/G update:

  D-step: no-grad generator forward -> pack 14ch -> rasterize -> crop ->
          D(fake), D(real) -> N+1 GAN loss -> adam
  G-step: generator forward -> rasterize -> L1*10 + VGG*10 + GAN*0.5 -> adam

Differences by design (SURVEY.md §7):
  - pure functions over a `TrainState` pytree; both updates live in ONE
    jitted function (XLA fuses and overlaps them)
  - discriminator warm-up LR ramp is an optax schedule on the global step
    (reference: core/train.py:182-190)
  - spectral-norm power-iteration state is threaded explicitly (the
    reference relies on torch forward hooks), updated on the same three
    discriminator applications per step as the reference
  - per-instance z codes are drawn per step from the step rng
    (reference: utils/helpers.py:136-155)
  - data parallelism: `make_parallel_train_step` shard_maps this step over
    the 'data' mesh axis with gradient psum over ICI, replacing DDP/NCCL
    (reference: utils/distributed.py, core/train.py:78-87)

Batch layout (all fixed shapes, batch size 1 per device like the
reference's 1 sample/GPU; see data pipeline):
  pts        [B, N, 9]  (abs_xyz 0:3, scale 3, instance 4, rel_xyz 5:8,
                         batch_idx 8 — reference core/train.py:207-213)
  pts_mask   [B, N]     validity of padded points
  rgb        [B, Hc, Wc, 3] in [-1, 1]
  seg        [B, Hc, Wc, n_classes] one-hot
  msk        [B, Hc, Wc, 1]
  proj_hf    [B, P, P, 1]
  proj_seg   [B, P, P, n_classes]
  proj_tlp   [B, 2] (optional — zeros if unused)
  cam_pos    [B, 3], cam_quat [B, 4] (xyzw)
  crp_xy     [B, 2] int32 crop origin (x, y) in the rendered frame
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from gaussiancity_tpu.camera import CameraModel
from gaussiancity_tpu.config import Config
from gaussiancity_tpu.losses import gan_loss, masked_l1
from gaussiancity_tpu.losses.perceptual import PerceptualLoss
from gaussiancity_tpu.models import Discriminator, Generator
from gaussiancity_tpu.ops.rasterizer import rasterize_points14
from gaussiancity_tpu.utils import helpers


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any  # generator batch_stats (PTv3 BN running averages)
    g_opt: Any
    d_params: Optional[Any]
    d_stats: Optional[Any]
    d_opt: Optional[Any]
    ploss_params: Any


def instances_to_classes(instances: jnp.ndarray, bldg_range, facade_clsid,
                         roof_clsid, car_range=None, car_clsid=None):
    """Instance id -> class id (reference: utils/datasets.py:265-282,
    334-352): buildings in range map even->facade / odd->roof; optional car
    range."""
    inst = instances.astype(jnp.int32)
    in_bldg = (inst >= bldg_range[0]) & (inst < bldg_range[1])
    classes = jnp.where(in_bldg & (inst % 2 == 0), facade_clsid, inst)
    classes = jnp.where(in_bldg & (inst % 2 == 1), roof_clsid, classes)
    if car_range is not None:
        in_car = (inst >= car_range[0]) & (inst < car_range[1])
        classes = jnp.where(in_car, car_clsid, classes)
    return classes


def _check_vgg_weights(cfg: Config) -> None:
    """Refuse (or warn unmistakably) when the perceptual loss would train
    on a randomly initialized VGG: a 500-epoch run with a meaningless
    perceptual term is an expensive way to discover a missing env var
    (reference loads torchvision ImageNet weights,
    losses/perceptual.py:180-214)."""
    import os

    if cfg.train.perceptual_loss_factor == 0.0:
        return
    path = os.environ.get("GAUSSIANCITY_VGG19_NPZ")
    if path and os.path.exists(path):
        return
    allow = (cfg.train.allow_random_vgg
             or os.environ.get("GAUSSIANCITY_ALLOW_RANDOM_VGG") == "1")
    msg = (
        "GAUSSIANCITY_VGG19_NPZ is unset or missing (%r): the perceptual "
        "loss will use RANDOM VGG features — training quality cannot match "
        "the reference.  Convert the ImageNet weights once on a networked "
        "machine:  python -c \"import torchvision, numpy as np; from "
        "gaussiancity_tpu.losses.perceptual import convert_torch_state_dict"
        "; np.savez('vgg19.npz', **convert_torch_state_dict(torchvision."
        "models.vgg19(weights='IMAGENET1K_V1').features.state_dict()))\" "
        "and point GAUSSIANCITY_VGG19_NPZ at the file." % (path,))
    if allow:
        logging.warning("=" * 72 + "\n" + msg + "\n" + "=" * 72)
    else:
        raise ValueError(
            msg + "  (Set train.allow_random_vgg=True or "
            "GAUSSIANCITY_ALLOW_RANDOM_VGG=1 to proceed anyway.)")


class Trainer:
    """Owns static model/optimizer/camera objects; provides jittable
    init/train_step/eval_step pure functions."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        ds = cfg.dataset
        self.generator = Generator(
            cfg=cfg.network, n_classes=ds.n_classes, proj_size=ds.proj_size
        )
        self.use_disc = cfg.train.discriminator.enabled
        compute_dtype = (jnp.bfloat16
                         if cfg.train.compute_dtype == "bfloat16" else None)
        self.discriminator = Discriminator(
            n_channel_base=cfg.network.dis_n_channel_base,
            n_classes=ds.n_classes,
            dtype=compute_dtype,
        ) if self.use_disc else None
        _check_vgg_weights(cfg)
        self.ploss = PerceptualLoss(
            network=cfg.train.perceptual_loss_model,
            layers=cfg.train.perceptual_loss_layers,
            weights=cfg.train.perceptual_loss_weights,
            dtype=compute_dtype,
        )
        self.camera = CameraModel(
            jnp.asarray(ds.cam_k).reshape(3, 3), ds.sensor_size
        )
        self.flip_lr = True
        self.flip_ud = ds.flip_ud
        # Train and eval batches are cropped to different sizes
        # (reference: utils/datasets.py:146-253 — RandomCrop train size vs
        # center-crop test size), so the render crop must match the split.
        self.train_crop_size = ds.train_crop_size  # (W, H)
        self.test_crop_size = ds.test_crop_size  # (W, H)

        b1, b2 = cfg.train.betas
        self.g_tx = optax.adam(cfg.train.generator.lr, b1=b1, b2=b2,
                               eps=cfg.train.eps)
        if self.use_disc:
            d_lr = cfg.train.discriminator.lr
            warmup = cfg.train.discriminator.n_warmup_iters

            def d_schedule(step):
                return d_lr * jnp.minimum(1.0, step / warmup)

            self.d_tx = optax.adam(d_schedule, b1=b1, b2=b2, eps=cfg.train.eps)
        else:
            self.d_tx = None

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def init_state(self, rng, batch: Dict[str, jnp.ndarray]) -> TrainState:
        rg, rd, rp, rz = jax.random.split(rng, 4)
        feats = self._point_features(batch, rz)
        # flax .init dispatches op-by-op when unjitted — over a remote
        # device link that is ~1 s/op (a 47M-param init took ~8 min);
        # jit compiles the whole init into one executable
        g_vars = jax.jit(self.generator.init)(
            rg, feats["proj_uv"], feats["rel_xyz"], None, feats["onehots"],
            feats["z"], batch.get("proj_hf"), batch.get("proj_seg"),
            feats["pts_mask"],
        )
        g_params = g_vars["params"]
        g_stats = g_vars.get("batch_stats", {})
        if self.use_disc:
            d_vars = jax.jit(self.discriminator.init)(
                rd, batch["rgb"], batch["seg"], batch["msk"])
            d_params = d_vars["params"]
            d_stats = d_vars.get("batch_stats", {})
            d_opt = self.d_tx.init(d_params)
        else:
            d_params = d_stats = d_opt = None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_stats=g_stats,
            g_opt=self.g_tx.init(g_params),
            d_params=d_params,
            d_stats=d_stats,
            d_opt=d_opt,
            ploss_params=self.ploss.init(rp, (1, 64, 64, 3)),
        )

    # ------------------------------------------------------------------
    # Forward helpers
    # ------------------------------------------------------------------

    def _point_features(self, batch, rng_z):
        ds = self.cfg.dataset
        pts = batch["pts"]
        abs_xyz = pts[..., 0:3]
        rel_xyz = pts[..., 5:8]
        instances = pts[..., 4]
        classes = instances_to_classes(
            instances, ds.bldg_range, ds.bldg_facade_clsid, ds.bldg_roof_clsid,
            ds.car_range, ds.car_clsid,
        )
        scales = pts[..., 3:4] * self.cfg.network.scale_factor
        scales3 = helpers.get_point_scales(
            scales, classes, ds.z_scale_special_classes
        )
        onehots = helpers.get_one_hot(classes, ds.n_classes)
        z = helpers.get_z(rng_z, instances.astype(jnp.int32),
                          self.cfg.network.z_dim)
        proj_tlp = batch.get("proj_tlp")
        proj_uv = helpers.get_projection_uv(abs_xyz, proj_tlp, ds.proj_size)
        return dict(
            abs_xyz=abs_xyz, rel_xyz=rel_xyz, scales3=scales3,
            onehots=onehots, z=z, proj_uv=proj_uv,
            pts_mask=batch.get("pts_mask"),
        )

    def _render_fake(self, g_params, batch, feats, crop_size=None,
                     g_stats=None, train=False, dp_rng=None):
        """Generator fwd -> pack -> rasterize -> flips -> crop.
        Returns ([B, Hc, Wc, 3] NHWC, (diagnostics dict, new batch_stats)).

        ``crop_size`` is the static (W, H) of the batch's image crop; it
        defaults to the train crop, eval passes the test crop.
        ``g_stats`` is the generator's "batch_stats" collection (PTv3 BN
        running averages); with ``train=True`` the batch statistics are
        folded into it and the updated collection is returned.  ``dp_rng``
        drives PTv3 stochastic depth (active only in training, like the
        reference's module.train() mode — models/pt_v3.py:954)."""
        has_stats = (g_stats is not None
                     and len(jax.tree_util.tree_leaves(g_stats)) > 0)
        vars_in = {"params": g_params}
        if has_stats:
            vars_in["batch_stats"] = g_stats
        mutable = ["intermediates"]
        if train and has_stats:
            mutable.append("batch_stats")
        attrs, g_vars = self.generator.apply(
            vars_in, feats["proj_uv"], feats["rel_xyz"], None,
            feats["onehots"], feats["z"], batch.get("proj_hf"),
            batch.get("proj_seg"), feats["pts_mask"], train,
            mutable=mutable,
            rngs={"droppath": dp_rng} if dp_rng is not None else None,
        )
        new_stats = g_vars.get("batch_stats", g_stats)
        # PTv3 pooled-capacity overflow counters (models/ptv3.py sow);
        # empty tree when PTv3 is off.
        over_leaves = jax.tree_util.tree_leaves(
            g_vars.get("intermediates", {}))
        pool_overflow = (sum(jnp.sum(l) for l in over_leaves)
                         if over_leaves else jnp.zeros((), jnp.int32))
        gs_pts = helpers.get_gaussian_points(
            feats["abs_xyz"], feats["scales3"], attrs)
        B = gs_pts.shape[0]
        assert B == 1, "fused train step is per-device batch-size 1 " \
            "(reference: core/train.py:46); scale via the data mesh axis"
        cam = self.camera.params_traced(batch["cam_pos"][0],
                                        batch["cam_quat"][0])
        # Render ONLY the crop window (the reference renders the full
        # sensor and crops, utils/helpers.py:261-267 — same pixels, ~2x
        # wasted blend work).  The batch's crp_xy addresses the FLIPPED
        # image, so map it to pre-flip sensor coordinates and flip the
        # small render instead.
        Wc, Hc = crop_size if crop_size is not None else self.train_crop_size
        # clamp like the old render-then-dynamic_slice path did: a
        # malformed crp_xy must stay inside the physical sensor
        xy = jnp.clip(batch["crp_xy"][0],
                      0, jnp.asarray([self.camera.sensor_size[0] - Wc,
                                      self.camera.sensor_size[1] - Hc]))
        W, H = self.camera.sensor_size
        xw = (W - xy[0] - Wc) if self.flip_lr else xy[0]
        yw = (H - xy[1] - Hc) if self.flip_ud else xy[1]
        out = rasterize_points14(
            gs_pts[0], cam, self.cfg.rasterizer,
            valid=feats["pts_mask"][0] if feats["pts_mask"] is not None else None,
            window=(xw, yw, Wc, Hc),
        )
        img = out.image  # [3, Hc, Wc]
        if self.flip_lr:
            img = img[:, :, ::-1]
        if self.flip_ud:
            img = img[:, ::-1, :]
        img = img.transpose(1, 2, 0)  # HWC
        # Binning-overflow diagnostics: nonzero means the render silently
        # truncated Gaussian/tile pairs (tile_capacity or
        # max_tiles_per_gaussian exceeded) — must be surfaced, never dropped.
        diag = {  # float32 so pmean over the data axis is well-defined
            "RasterDroppedPairs": out.n_dropped_pairs.astype(jnp.float32),
            "RasterTruncated": out.n_truncated.astype(jnp.float32),
            "RasterGradTruncated": out.n_grad_truncated.astype(jnp.float32),
            "PTv3PoolOverflow": pool_overflow.astype(jnp.float32),
        }
        return img[None], (diag, new_stats)

    # ------------------------------------------------------------------
    # Train step
    # ------------------------------------------------------------------

    def train_step(self, state: TrainState, batch, rng,
                   axis_name: Optional[str] = None
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg.train
        rng_z, rng_dp = jax.random.split(rng)
        feats = self._point_features(batch, rng_z)
        gan_w = batch["msk"][:, ::4, ::4, :]  # nearest 0.25x (train.py:204)

        metrics = {}

        def psum_grads(g):
            if axis_name is not None:
                return jax.lax.pmean(g, axis_name)
            return g

        # ---------------- single render, shared D/G ----------------
        # The reference renders the fake image twice per step — once
        # detached for the D update (core/train.py:238-244) and once with
        # grad for the G update (:274) — only because torch frees the
        # graph after backward.  G is unchanged between the two, so the
        # renders are numerically identical: render ONCE via jax.vjp,
        # feed the stop-gradient value to the D step, and pull the G
        # cotangent through the saved residuals afterwards.  Saves a full
        # generator+rasterizer forward per step.
        fake_imgs, render_vjp, (raster_diag, g_stats) = jax.vjp(
            lambda p: self._render_fake(p, batch, feats,
                                        g_stats=state.g_stats, train=True,
                                        dp_rng=rng_dp),
            state.g_params, has_aux=True)
        fake_sg = jax.lax.stop_gradient(fake_imgs)
        metrics.update(raster_diag)

        # ---------------- D step ----------------
        if self.use_disc:
            def d_loss_fn(d_params, d_stats):
                vars_in = {"params": d_params, "batch_stats": d_stats}
                fake_out, vs = self.discriminator.apply(
                    vars_in, fake_sg, batch["seg"], batch["msk"],
                    mutable=["batch_stats"])
                vars_in = {"params": d_params,
                           "batch_stats": vs["batch_stats"]}
                real_out, vs = self.discriminator.apply(
                    vars_in, batch["rgb"], batch["seg"], batch["msk"],
                    mutable=["batch_stats"])
                fake_loss = gan_loss(fake_out["pred"], fake_out["label"],
                                     False, gan_w, dis_update=True)
                real_loss = gan_loss(real_out["pred"], real_out["label"],
                                     True, gan_w, dis_update=True)
                return fake_loss + real_loss, (fake_loss, real_loss,
                                               vs["batch_stats"])

            (loss_d, (fake_l, real_l, d_stats)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params, state.d_stats)
            d_grads = psum_grads(d_grads)
            d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            state = state.replace(d_params=d_params, d_stats=d_stats,
                                  d_opt=d_opt)
            metrics.update(DisLoss=loss_d, GANLossFake=fake_l,
                           GANLossReal=real_l)
        else:
            metrics.update(DisLoss=0.0, GANLossFake=0.0, GANLossReal=0.0)

        # ---------------- G step ----------------
        # Loss as a function of the rendered image; the param cotangent is
        # pulled through the saved render residuals (render_vjp) below.
        def g_loss_fn(fake, d_stats):
            if self.use_disc:
                out, vs = self.discriminator.apply(
                    {"params": state.d_params, "batch_stats": d_stats},
                    fake, batch["seg"], batch["msk"],
                    mutable=["batch_stats"])
                _gan = gan_loss(out["pred"], out["label"], True, gan_w,
                                dis_update=False)
                d_stats = vs["batch_stats"]
            else:
                _gan = jnp.float32(0.0)
            _l1 = masked_l1(fake, batch["rgb"], batch["msk"])
            _pl = self.ploss(state.ploss_params, fake * batch["msk"],
                             batch["rgb"] * batch["msk"])
            loss = (_l1 * cfg.l1_loss_factor
                    + _pl * cfg.perceptual_loss_factor
                    + _gan * cfg.gan_loss_factor)
            return loss, (_l1, _pl, _gan, d_stats)

        (loss_g, (_l1, _pl, _gan, d_stats)), img_grad = jax.value_and_grad(
            g_loss_fn, has_aux=True)(fake_imgs, state.d_stats)
        (g_grads,) = render_vjp(img_grad)
        g_grads = psum_grads(g_grads)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        state = state.replace(
            g_params=g_params, g_stats=g_stats, g_opt=g_opt,
            step=state.step + 1,
            d_stats=d_stats if self.use_disc else state.d_stats,
        )
        metrics.update(GenLoss=loss_g, L1Loss=_l1, PerceptualLoss=_pl,
                       GANLoss=_gan)
        return state, metrics

    # ------------------------------------------------------------------
    # Eval step (reference: core/test.py:66-124)
    # ------------------------------------------------------------------

    def eval_step(self, state: TrainState, batch, rng):
        feats = self._point_features(batch, rng)
        fake, (diag, _) = self._render_fake(state.g_params, batch, feats,
                                            crop_size=self.test_crop_size,
                                            g_stats=state.g_stats,
                                            train=False)
        l1 = masked_l1(fake, batch["rgb"], batch["msk"])
        return {"L1Loss": l1, **diag}, fake


def make_train_step(trainer: Trainer):
    """Single-device jitted train step."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        return trainer.train_step(state, batch, rng)

    return step


def make_parallel_train_step(trainer: Trainer, mesh):
    """Data-parallel train step over mesh axis 'data': params replicated,
    batch sharded, gradients pmean'd over ICI — the reference's DDP
    all-reduce (core/train.py:78-87) as XLA collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("data"), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    def step(state, batch, rng):
        # independent per-shard randomness (z codes), like the reference's
        # per-rank sampling under DDP
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        state, metrics = trainer.train_step(state, batch, rng,
                                            axis_name="data")
        # keep the replicated state bitwise identical across shards: the
        # spectral-norm power-iteration vectors are data-dependent (torch
        # DDP leaves them per-rank-divergent; we pmean them instead)
        if state.d_stats is not None:
            state = state.replace(
                d_stats=jax.lax.pmean(state.d_stats, "data"))
        # BN running averages likewise (torch DDP instead broadcasts
        # rank 0's buffers each forward; pmean keeps the same invariant —
        # identical replicated state — without the asymmetry)
        state = state.replace(g_stats=jax.lax.pmean(state.g_stats, "data"))
        metrics = {k: jax.lax.pmean(v, "data") for k, v in metrics.items()}
        return state, metrics

    return jax.jit(step, donate_argnums=(0,)), repl, shard
