"""Stage 3b — SR fine-tune of the main network (x2 per axis).

Reference: models/main_sr_model.py. Same net set as MainModel; inputs arrive
as HR (2x crop) depth+image pairs from the naive SR dataset. The I2D guidance
runs at LR — the HR image is bicubic-downsampled to (crop_h, crop_w) for
``I2D_features``, then the predicted depth and features are bicubic-upsampled
x2 (:278-293); depth features and Task run at 2x resolution producing
``pred_real_depth_hr``; losses compare at both LR and HR (:391-484). All
bicubic/nearest resizes use torch-exact kernels (desr_tpu.ops.resize).

As-shipped quirks preserved (they affect the trained weights):
- random holes use size fractions //150..//10 and p=0.95 (real) / 0.90 (syn)
  (:296-337);
- ``loss_syn_norms`` compares norm_syn vs norm_real_pred_hr (:434), and
  norm_real_pred_hr is computed with K_A/crop_A (:431);
- ``task_real_by_image`` anchors to nearest-resized **syn_depth** (:452);
- loss weights differ from MainModel: tv_real_norm x2, syn_norms_old x5,
  tv_real_norm_old x2 (:455).
- ``--use_D`` references a ``loss_G_pred`` that main_sr_model never computes
  (:466, no backward_features) — rejected with a clear error.
- ``--use_rec_as_real_input`` defines a zoo-A ``netG_B_d`` (:170-171) that is
  excluded from ``model_names`` (:137): it is never checkpoint-loaded, never
  saved, and never optimized — the real branch is re-degraded through a
  FROZEN RANDOM-INIT net (:263-265). The reference CRASHES on that line: it
  feeds ``netG_A_d`` one pre-concatenated 4-channel tensor, but the
  two-encoder Generator requires separate (depth, img) args
  (translation_network.py:643 calls ``enc_img(None)`` -> TypeError). Fixed
  here with the evident intent ``G_A_d(r2s, real_image)``; the
  never-loaded/frozen G_B_d quirks are preserved (QUIRKS #31).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from desr_tpu.models import networks, translation_networks
from desr_tpu.models.base_model import BaseModel, split_trainable
from desr_tpu.models.layers import Ctx, ctx_flags
from desr_tpu.models.main_model import BORDER, MainModel, _maybe_remat
from desr_tpu.ops import depth as DPT
from desr_tpu.ops import losses as L
from desr_tpu.ops import pallas_kernels as PK
from desr_tpu.ops import normals as NRM
from desr_tpu.ops.optim import adam_init, adam_update
from desr_tpu.ops.resize import (
    resize_bicubic,
    resize_bicubic_planar,
    resize_nearest,
    resize_nearest_planar,
)


class MainSRModel(MainModel):
    _default_remat_tails = True  # +10% at the SR shape (see --remat_tails help)
    _supports_rec_input = True   # main_sr_model.py:170-171 defines netG_B_d

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        return MainModel.modify_commandline_options(parser, is_train)

    def __init__(self, opt):
        if opt.use_D:
            raise NotImplementedError(
                "--use_D in the SR model references loss_G_pred that the reference "
                "never computes (main_sr_model.py:466); unsupported")
        super().__init__(opt)
        if getattr(opt, "use_rec_as_real_input", False):
            # --use_rec_as_real_input (main_sr_model.py:170-171): a zoo-A
            # generator re-degrades the real branch before masking. QUIRKS
            # #31: the reference leaves G_B_d out of model_names (:137), so
            # it is never checkpoint-loaded/saved and never optimized — it
            # runs frozen at random init (translation_input_d=4: the
            # non-image path is gated above via --use_image_for_trans).
            self.nets["G_B_d"] = networks.define_G(
                4, 1, opt.ngf, opt.netG, opt.norm, not opt.no_dropout,
                opt.init_type, opt.init_gain, opt.replace_transpose)

    def init_params(self, seed=0):
        super().init_params(seed)
        if "G_B_d" in self.nets:
            key = jax.random.PRNGKey(seed)
            self.params["G_B_d"] = self.nets["G_B_d"].init(jax.random.fold_in(key, 97))

    def save_networks(self, epoch):
        # G_B_d is absent from the reference's model_names (main_sr_model.py:137):
        # it is never written to (or read from) checkpoints
        gbd = self.params.pop("G_B_d", None)
        try:
            super().save_networks(epoch)
        finally:
            if gbd is not None:
                self.params["G_B_d"] = gbd

    def load_networks(self, epoch):
        gbd = self.params.pop("G_B_d", None)
        try:
            super().load_networks(epoch)
        finally:
            if gbd is not None:
                self.params["G_B_d"] = gbd

    # override the whole forward/loss pipeline for the SR dataflow
    def _forward_fn(self):
        opt = self.opt
        dtype = self.compute_dtype
        g_a_d = self.nets["G_A_d"]
        g_b_d = self.nets.get("G_B_d")  # --use_rec_as_real_input only
        i2d_f = self.nets["I2D_features"]
        i2d = self.nets["Image2Depth"]
        depth_f = self.nets["Depth_f"]
        task = self.nets["Task"]
        lr_hw = (opt.crop_size_h, opt.crop_size_w)
        hr_hw = (opt.crop_size_h * 2, opt.crop_size_w * 2)
        remat = _maybe_remat(getattr(opt, "remat", False))
        # --bf16_tail: see MainModel._forward_fn
        tail = jnp.bfloat16 if getattr(opt, "bf16_tail", False) else jnp.float32

        mesh = self.mesh

        def forward(params, batch, rng, train):
            ctx = Ctx(train=train, rng=rng, dtype=dtype, mesh=mesh,
                      **ctx_flags(opt))
            # frozen nets run forward-only: chain fusion applies under both
            # --pallas_fuse and --pallas_fuse_frozen (see the flag help)
            ctx_f = dataclasses.replace(
                ctx, pallas_fuse=getattr(opt, "pallas_fuse", False) in (True, "frozen"))
            ga_ap = remat(lambda p, d, im: g_a_d.apply(p, d, im, ctx_f))
            i2df_ap = remat(lambda p, x: i2d_f.apply(p, x, ctx_f))
            i2d_ap = remat(lambda p, x: i2d.apply(p, x, ctx_f))
            depthf_ap = remat(lambda p, x: depth_f.apply(p, x, ctx))
            # channel-split entry: the 4-tensor input concat never materializes
            task_ap = remat(lambda p, *parts: task.apply_parts(p, parts, ctx))

            syn_image, real_image = batch["A_i"].astype(dtype), batch["B_i"].astype(dtype)
            # planar (B, H, W) depth maps for the mask/loss tail (see MainModel)
            syn_depth = batch["A_d"][..., 0]
            real_depth = batch["B_d"][..., 0]

            real_hole_mask = DPT.hole_mask(real_depth, BORDER)
            real_mask = DPT.valid_mask(real_depth, BORDER)
            syn_mask = DPT.valid_mask(syn_depth, BORDER)

            syn2real = ga_ap(params["G_A_d"], batch["A_d"].astype(dtype),
                             syn_image)[..., 0].astype(tail)

            if g_b_d is not None:
                # --use_rec_as_real_input (main_sr_model.py:263-265): the real
                # branch is re-degraded r2s = G_B_d(real_depth ++ real_image)
                # then re-translated real_rec = G_A_d(r2s, real_image) before
                # masking. Both nets are frozen (out of the optimizer); the
                # hole/valid masks above stay on the ORIGINAL real_depth, and
                # the loss tail still compares against the original (:394-398).
                gb_ap = remat(lambda p, x: g_b_d.apply(p, x, ctx_f))
                r2s = gb_ap(params["G_B_d"], jnp.concatenate(
                    [batch["B_d"].astype(dtype), real_image], axis=-1))
                real_input_depth = ga_ap(params["G_A_d"], r2s.astype(dtype),
                                         real_image)[..., 0].astype(tail)
            else:
                real_input_depth = real_depth

            def guidance(image):
                lr_img = resize_bicubic(image.astype(jnp.float32), lr_hw).astype(dtype)
                feats = i2df_ap(params["I2D_features"], lr_img)
                dbi = i2d_ap(params["Image2Depth"], feats)[..., 0].astype(tail)
                dbi_hr = resize_bicubic_planar(dbi, hr_hw)
                feats_hr = resize_bicubic(feats.astype(jnp.float32), hr_hw).astype(dtype)
                return feats_hr, dbi_hr

            # real/syn branches batched through shared-weight nets — identical
            # math (per-sample norms, no dropout), half the op/layout overhead
            # (see MainModel._forward_fn and PERF.md round 2)
            batched = not getattr(opt, "no_batched_branches", False)
            bsz = real_image.shape[0]
            if batched:
                feats_both, dbi_both = guidance(
                    jnp.concatenate([syn_image, real_image], axis=0))
                feats_syn, feats_real = feats_both[:bsz], feats_both[bsz:]
                syn_dbi, real_dbi = dbi_both[:bsz], dbi_both[bsz:]
            else:
                feats_real, real_dbi = guidance(real_image)
                feats_syn, syn_dbi = guidance(syn_image)

            if opt.use_masked:
                n = 60 if train else 11
                p_real = 0.95 if train else 0.0  # main_sr_model.py:299
                p_syn = 0.90 if train else 0.0   # main_sr_model.py:320
                k1, k2 = jax.random.split(jax.random.fold_in(rng, 17))
                gt_mask_real = DPT.random_rect_holes(k1, real_mask, n_max=n, p=p_real,
                                                     max_frac=10)
                depth_masked = DPT.punch_holes(real_input_depth, gt_mask_real)
                gt_mask_syn = DPT.random_rect_holes(k2, syn_mask, n_max=n, p=p_syn,
                                                    max_frac=10)
                syn2real_masked = DPT.punch_holes(syn2real, gt_mask_syn)
            else:
                gt_mask_real = jnp.ones_like(real_mask)
                gt_mask_syn = jnp.ones_like(syn_mask)
                depth_masked = real_input_depth
                syn2real_masked = syn2real

            real_pair = jnp.stack([depth_masked, real_dbi], axis=-1).astype(dtype)
            syn_pair = jnp.stack([syn2real_masked, syn_dbi], axis=-1).astype(dtype)
            if batched:
                pair_both = jnp.concatenate([syn_pair, real_pair], axis=0)
                feat_both_d = depthf_ap(params["Depth_f"], pair_both)
                pred_both = task_ap(
                    params["Task"], feats_both, feat_both_d, pair_both,
                    jnp.concatenate([syn_image, real_image], axis=0),
                )[..., 0].astype(tail)
                pred_syn, pred_real_hr = pred_both[:bsz], pred_both[bsz:]
            else:
                feat_real_d = depthf_ap(params["Depth_f"], real_pair)
                pred_real_hr = task_ap(params["Task"], feats_real, feat_real_d,
                                       real_pair, real_image)[..., 0].astype(tail)
                feat_syn_d = depthf_ap(params["Depth_f"], syn_pair)
                pred_syn = task_ap(params["Task"], feats_syn, feat_syn_d,
                                   syn_pair, syn_image)[..., 0].astype(tail)

            pred_real = resize_bicubic_planar(pred_real_hr, lr_hw)

            return dict(
                syn_image=batch["A_i"], real_image=batch["B_i"],
                syn_depth=syn_depth, real_depth=real_depth,
                real_hole_mask=real_hole_mask, real_mask=real_mask, syn_mask=syn_mask,
                syn2real_depth=syn2real, syn_depth_by_image=syn_dbi,
                real_depth_by_image=real_dbi, gt_mask_real=gt_mask_real,
                gt_mask_syn=gt_mask_syn, depth_masked=depth_masked,
                syn2real_depth_masked=syn2real_masked,
                pred_syn_depth=pred_syn, pred_real_depth_hr=pred_real_hr,
                pred_real_depth=pred_real,
            )

        return forward

    def _losses_fn(self):
        opt = self.opt
        lr_hw = (opt.crop_size_h, opt.crop_size_w)

        # --bf16_normals (A/B, VERDICT r3 #7): run the K-normals chain in
        # bf16 (default fp32, validated < 2e-3 vs the fp64 oracle; bf16 is a
        # measured-speed A/B, oracles run with it off)
        norm_dt = (jnp.bfloat16 if getattr(opt, "bf16_normals", False)
                   else jnp.float32)

        def losses(f, batch):
            m = {}
            syn_depth = f["syn_depth"]
            pred_syn = f["pred_syn_depth"]
            pred_real = f["pred_real_depth"]       # LR
            pred_real_hr = f["pred_real_depth_hr"]  # HR
            syn_mask = f["syn_mask"]

            # LR-resize the real branch (main_sr_model.py:394-398); planar maps
            real_mask = resize_nearest_planar(f["real_mask"], lr_hw)
            real_hole_mask = resize_nearest_planar(f["real_hole_mask"], lr_hw)
            real_depth = resize_bicubic_planar(f["real_depth"], lr_hw)
            real_image = resize_bicubic(f["real_image"], lr_hw)

            c = (f["syn2real_depth_masked"] < BORDER) | (f["gt_mask_syn"] < 0.1)
            mask_syn_add_holes = jnp.where(c, 1.0, 0.0)

            zero = jnp.zeros((), jnp.float32)
            m["tv_syn_norm"] = m["tv_real_norm"] = zero
            m["tv_syn_norm_old"] = m["tv_real_norm_old"] = zero
            m["syn_norms_old"] = m["syn_norms_holes"] = m["syn_norms"] = zero
            if opt.norm_loss:
                mask1 = syn_mask[:, None]  # broadcast over the 3 normal channels
                # legacy image-space normals x100 (:400-410)
                norm_syn_o = NRM.surface_normals_planar(syn_depth) * 100
                norm_syn_pred_o = NRM.surface_normals_planar(pred_syn) * 100
                norm_real_pred_hr_o = NRM.surface_normals_planar(pred_real_hr) * 100
                m["tv_syn_norm_old"] = L.tv_loss_planar(norm_syn_pred_o) * 1e-7
                m["tv_real_norm_old"] = L.tv_loss_planar(norm_real_pred_hr_o) * 1e-7
                m["syn_norms_old"] = L.l1_loss(norm_syn_o, norm_syn_pred_o)  # unmasked L1 (:410)
                # K-based normals (:422-435)
                K_A, K_B = batch["K_A"], batch["K_B"]
                crop_A, crop_B = batch["crop_A"], batch["crop_B"]
                norm_syn = NRM.surface_normals_from_K_planar(syn_depth, K_A, crop_A, dtype=norm_dt)
                norm_syn_pred = NRM.surface_normals_from_K_planar(pred_syn, K_A, crop_A, dtype=norm_dt)
                norm_real_pred = NRM.surface_normals_from_K_planar(pred_real, K_B, crop_B, dtype=norm_dt)
                # as-shipped: HR real pred normals use K_A/crop_A (:431)
                norm_real_pred_hr = NRM.surface_normals_from_K_planar(pred_real_hr, K_A, crop_A, dtype=norm_dt)
                m["tv_syn_norm"] = L.tv_loss_planar(norm_syn_pred) * 1e-7
                m["tv_real_norm"] = L.tv_loss_planar(norm_real_pred) * 1e-7
                # as-shipped: syn normals vs HR REAL pred normals, MSE (:434)
                m["syn_norms"] = L.mse_loss(norm_syn * mask1, norm_real_pred_hr * mask1)
                mask2 = (syn_mask * mask_syn_add_holes)[:, None]
                m["syn_norms_holes"] = L.l1_loss(norm_syn * mask2, norm_syn_pred * mask2)

            if getattr(opt, "pallas_losses", False):
                # one fused HBM pass for the (task, holes, holes_l2) triplet
                # (pallas kernel with custom VJP, ops/pallas_kernels.py)
                m["task_syn"], m["holes_syn"], m["holes_syn_l2"] = PK.fused_hole_means(
                    pred_syn, syn_depth, syn_mask, mask_syn_add_holes)
            else:
                m["holes_syn"] = L.l1_loss(syn_depth * syn_mask * mask_syn_add_holes,
                                           pred_syn * syn_mask * mask_syn_add_holes)
                m["holes_syn_l2"] = L.mse_loss(syn_depth * syn_mask * mask_syn_add_holes,
                                               pred_syn * syn_mask * mask_syn_add_holes) * 5
                m["task_syn"] = L.l1_loss(syn_depth * syn_mask, pred_syn * syn_mask)
            m["task_real_by_depth"] = L.l1_loss(real_depth * real_mask, pred_real * real_mask)
            # as-shipped: anchored to nearest-resized SYN depth (:452)
            syn_depth_lr = resize_nearest_planar(syn_depth, lr_hw)
            m["task_real_by_image"] = L.l1_loss(syn_depth_lr * real_hole_mask,
                                                pred_real * real_hole_mask)

            # weighted sum (:455)
            loss_g = (m["task_syn"] * opt.w_syn_l1
                      + m["holes_syn"] * opt.w_syn_holes
                      + m["holes_syn_l2"] * opt.w_syn_holes
                      + m["task_real_by_depth"] * opt.w_real_l1_d
                      + m["task_real_by_image"] * opt.w_real_l1_i
                      + m["tv_syn_norm"] * 1 + m["syn_norms_holes"] * opt.w_syn_norm * 5
                      + m["tv_real_norm"] * 2 + m["syn_norms_old"] * opt.w_syn_norm * 5
                      + m["tv_real_norm_old"] * 2 + m["tv_syn_norm_old"] * 1)

            if opt.use_masked:
                mask_real_add_holes = jnp.where(f["gt_mask_real"] > 0.1, 0.0, 1.0)
                mask_real_add_holes = resize_nearest_planar(mask_real_add_holes, lr_hw)
                if getattr(opt, "pallas_losses", False):
                    m["holes_real"], _, m["holes_real_l2"] = PK.fused_hole_means(
                        pred_real, real_depth, mask_real_add_holes,
                        jnp.ones_like(mask_real_add_holes))
                else:
                    m["holes_real"] = L.l1_loss(real_depth * mask_real_add_holes,
                                                pred_real * mask_real_add_holes)
                    m["holes_real_l2"] = L.mse_loss(real_depth * mask_real_add_holes,
                                                    pred_real * mask_real_add_holes) * 5
                loss_g = loss_g + (m["holes_real"] + m["holes_real_l2"]) * opt.w_real_holes

            if opt.norm_loss:
                loss_g = loss_g + m["syn_norms"] * opt.w_syn_norm
            if opt.use_smooth_loss:
                img_planar = jnp.moveaxis(real_image, -1, 1)
                m["smooth"] = L.smooth_weight_loss_planar(pred_real, img_planar, 3)
                loss_g = loss_g + m["smooth"] * opt.w_smooth

            loss_g = loss_g * opt.scale_G
            m["G"] = loss_g

            m["syn_mean_diff"] = jnp.mean(syn_depth * syn_mask) - jnp.mean(pred_syn * syn_mask)
            m["real_mean_diff"] = jnp.mean(real_depth * real_mask) - jnp.mean(pred_real * real_mask)
            m["mean_of_abs_diff_syn"] = jnp.mean(jnp.abs(syn_depth * syn_mask - pred_syn * syn_mask))
            m["mean_of_abs_diff_real"] = jnp.mean(jnp.abs(real_depth * real_mask - pred_real * real_mask))
            m["L1_syn"] = m["mean_of_abs_diff_syn"]
            m["L1_real"] = m["mean_of_abs_diff_real"]
            return loss_g, m

        return losses

    def _dump_predictions(self, f):
        """uint16 PNG dump at HR, [:, 32:-32, :] row crop (main_sr_model.py:376-387)."""
        from desr_tpu.utils.util import save_uint16_png

        os.makedirs(self.opt.save_image_folder, exist_ok=True)
        pred = np.asarray(f["pred_real_depth_hr"])  # planar (B, H, W)
        for i, path in enumerate(self._paths["B_paths"] or []):
            stem = str(path).split("/")[-1].split(".")[0]
            out = np.clip((pred[i, 32:-32, :] + 1) / 2, 0, 1)
            save_uint16_png(out, os.path.join(self.opt.save_image_folder, f"{stem}.png"))
