"""Stage 3 — Main depth-enhancement network.

Reference: models/main_model.py. Frozen stage-1/2 nets (``G_A_d`` translator,
``I2D_features`` + ``Image2Depth`` guidance) produce a realistically-degraded
synthetic depth and an image-predicted depth prior; trainable ``Depth_f`` +
``Task`` fuse them to inpaint holes and denoise (:127-177). Only Depth_f+Task
receive optimizer updates (:176); the frozen nets are loaded from stage-1/2
checkpoints via the tolerant partial merge (README.md:58-66).

TPU-native deltas from the reference (behavior-preserving):
- the random-rectangle hole synthesis, a per-sample host numpy loop in the
  reference (:257-298), is vectorized jax.random code inside the jitted step;
- the 4-shift hole-dilation (:208-230) is one fused reduce-window;
- the fp64 K-based normals (:360-372) run in fp32 (validated vs fp64 oracle);
- the whole forward+backward+Adam update is ONE jitted, data-parallel program.

As-shipped quirks preserved / handled:
- ``--use_image_for_trans`` is effectively mandatory (the non-image path
  references an undefined ``netG_B_d``, :241-249); we raise a clear error.
- without ``--use_masked`` the reference crashes on ``self.depth_masked``
  (:303); we fall back to the unmasked real depth.
- ``--use_edge`` references an undefined CannyFilter (:374-379) — rejected
  with a clear error instead of the reference's NameError.
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
from desr_tpu.ops import depth as DPT
from desr_tpu.ops import losses as L
from desr_tpu.ops import pallas_kernels as PK
from desr_tpu.ops import normals as NRM
from desr_tpu.ops.optim import adam_init, adam_update

BORDER = -0.97  # main_model.py:133


def _maybe_remat(enabled):
    """Return a wrapper that optionally jax.checkpoint's a net's apply.

    With remat on, each net's forward is recomputed during backward instead of
    storing all intra-net activations — peak activation HBM becomes the max
    over nets rather than the sum (needed for full-res SR batches).
    """
    if not enabled:
        return lambda fn: fn
    return lambda fn: jax.checkpoint(fn)


class MainModel(BaseModel):
    # tail remat measured -7% at the main stage's batch-6 384x512 shape
    # (21.2 vs 22.8 pairs/s on v5e) while every other stage gains — see
    # --remat_tails help; MainSRModel flips this back to True
    _default_remat_tails = False
    # --use_rec_as_real_input exists only in the SR stage (QUIRKS #31)
    _supports_rec_input = False

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        # reference main_model.py:79-87
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0)
            parser.add_argument("--lambda_B", type=float, default=10.0)
            parser.add_argument("--lambda_identity", type=float, default=0.5)
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        if opt.use_edge:
            raise NotImplementedError(
                "--use_edge references an undefined CannyFilter in the reference "
                "(main_model.py:374-379) and is not supported")
        self.loss_names = [
            "task_syn", "holes_syn", "holes_syn_l2", "task_real_by_depth",
            "task_real_by_image", "syn_mean_diff", "real_mean_diff",
            "tv_syn_norm", "tv_real_norm", "syn_norms_holes",
            "tv_syn_norm_old", "tv_real_norm_old", "syn_norms_old",
        ]
        if opt.norm_loss:
            self.loss_names += ["syn_norms"]
        if opt.use_smooth_loss:
            self.loss_names += ["smooth"]
        if opt.use_masked:
            self.loss_names += ["holes_real", "holes_real_l2"]
        if opt.print_mean:
            self.loss_names = ["syn_mean_diff", "real_mean_diff",
                               "mean_of_abs_diff_syn", "mean_of_abs_diff_real",
                               "L1_syn", "L1_real"]
        self.visual_names = [
            "syn_image", "syn_depth", "syn2real_depth", "syn_mask", "pred_syn_depth",
            "mask_syn_add_holes", "syn_depth_by_image", "real_image", "real_depth",
            "real_depth_by_image", "pred_real_depth", "real_mask", "mask_real_add_holes",
            "depth_masked", "syn2real_depth_masked",
            "norm_syn", "norm_syn_pred", "norm_syn2real", "norm_real", "norm_real_pred",
        ]
        self.model_names = ["G_A_d", "I2D_features", "Image2Depth", "Task", "Depth_f"]

        self.nets["I2D_features"] = networks.define_G(
            3, opt.ImageDepthf_outf, opt.ImageDepthf_basef, opt.ImageDepthf_type,
            opt.norm, not opt.no_dropout, opt.init_type, opt.init_gain,
            opt.replace_transpose)
        self.nets["Image2Depth"] = networks.define_G(
            opt.ImageDepthf_outf, 1, opt.I2D_base, opt.I2D_type, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain, opt.replace_transpose)
        # frozen translator, hardcoded config (main_model.py:147-148)
        self.nets["G_A_d"] = translation_networks.define_Gen(
            translation_networks.default_translator_opt(), input_type="img_depth")
        self.nets["Depth_f"] = networks.define_G(
            2, opt.Depthf_outf, opt.Depthf_basef, opt.Depthf_type, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain,
            opt.replace_transpose, n_down=opt.Depthf_ndown)
        task_in = opt.ImageDepthf_outf + 5 + opt.Depthf_outf
        self.nets["Task"] = networks.define_G(
            task_in, 1, opt.Task_basef, opt.Task_type, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain,
            opt.replace_transpose, n_down=opt.Task_ndown)

        if not opt.use_image_for_trans:
            raise NotImplementedError(
                "the reference's non-image translation path requires netG_B_d, "
                "which MainModel never defines (main_model.py:241-249); pass "
                "--use_image_for_trans")
        if getattr(opt, "use_rec_as_real_input", False) and not self._supports_rec_input:
            # QUIRKS #31: the reference MainModel crashes here too — it calls
            # self.netG_B_d (main_model.py:236-239) without ever defining it;
            # only the SR stage defines G_B_d (main_sr_model.py:170-171)
            raise NotImplementedError(
                "--use_rec_as_real_input crashes the reference main stage "
                "(undefined netG_B_d, main_model.py:236-239); it is only "
                "supported with --SR")

        self._trainable_nets = ["Depth_f", "Task"]

    # ------------------------------------------------------------------

    def _forward_fn(self):
        opt = self.opt
        dtype = self.compute_dtype
        g_a_d = self.nets["G_A_d"]
        i2d_f = self.nets["I2D_features"]
        i2d = self.nets["Image2Depth"]
        depth_f = self.nets["Depth_f"]
        task = self.nets["Task"]
        remat = _maybe_remat(getattr(opt, "remat", False))
        # --bf16_tail (A/B, VERDICT r3 #7): keep the net outputs feeding the
        # loss tail in bf16 instead of materializing fp32 copies — the loss
        # math still promotes to fp32 against the fp32 batch targets, but the
        # VJP residuals at the net/loss boundary halve
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
            # planar (B, H, W) depth maps for the mask/loss tail — TPU tiles
            # the last two dims, so (B, H, W, 1) tensors would pad the 1-lane
            # axis to 128 (measured ~25x slowdown of the loss tail)
            syn_depth = batch["A_d"][..., 0]
            real_depth = batch["B_d"][..., 0]

            real_hole_mask = DPT.hole_mask(real_depth, BORDER)
            real_mask = DPT.valid_mask(real_depth, BORDER)
            syn_mask = DPT.valid_mask(syn_depth, BORDER)

            syn2real = ga_ap(params["G_A_d"], batch["A_d"].astype(dtype),
                             syn_image)[..., 0].astype(tail)

            # real/syn branches share weights and every layer is per-sample
            # (InstanceNorm, no BatchNorm/dropout in these nets), so running
            # both through ONE batch-2B call is mathematically identical to
            # two calls — and halves the op count / layout transitions the
            # hardware profile showed dominating overhead (PERF.md round 2)
            batched = not getattr(opt, "no_batched_branches", False)
            bsz = real_image.shape[0]
            if batched:
                both_images = jnp.concatenate([syn_image, real_image], axis=0)
                feats_both = i2df_ap(params["I2D_features"], both_images)
                dbi_both = i2d_ap(params["Image2Depth"], feats_both)[..., 0].astype(tail)
                feats_syn, feats_real = feats_both[:bsz], feats_both[bsz:]
                syn_dbi, real_dbi = dbi_both[:bsz], dbi_both[bsz:]
            else:
                feats_syn = i2df_ap(params["I2D_features"], syn_image)
                feats_real = i2df_ap(params["I2D_features"], real_image)
                syn_dbi = i2d_ap(params["Image2Depth"], feats_syn)[..., 0].astype(tail)
                real_dbi = i2d_ap(params["Image2Depth"], feats_real)[..., 0].astype(tail)

            if opt.use_masked:
                n = 60 if train else 11
                p = 0.90 if train else 0.0
                k1, k2 = jax.random.split(jax.random.fold_in(rng, 17))
                gt_mask_real = DPT.random_rect_holes(k1, real_mask, n_max=n, p=p)
                depth_masked = DPT.punch_holes(real_depth, gt_mask_real)
                gt_mask_syn = DPT.random_rect_holes(k2, syn_mask, n_max=n, p=p)
                syn2real_masked = DPT.punch_holes(syn2real, gt_mask_syn)
            else:
                gt_mask_real = jnp.ones_like(real_mask)
                gt_mask_syn = jnp.ones_like(syn_mask)
                depth_masked = real_depth
                syn2real_masked = syn2real

            syn_pair = jnp.stack([syn2real_masked, syn_dbi], axis=-1).astype(dtype)
            real_pair = jnp.stack([depth_masked, real_dbi], axis=-1).astype(dtype)
            if batched:
                pair_both = jnp.concatenate([syn_pair, real_pair], axis=0)
                feat_both_d = depthf_ap(params["Depth_f"], pair_both)
                pred_both = task_ap(params["Task"], feats_both, feat_both_d,
                                    pair_both, both_images)[..., 0].astype(tail)
                pred_syn, pred_real = pred_both[:bsz], pred_both[bsz:]
            else:
                feat_syn_d = depthf_ap(params["Depth_f"], syn_pair)
                feat_real_d = depthf_ap(params["Depth_f"], real_pair)
                pred_syn = task_ap(params["Task"], feats_syn, feat_syn_d, syn_pair,
                                   syn_image)[..., 0].astype(tail)
                pred_real = task_ap(params["Task"], feats_real, feat_real_d, real_pair,
                                    real_image)[..., 0].astype(tail)

            return dict(
                syn_image=batch["A_i"], real_image=batch["B_i"],
                syn_depth=syn_depth, real_depth=real_depth,
                real_hole_mask=real_hole_mask, real_mask=real_mask, syn_mask=syn_mask,
                syn2real_depth=syn2real, syn_depth_by_image=syn_dbi,
                real_depth_by_image=real_dbi, gt_mask_real=gt_mask_real,
                gt_mask_syn=gt_mask_syn, depth_masked=depth_masked,
                syn2real_depth_masked=syn2real_masked,
                pred_syn_depth=pred_syn, pred_real_depth=pred_real,
            )

        return forward

    def _losses_fn(self):
        opt = self.opt

        # --bf16_normals (A/B, VERDICT r3 #7): run the K-normals chain in
        # bf16 (default fp32, validated < 2e-3 vs the fp64 oracle; bf16 is a
        # measured-speed A/B, oracles run with it off)
        norm_dt = (jnp.bfloat16 if getattr(opt, "bf16_normals", False)
                   else jnp.float32)

        def losses(f, batch):
            m = {}
            syn_depth, real_depth = f["syn_depth"], f["real_depth"]
            pred_syn, pred_real = f["pred_syn_depth"], f["pred_real_depth"]
            syn_mask, real_mask = f["syn_mask"], f["real_mask"]

            # translator holes + synthetic rectangles (main_model.py:354-357)
            c = (f["syn2real_depth_masked"] < BORDER) | (f["gt_mask_syn"] < 0.1)
            mask_syn_add_holes = jnp.where(c, 1.0, 0.0)

            zero = jnp.zeros((), jnp.float32)
            m["tv_syn_norm"] = m["tv_real_norm"] = zero
            m["tv_syn_norm_old"] = m["tv_real_norm_old"] = zero
            m["syn_norms_old"] = m["syn_norms_holes"] = m["syn_norms"] = zero
            if opt.norm_loss:
                mask1 = syn_mask[:, None]  # (B, 1, H, W) broadcast vs (B, 3, H, W)
                # legacy image-space normals, x100 (main_model.py:343-352)
                norm_syn_o = NRM.surface_normals_planar(syn_depth) * 100
                norm_syn_pred_o = NRM.surface_normals_planar(pred_syn) * 100
                norm_real_pred_o = NRM.surface_normals_planar(pred_real) * 100
                m["tv_syn_norm_old"] = L.tv_loss_planar(norm_syn_pred_o) * 1e-7
                m["tv_real_norm_old"] = L.tv_loss_planar(norm_real_pred_o) * 1e-7
                m["syn_norms_old"] = L.mse_loss(norm_syn_o * mask1,
                                                norm_syn_pred_o * mask1)
                # intrinsics-based normals (main_model.py:360-372)
                K_A, K_B = batch["K_A"], batch["K_B"]
                crop_A, crop_B = batch["crop_A"], batch["crop_B"]
                norm_syn = NRM.surface_normals_from_K_planar(syn_depth, K_A, crop_A, dtype=norm_dt)
                norm_syn_pred = NRM.surface_normals_from_K_planar(pred_syn, K_A, crop_A, dtype=norm_dt)
                norm_real_pred = NRM.surface_normals_from_K_planar(pred_real, K_B, crop_B, dtype=norm_dt)
                m["tv_syn_norm"] = L.tv_loss_planar(norm_syn_pred) * 1e-7
                m["tv_real_norm"] = L.tv_loss_planar(norm_real_pred) * 1e-7
                m["syn_norms"] = L.l1_loss(norm_syn * mask1, norm_syn_pred * mask1)
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
            m["task_real_by_image"] = L.l1_loss(
                f["real_depth_by_image"] * f["real_hole_mask"],
                pred_real * f["real_hole_mask"])

            # weighted sum, main_model.py:393
            loss_g = (m["task_syn"] * opt.w_syn_l1
                      + m["holes_syn"] * opt.w_syn_holes
                      + m["holes_syn_l2"] * opt.w_syn_holes
                      + m["task_real_by_depth"] * opt.w_real_l1_d
                      + m["task_real_by_image"] * opt.w_real_l1_i
                      + m["tv_syn_norm"] * 1 + m["syn_norms_holes"] * opt.w_syn_norm * 5
                      + m["tv_real_norm"] * 1 + m["syn_norms_old"] * opt.w_syn_norm
                      + m["tv_real_norm_old"] * 1 + m["tv_syn_norm_old"] * 1)

            if opt.use_masked:
                mask_real_add_holes = jnp.where(f["gt_mask_real"] > 0.1, 0.0, 1.0)
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
                img_planar = jnp.moveaxis(f["real_image"], -1, 1)
                m["smooth"] = L.smooth_weight_loss_planar(pred_real, img_planar, 3)
                loss_g = loss_g + m["smooth"] * opt.w_smooth

            loss_g = loss_g * opt.scale_G
            m["G"] = loss_g

            # diagnostics (main_model.py:308-318)
            m["syn_mean_diff"] = jnp.mean(syn_depth * syn_mask) - jnp.mean(pred_syn * syn_mask)
            m["real_mean_diff"] = jnp.mean(real_depth * real_mask) - jnp.mean(pred_real * real_mask)
            m["mean_of_abs_diff_syn"] = jnp.mean(jnp.abs(syn_depth * syn_mask - pred_syn * syn_mask))
            m["mean_of_abs_diff_real"] = jnp.mean(jnp.abs(real_depth * real_mask - pred_real * real_mask))
            m["L1_syn"] = m["mean_of_abs_diff_syn"]
            m["L1_real"] = m["mean_of_abs_diff_real"]
            m["mask_syn_add_holes_vis"] = 0.0  # placeholder key parity for plots
            return loss_g, m

        return losses

    def _post_setup(self):
        forward = self._forward_fn()
        losses = self._losses_fn()
        trainable_nets = self._trainable_nets
        model_names = self.model_names

        def train_step(params, opt_state, batch, rng, lr):
            # split INSIDE jit and return the next key — eager per-step splits
            # are remote round trips on tunneled backends
            next_rng, use_rng = jax.random.split(rng)
            trains, auxs = {}, {}
            for n in model_names:
                trains[n], auxs[n] = split_trainable(params[n])
            g_train = {n: trains[n] for n in trainable_nets}

            def loss_fn(g_train_params):
                # start from params so frozen nets OUTSIDE model_names pass
                # through (SR's never-checkpointed G_B_d, QUIRKS #31)
                full = dict(params)
                for n in model_names:
                    full[n] = dict(trains[n], **auxs[n])
                for n in trainable_nets:
                    full[n] = dict(g_train_params[n], **auxs[n])
                f = forward(full, batch, use_rng, True)
                loss_g, m = losses(f, batch)
                return loss_g, m

            (loss_g, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_train)
            new_g, new_opt = adam_update(grads, opt_state, g_train, lr,
                                         b1=0.9, b2=0.999)  # Adam(lr) defaults, main_model.py:176
            new_params = dict(params)
            for n in trainable_nets:
                new_params[n] = dict(new_g[n], **auxs[n])
            m = {k: v for k, v in m.items() if not k.endswith("_vis")}
            return new_params, new_opt, m, next_rng

        def eval_step(params, batch, rng):
            f = forward(params, batch, rng, False)
            loss_g, m = losses(f, batch)
            m = {k: v for k, v in m.items() if not k.endswith("_vis")}
            return m, f

        self._train_step = self.jit_train(train_step)
        if self.isTrain and getattr(self.opt, "steps_per_call", 1) > 1:
            self._train_scan = self.jit_train_scan(train_step)
        self._eval_step = jax.jit(eval_step)
        g_train = {n: split_trainable(self.params[n])[0] for n in trainable_nets}
        self.opt_state_G = adam_init(g_train)

    # ------------------------------------------------------------------

    def _grads_for_oracle(self, batch):
        """Gradients of loss_G wrt the trainable nets on a host batch.

        Test hook for the lockstep/gradient oracle (tests/test_lockstep.py):
        the same loss graph the train step differentiates, without the Adam
        update, so gradients can be compared elementwise against the
        reference's ``backward_G`` (main_model.py:340-419).
        """
        forward = self._forward_fn()
        losses = self._losses_fn()
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not str(k).endswith("paths")}

        def loss_fn(gt):
            full = dict(self.params)
            full.update(gt)
            f = forward(full, jb, jax.random.PRNGKey(0), True)
            return losses(f, jb)[0]

        g_train = {n: self.params[n] for n in self._trainable_nets}
        return jax.jit(jax.grad(loss_fn))(g_train)

    _input_keys = ["A_i", "B_i", "A_d", "B_d", "K_A", "K_B", "crop_A", "crop_B"]

    def set_input(self, batch):
        batch = self.apply_direction(batch)
        self._batch = self.shard({k: batch[k] for k in self._input_keys})
        self._paths = {"A_paths": batch.get("A_paths"), "B_paths": batch.get("B_paths")}

    def optimize_parameters(self, iters, fr=1):
        self.params, self.opt_state_G, m, new_rng = self._train_step(
            self.params, self.opt_state_G, self._batch, self.step_rng(), self.lr_scalar())
        self.set_step_rng(new_rng)
        self.metrics = m

    def calculate(self, stage="test"):
        rng = self.next_rng()
        m, f = self._eval_step(self.params, self._batch, rng)
        self.metrics = m
        self.visuals = {k: f[k] for k in self.visual_names if k in f}
        if getattr(self.opt, "save_all", False) and stage == "test":
            self._dump_predictions(f)

    def _dump_predictions(self, f):
        """uint16 PNG dump, [:, 16:-16, :] row crop x5100 (main_model.py:323-336)."""
        from desr_tpu.utils.util import save_uint16_png

        os.makedirs(self.opt.save_image_folder, exist_ok=True)
        pred = np.asarray(f["pred_real_depth"])  # planar (B, H, W)
        for i, path in enumerate(self._paths["B_paths"] or []):
            stem = str(path).split("/")[-1].split(".")[0]
            out = np.clip((pred[i, 16:-16, :] + 1) / 2, 0, 1)
            save_uint16_png(out, os.path.join(self.opt.save_image_folder, f"{stem}.png"))
