"""Stage 1 — Image Guidance Network (I2D): depth from RGB alone.

Reference: models/I2D_model.py. Two nets:
- ``Image_f``: RGB feature extractor, ResNet-6-blocks generator (:112-113)
- ``Task``:   depth-regression U-Net on those features (:124-125)

Trained supervised with masked L1 (mask = depth > -0.97) on both domains
(:219-226). As-shipped quirks preserved:
- the optimizer covers ONLY ``Task`` parameters (I2D_model.py:143) —
  ``Image_f`` stays at its initialization unless ``--i2d_train_features`` is
  passed (our opt-in extension);
- with ``--norm_loss`` the normal-consistency L1 is computed and reported but
  NOT added to the total loss (:217 vs :226);
- optional feature discriminator (``--use_D``): the reference's netD_depth
  definition is commented out (:120-122) so the flag crashes there; here it is
  functional — a PatchGAN on the feature maps with an ImagePool replay buffer
  and the reference's throttled update schedule (:244-250).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from desr_tpu.models import networks
from desr_tpu.models.base_model import BaseModel, split_trainable
from desr_tpu.models.layers import Ctx, ctx_flags
from desr_tpu.ops import losses as L
from desr_tpu.ops import normals as NRM
from desr_tpu.ops.optim import adam_init, adam_update
from desr_tpu.utils.image_pool import ImagePool


class I2DModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        # reference I2D_model.py:68-77
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0)
            parser.add_argument("--lambda_B", type=float, default=10.0)
            parser.add_argument("--lambda_identity", type=float, default=0.5)
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.loss_names = ["task_syn", "task_real"]
        if opt.norm_loss:
            self.loss_names += ["syn_norms"]
        if opt.use_D:
            self.loss_names += ["G_pred", "D_depth", "G_pred_r"]
        self.visual_names = ["syn_image", "syn_depth", "pred_syn_depth",
                             "real_image", "real_depth", "pred_real_depth"]
        self.model_names = ["Image_f", "Task"]

        self.nets["Image_f"] = networks.define_G(
            3, opt.Imagef_outf, opt.Imagef_basef, opt.Imagef_type, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain,
            opt.replace_transpose, n_down=opt.Imagef_ndown)
        self.nets["Task"] = networks.define_G(
            opt.Imagef_outf, 1, opt.Task_basef, opt.Task_type, opt.norm,
            not opt.no_dropout, opt.init_type, opt.init_gain,
            opt.replace_transpose, n_down=opt.Task_ndown)
        if opt.use_D:
            self.model_names += ["D_depth"]
            self.nets["D_depth"] = networks.define_D(
                opt.Imagef_outf, opt.ndf, opt.netD, opt.n_layers_D, opt.norm,
                opt.init_type, opt.init_gain)
            self.fake_depth_pool = ImagePool(opt.pool_size)

        self._g_trainable_nets = ["Task"] + (
            ["Image_f"] if getattr(opt, "i2d_train_features", False) else [])

    # -- steps ---------------------------------------------------------------

    def _forward_fn(self):
        """The pure forward: (feats_syn, feats_real, pred_syn, pred_real).

        Exposed (like MainModel._forward_fn) so predict.py --I2D can build a
        pruned serving graph — returning only pred_real lets XLA dead-code-
        eliminate the entire syn branch under --no_batched_branches.
        """
        opt = self.opt
        dtype = self.compute_dtype
        image_f, task = self.nets["Image_f"], self.nets["Task"]
        mesh = self.mesh

        def forward(params, batch, rng, train):
            ctx = Ctx(train=train, rng=rng, dtype=dtype, mesh=mesh,
                      **ctx_flags(opt))
            syn_i, real_i = batch["A_i"].astype(dtype), batch["B_i"].astype(dtype)
            if not getattr(opt, "no_batched_branches", False):
                # syn/real share weights; per-sample layers only -> ONE
                # batch-2B pass is identical math with half the op overhead
                # (see MainModel._forward_fn, PERF.md round 2)
                bsz = syn_i.shape[0]
                feats = image_f.apply(params["Image_f"],
                                      jnp.concatenate([syn_i, real_i], 0), ctx)
                pred = task.apply(params["Task"], feats, ctx).astype(jnp.float32)
                return feats[:bsz], feats[bsz:], pred[:bsz], pred[bsz:]
            feats_syn = image_f.apply(params["Image_f"], syn_i, ctx)
            feats_real = image_f.apply(params["Image_f"], real_i, ctx)
            pred_syn = task.apply(params["Task"], feats_syn, ctx).astype(jnp.float32)
            pred_real = task.apply(params["Task"], feats_real, ctx).astype(jnp.float32)
            return feats_syn, feats_real, pred_syn, pred_real

        return forward

    def _post_setup(self):
        opt = self.opt
        dtype = self.compute_dtype
        g_nets = list(self._g_trainable_nets)
        forward = self._forward_fn()

        def losses(params, batch, rng, train):
            feats_syn, feats_real, pred_syn, pred_real = forward(params, batch, rng, train)
            # planar loss tail (see MainModel layout note)
            pred_syn_p, pred_real_p = pred_syn[..., 0], pred_real[..., 0]
            syn_d, real_d = batch["A_d"][..., 0], batch["B_d"][..., 0]
            mask_syn = jnp.where(syn_d < -0.97, 0.0, 1.0)
            mask_real = jnp.where(real_d < -0.97, 0.0, 1.0)
            m = {}
            m["task_syn"] = L.l1_loss(syn_d * mask_syn, pred_syn_p * mask_syn)
            m["task_real"] = L.l1_loss(real_d * mask_real, pred_real_p * mask_real)
            if opt.norm_loss:
                # metric-only in the reference (I2D_model.py:217 vs :226)
                m["syn_norms"] = L.l1_loss(NRM.surface_normals_planar(syn_d),
                                           NRM.surface_normals_planar(pred_syn_p))
            loss_g = (m["task_syn"] * opt.w_syn_l1 + m["task_real"] * opt.w_real_l1)
            loss_g = loss_g * opt.scale_G
            m["G"] = loss_g
            vis = dict(syn_image=batch["A_i"], syn_depth=syn_d, pred_syn_depth=pred_syn,
                       real_image=batch["B_i"], real_depth=real_d,
                       pred_real_depth=pred_real, features_syn=feats_syn,
                       features_real=feats_real)
            return loss_g, (m, vis)

        # reference backward_features (I2D_model.py:203-208, wired at :239-241):
        # under --use_D the G update also backprops the UNWEIGHTED loss_G_pred
        # = GAN(D(features_real), True) through the frozen D into Image_f
        # (w_syn_adv scales only the *reported* loss_G_p at :206; the backward
        # at :208 takes the raw term). The as-shipped optimizer covers Task
        # only (:143), for which that gradient is a silent no-op — so the term
        # is materialized only when Image_f is actually trainable
        # (--i2d_train_features), where it changes the update exactly as the
        # reference's two accumulating .backward() calls would.
        adv_net = (self.nets["D_depth"]
                   if opt.use_D and "Image_f" in g_nets else None)

        def train_step(params, opt_state, batch, rng, lr):
            next_rng, use_rng = jax.random.split(rng)
            trains, auxs = {}, {}
            for n in self.model_names:
                trains[n], auxs[n] = split_trainable(params[n])
            g_train = {n: trains[n] for n in g_nets}

            def loss_fn(g_train_params):
                full = {n: dict(trains[n], **auxs[n]) for n in self.model_names}
                for n in g_nets:
                    full[n] = dict(g_train_params[n], **auxs[n])
                if adv_net is None:
                    return losses(full, batch, use_rng, True)
                loss_g, (m, vis) = losses(full, batch, use_rng, True)
                # D params come from the closure (trains/auxs), not from
                # g_train_params -> constant under this grad, i.e. the
                # reference's set_requires_grad([netD_depth], False). BatchNorm
                # running-stat side effects of this extra D call are not
                # replayed (instance-norm default has none).
                pr = adv_net.apply(full["D_depth"], vis["features_real"],
                                   Ctx(train=True, dtype=dtype)).astype(jnp.float32)
                loss_g = loss_g + L.gan_loss(pr, True, opt.gan_mode)
                return loss_g, (m, vis)

            (loss_g, (m, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_train)
            new_g, new_opt = adam_update(grads, opt_state, g_train, lr,
                                         b1=0.9, b2=0.999)  # torch Adam defaults (I2D_model.py:143)
            new_params = dict(params)
            for n in g_nets:
                new_params[n] = dict(new_g[n], **auxs[n])
            return new_params, new_opt, m, next_rng

        def eval_step(params, batch, rng):
            loss_g, (m, vis) = losses(params, batch, rng, False)
            return m, vis

        self._train_step = self.jit_train(train_step)
        if (self.isTrain and not opt.use_D
                and getattr(opt, "steps_per_call", 1) > 1):
            # with --use_D the D-step cadence is host-side (iters % fr); the
            # scan path covers the G-only configuration
            self._train_scan = self.jit_train_scan(train_step)
        self._eval_step = jax.jit(eval_step)

        if opt.use_D and self.isTrain:
            d_net = self.nets["D_depth"]

            def d_step(d_params, d_opt_state, feats_syn, fake_pool, lr):
                d_train, d_aux = split_trainable(d_params)

                def loss_fn(dt):
                    full = dict(dt, **d_aux)
                    stats = {}  # BatchNorm running-stat updates (--norm batch)
                    ctx = Ctx(train=True, dtype=dtype, stats=stats)
                    pred_real = d_net.apply(full, feats_syn, ctx).astype(jnp.float32)
                    pred_fake = d_net.apply(full, fake_pool, ctx).astype(jnp.float32)
                    loss = 0.5 * (L.gan_loss(pred_real, True, opt.gan_mode)
                                  + L.gan_loss(pred_fake, False, opt.gan_mode))
                    return loss, stats

                (loss_d, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_train)
                new_d, new_opt = adam_update(grads, d_opt_state, d_train, lr,
                                             b1=opt.beta1, b2=0.999)
                return dict(new_d, **d_aux, **stats), new_opt, loss_d

            def g_pred_metrics(d_params, feats_real, feats_syn):
                ctx = Ctx(train=False, dtype=dtype)
                pr = d_net.apply(d_params, feats_real, ctx).astype(jnp.float32)
                ps = d_net.apply(d_params, feats_syn, ctx).astype(jnp.float32)
                return (L.gan_loss(pr, True, opt.gan_mode),
                        L.gan_loss(ps, True, opt.gan_mode))

            self._d_step = self.jit_train(d_step)
            self._g_pred_metrics = jax.jit(g_pred_metrics)
            self.opt_state_D = adam_init(split_trainable(self.params["D_depth"])[0])

        g_train = {n: split_trainable(self.params[n])[0] for n in g_nets}
        self.opt_state_G = adam_init(g_train)

    # -- reference-API entry points -------------------------------------------

    _input_keys = ["A_i", "B_i", "A_d", "B_d"]

    def set_input(self, batch):
        batch = self.apply_direction(batch)
        self._batch = self.shard({k: batch[k] for k in self._input_keys})
        self._paths = {"A_paths": batch.get("A_paths"), "B_paths": batch.get("B_paths")}

    def optimize_parameters(self, iters, fr=700):
        self.params, self.opt_state_G, m, new_rng = self._train_step(
            self.params, self.opt_state_G, self._batch, self.step_rng(), self.lr_scalar())
        self.set_step_rng(new_rng)
        self.metrics = m
        if self.opt.use_D:
            rng = self.next_rng()
            _, vis = self._eval_step(self.params, self._batch, rng)
            fr_iters = fr * self.opt.batch_size
            if (iters % fr_iters == 0) or (iters < 800):
                fake = self.fake_depth_pool.query(np.asarray(vis["features_real"]))
                self.params["D_depth"], self.opt_state_D, loss_d = self._d_step(
                    self.params["D_depth"], self.opt_state_D,
                    vis["features_syn"], jnp.asarray(fake), jnp.float32(self.lr))
                self.metrics["D_depth"] = loss_d
            gp, gpr = self._g_pred_metrics(self.params["D_depth"],
                                           vis["features_real"], vis["features_syn"])
            self.metrics["G_pred"], self.metrics["G_pred_r"] = gp, gpr

    def calculate(self, stage="test"):
        rng = self.next_rng()
        m, vis = self._eval_step(self.params, self._batch, rng)
        self.metrics = m
        self.visuals = {k: vis[k] for k in self.visual_names if k in vis}
        if getattr(self.opt, "save_all", False) and stage == "test":
            self._dump_predictions(vis)

    def _dump_predictions(self, vis):
        """uint16 PNG dump, [:, 16:-16, :] row crop x5100 (I2D_model.py:170-181)."""
        from desr_tpu.utils.util import save_uint16_png
        import os

        os.makedirs(self.opt.save_image_folder, exist_ok=True)
        pred = np.asarray(vis["pred_real_depth"])
        for i, path in enumerate(self._paths["B_paths"] or []):
            stem = str(path).split("/")[-1].split(".")[0]
            out = np.clip((pred[i, 16:-16, :, 0] + 1) / 2, 0, 1)
            save_uint16_png(out, os.path.join(self.opt.save_image_folder, f"{stem}.png"))
