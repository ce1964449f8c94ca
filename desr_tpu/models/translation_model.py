"""Stage 2 — unpaired HQ<->LQ depth translation (CycleGAN-style).

Reference: models/translation_model.py. Two dual-branch translators
(``G_A``: syn->real, ``G_B``: real->syn) and four PatchGAN discriminators
(depth + FOV-surface-normal per direction, :85-105). Alternating optimization:
``num_iter_gen`` generator steps (each with a fresh forward) then
``num_iter_dis`` discriminator steps (:274-291) — here each is one jitted,
data-parallel program (grads flow only to the side being optimized; the other
side's params are non-differentiated arguments, the functional equivalent of
``set_requires_grad``). The FIRST D iteration reuses the last G forward's
detached tensors exactly as the reference does (:284-291 calls ``forward()``
only when ``j > 0``): the G step returns the tensors backward_D consumes and
the D step trains on them — fakes from the PRE-update generator weights, and
three generator applies cheaper than a fresh forward.

As-shipped semantics preserved:
- D_A trains against ``rec_depth_B`` / ``rec_norm_B`` as "real" instead of the
  real depth ("followed Maeda", :201-203);
- identity loss: idt_A disabled by default (``no_idt_A=True``, :33); idt_B =
  L1(G_B(real_A...), real_depth_A) (:240);
- depth-range/cycle weights ramp via ``calc_l_step``/``update_loss_weight``
  (:293-305) — which main.py never calls; same here (the hooks exist);
- the duplicated detached cycle-B forward (:177, immediately overwritten) is
  dead compute and is not reproduced;
- the masked-cos-sim cycle_n_A divides by sum(mask)+1e+6 (reference bug,
  translation_network.py:327) — reproduced via compat_bug=True.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from desr_tpu.models import translation_networks as TN
from desr_tpu.models.base_model import BaseModel, split_trainable
from desr_tpu.models.layers import Ctx, ctx_flags
from desr_tpu.ops import losses as L
from desr_tpu.ops.normals import surface_normals_fov_planar
from desr_tpu.ops.optim import adam_init, adam_update

HOLE_BORDER = -0.98  # translation_model.py:324-326


class TranslationModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        # reference translation_model.py:13-41
        parser.add_argument("--l_cycle_A_begin", type=float, default=10.0)
        parser.add_argument("--l_cycle_A_end", type=float, default=10.0)
        parser.add_argument("--l_cycle_B_begin", type=float, default=5.0)
        parser.add_argument("--l_cycle_B_end", type=float, default=5.0)
        parser.add_argument("--l_identity", type=float, default=1)
        parser.add_argument("--l_normal", type=float, default=1.0)
        parser.add_argument("--l_reconstruction_semantic", type=float, default=0.0)
        parser.add_argument("--l_depth_A_begin", type=float, default=5.0)
        parser.add_argument("--l_depth_A_end", type=float, default=0.0)
        parser.add_argument("--l_depth_B_begin", type=float, default=5.0)
        parser.add_argument("--l_depth_B_end", type=float, default=0.0)
        parser.add_argument("--l_mean_A", type=float, default=0.0)
        parser.add_argument("--l_mean_B", type=float, default=0.0)
        parser.add_argument("--l_tv_A", type=float, default=0.0)
        parser.add_argument("--l_max_iter", type=int, default=5000)
        parser.add_argument("--l_num_iter", type=int, default=5000)
        parser.add_argument("--num_iter_gen", type=int, default=3)
        parser.add_argument("--num_iter_dis", type=int, default=1)
        parser.add_argument("--no_idt_A", action="store_true", default=True)
        parser.add_argument("--use_cycle_A", action="store_true", default=False)
        parser.add_argument("--use_cycle_B", action="store_true", default=True)
        parser.add_argument("--disc_for_normals", action="store_true", default=True)
        parser.add_argument("--disc_for_depth", action="store_true", default=True)
        parser.add_argument("--inp_B", type=str, default="img_depth")
        parser.add_argument("--norm_d", type=str, default="none")
        parser.add_argument("--w_decay_G", type=float, default=0.0001)
        # note: --max_distance stays at the TrainOptions default (10); the
        # translation DATASET's modify_commandline_options that would set 5100
        # is never invoked by the reference's option flow either (main.py
        # imports the dataset class directly; base_options resolves the
        # dataset setter from --dataset_mode='unaligned') — README commands
        # pass --max_distance 5100 explicitly (README.md:54).
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        if self.isTrain:
            self.loss_names = ["G_A", "G_B", "depth_dif_A", "depth_dif_B"]
            if opt.l_mean_A > 0:
                self.loss_names += ["mean_dif_A"]
            if opt.l_mean_B > 0:
                self.loss_names += ["mean_dif_B"]
            if opt.use_cycle_A:
                self.loss_names += ["cycle_A", "cycle_n_A"]
            if opt.use_cycle_B:
                self.loss_names += ["cycle_B", "cycle_n_B"]
            if opt.disc_for_depth:
                self.loss_names += ["D_A_depth", "D_B_depth"]
            if opt.disc_for_normals:
                self.loss_names += ["D_A_normal", "D_B_normal"]
            if opt.l_identity > 0:
                self.loss_names += ["idt_A", "idt_B"]
            if opt.l_depth_A_begin > 0:
                self.loss_names += ["depth_range_A"]
            if opt.l_depth_B_begin > 0:
                self.loss_names += ["depth_range_B"]
            if opt.l_tv_A > 0:
                self.loss_names += ["tv_norm_A"]
        self.loss_names_test = ["depth_dif_A", "depth_dif_B"]
        self.visual_names = ["real_img_A", "real_depth_A", "real_img_B", "real_depth_B",
                             "fake_depth_B", "fake_depth_A"]
        if opt.use_cycle_A:
            self.visual_names += ["rec_depth_A"]
        if opt.use_cycle_B:
            self.visual_names += ["rec_depth_B"]

        self.model_names = ["G_A", "G_B"]
        gen_opt = TN.default_translator_opt(init_type=opt.init_type)
        self.nets["G_A"] = TN.define_Gen(gen_opt, input_type="img_depth")
        self.nets["G_B"] = TN.define_Gen(gen_opt, input_type=opt.inp_B)
        self.disc_names = []
        if self.isTrain:
            if opt.disc_for_depth:
                self.disc_names += ["D_A_depth", "D_B_depth"]
            if opt.disc_for_normals:
                self.disc_names += ["D_A_normal", "D_B_normal"]
            self.model_names += self.disc_names
            for dn in self.disc_names:
                input_type = "depth" if dn.endswith("depth") else "normal"
                self.nets[dn] = TN.define_D(opt, input_type=input_type)

        # ramped loss weights (translation_model.py:122-126)
        self.l_depth_A = opt.l_depth_A_begin if self.isTrain else 0.0
        self.l_depth_B = opt.l_depth_B_begin if self.isTrain else 0.0
        self.l_cycle_A = opt.l_cycle_A_begin if self.isTrain else 0.0
        self.l_cycle_B = opt.l_cycle_B_begin if self.isTrain else 0.0
        if self.isTrain:
            self.calc_l_step()

    # -- weight ramps (translation_model.py:293-305) -------------------------

    def calc_l_step(self):
        opt = self.opt
        self.l_depth_A_step = abs(opt.l_depth_A_begin - opt.l_depth_A_end) / opt.l_num_iter
        self.l_depth_B_step = abs(opt.l_depth_B_begin - opt.l_depth_B_end) / opt.l_num_iter
        self.l_cycle_A_step = abs(opt.l_cycle_A_begin - opt.l_cycle_A_end) / opt.l_num_iter
        self.l_cycle_B_step = abs(opt.l_cycle_B_begin - opt.l_cycle_B_end) / opt.l_num_iter

    def update_loss_weight(self, global_iter):
        if global_iter > self.opt.l_max_iter:
            self.l_depth_A -= self.l_depth_A_step
            self.l_depth_B -= self.l_depth_B_step
            self.l_cycle_A += self.l_cycle_A_step
            self.l_cycle_B += self.l_cycle_B_step

    # -- steps ----------------------------------------------------------------

    def _forward_fns(self):
        opt = self.opt
        dtype = self.compute_dtype
        g_a, g_b = self.nets["G_A"], self.nets["G_B"]
        depth_only_B = opt.inp_B == "depth"

        def gen_forward(params_g, batch, rng, train):
            # depth maps are planar (B, H, W) in f; NHWC only at net boundaries
            ctx = Ctx(train=train, rng=rng, dtype=dtype,
                      **ctx_flags(opt))
            depth_A, img_A = batch["A_depth"], batch["A_img"].astype(dtype)
            depth_B, img_B = batch["B_depth"], batch["B_img"].astype(dtype)
            dA, dB = depth_A[..., 0], depth_B[..., 0]
            f = {"real_depth_A": dA, "real_depth_B": dB,
                 "real_img_A": batch["A_img"], "real_img_B": batch["B_img"]}
            f["hole_mask_A"] = dA <= HOLE_BORDER
            fake_B = g_a.apply(params_g["G_A"], depth_A.astype(dtype), img_A, ctx)[..., 0].astype(jnp.float32)
            if depth_only_B:
                fake_A = g_b.apply(params_g["G_B"], depth_B.astype(dtype), None, ctx)[..., 0].astype(jnp.float32)
            else:
                fake_A = g_b.apply(params_g["G_B"], depth_B.astype(dtype), img_B, ctx)[..., 0].astype(jnp.float32)
            f["fake_depth_B"], f["fake_depth_A"] = fake_B, fake_A
            f["hole_mask_B"] = fake_A <= HOLE_BORDER
            f["real_norm_A"] = surface_normals_fov_planar(dA)
            f["real_norm_B"] = surface_normals_fov_planar(dB)
            f["fake_norm_A"] = surface_normals_fov_planar(fake_A)
            f["fake_norm_B"] = surface_normals_fov_planar(fake_B)
            if opt.use_cycle_A:
                if depth_only_B:
                    rec_A = g_b.apply(params_g["G_B"], fake_B[..., None].astype(dtype), None, ctx)
                else:
                    rec_A = g_b.apply(params_g["G_B"], fake_B[..., None].astype(dtype), img_A, ctx)
                f["rec_depth_A"] = rec_A[..., 0].astype(jnp.float32)
                f["rec_norm_A"] = surface_normals_fov_planar(f["rec_depth_A"])
            if opt.use_cycle_B:
                rec_B = g_a.apply(params_g["G_A"], fake_A[..., None].astype(dtype), img_B, ctx)
                f["rec_depth_B"] = rec_B[..., 0].astype(jnp.float32)
                f["rec_norm_B"] = surface_normals_fov_planar(f["rec_depth_B"])
            if train and opt.l_identity > 0:
                f["idt_A"] = g_a.apply(params_g["G_A"], depth_B.astype(dtype), img_B, ctx)[..., 0].astype(jnp.float32)
                if depth_only_B:
                    f["idt_B"] = g_b.apply(params_g["G_B"], depth_A.astype(dtype), None, ctx)[..., 0].astype(jnp.float32)
                else:
                    f["idt_B"] = g_b.apply(params_g["G_B"], depth_A.astype(dtype), img_A, ctx)[..., 0].astype(jnp.float32)
            return f

        return gen_forward

    def _d_apply_fn(self):
        dtype = self.compute_dtype

        def d_apply(params, name, x, stats=None):
            # planar -> NHWC at the discriminator conv boundary
            if x.ndim == 3:
                x = x[..., None]
            elif x.ndim == 4 and x.shape[1] == 3:
                x = jnp.moveaxis(x, 1, -1)
            # per-net stats sink: D key namespaces repeat across the four Ds
            ctx = Ctx(train=True, dtype=dtype,
                      stats=None if stats is None else stats.setdefault(name, {}))
            return self.nets[name].apply(params[name], x.astype(dtype), ctx).astype(jnp.float32)

        return d_apply

    def _g_losses_fn(self):
        """Generator objective terms (translation_model.py:211-272)."""
        opt = self.opt
        d_apply = self._d_apply_fn()

        def g_losses(f, params_d, weights, stats=None):
            m = {}
            loss_A = 0.0
            loss_B = 0.0
            if opt.disc_for_depth:
                loss_A += 0.5 * L.gan_loss(d_apply(params_d, "D_A_depth", f["fake_depth_B"], stats), True, opt.gan_mode)
                loss_B += 0.5 * L.gan_loss(d_apply(params_d, "D_B_depth", f["fake_depth_A"], stats), True, opt.gan_mode)
            if opt.disc_for_normals:
                loss_A += 0.5 * L.gan_loss(d_apply(params_d, "D_A_normal", f["fake_norm_B"], stats), True, opt.gan_mode)
                loss_B += 0.5 * L.gan_loss(d_apply(params_d, "D_B_normal", f["fake_norm_A"], stats), True, opt.gan_mode)
            m["G_A"], m["G_B"] = loss_A, loss_B
            if opt.use_cycle_A:
                not_hole = ~f["hole_mask_A"]
                m["cycle_A"] = L.masked_l1_loss(f["rec_depth_A"], f["real_depth_A"], not_hole) * weights["l_cycle_A"]
                m["cycle_n_A"] = L.masked_cos_sim_loss_planar(
                    f["rec_norm_A"], f["real_norm_A"],
                    jnp.repeat(not_hole[:, None], 3, axis=1)) * opt.l_normal * weights["l_cycle_A"]
                loss_A = loss_A + m["cycle_A"] + m["cycle_n_A"]
            if opt.use_cycle_B:
                m["cycle_B"] = L.l1_loss(f["rec_depth_B"], f["real_depth_B"]) * weights["l_cycle_B"]
                m["cycle_n_B"] = L.cos_sim_loss_planar(
                    f["rec_norm_B"], f["real_norm_B"]) * opt.l_normal * weights["l_cycle_B"]
                loss_B = loss_B + m["cycle_B"] + m["cycle_n_B"]
            if opt.l_identity > 0:
                m["idt_A"] = jnp.zeros(())
                if not opt.no_idt_A:
                    m["idt_A"] = L.l1_loss(f["idt_A"], f["real_depth_B"]) * opt.l_identity
                    loss_A = loss_A + m["idt_A"]
                m["idt_B"] = L.l1_loss(f["idt_B"], f["real_depth_A"]) * opt.l_identity
                loss_B = loss_B + m["idt_B"]
            if opt.l_mean_A > 0:
                m["mean_dif_A"] = L.masked_mean_dif(f["fake_depth_B"], f["real_depth_A"],
                                                    ~f["hole_mask_A"]) * opt.l_mean_A
                loss_A = loss_A + m["mean_dif_A"]
            if opt.l_mean_B > 0:
                m["mean_dif_B"] = L.masked_mean_dif(f["fake_depth_A"], f["real_depth_B"],
                                                    ~f["hole_mask_B"]) * opt.l_mean_B
                loss_B = loss_B + m["mean_dif_B"]
            if opt.l_tv_A > 0:
                m["tv_norm_A"] = L.tv_norm_planar(f["fake_norm_B"]) * opt.l_tv_A
                loss_A = loss_A + m["tv_norm_A"]
            m["depth_range_A"] = L.masked_l1_loss(f["fake_depth_B"], f["real_depth_A"],
                                                  ~f["hole_mask_A"]) * weights["l_depth_A"]
            m["depth_range_B"] = L.masked_l1_loss(f["fake_depth_A"], f["real_depth_B"],
                                                  ~f["hole_mask_B"]) * weights["l_depth_B"]
            loss_A = loss_A + m["depth_range_A"]
            loss_B = loss_B + m["depth_range_B"]
            return loss_A + loss_B, m

        return g_losses

    def _d_stateless(self):
        """True when the Ds carry no per-apply state, so applying one D to
        real and fake separately equals one batched apply on their concat:
        the default basic/n_layers/pixel Ds with norm_d='none'/instance/group
        are pure conv+LeakyReLU (per-sample norms at most). BatchNorm (Gu D,
        norm_d='batch') mixes moments across the concat, and spectral norm
        advances its power iteration once per apply — both stay unbatched."""
        opt = self.opt
        return (opt.netD != "Gu" and opt.norm_d != "batch"
                and not getattr(opt, "use_spnorm", False)
                and not getattr(opt, "no_batched_branches", False))

    def _d_losses_fn(self):
        """Discriminator objectives (translation_model.py:192-209)."""
        opt = self.opt
        d_apply = self._d_apply_fn()
        batched = self._d_stateless()

        def d_pair(d_full, name, real, fake, stats):
            # backward_D_base (:193-197): 0.5*(GAN(D(real),1) + GAN(D(fake),0))
            if batched:
                pred = d_apply(d_full, name,
                               jnp.concatenate([real, fake], axis=0), stats)
                n = real.shape[0]
                pr, pf = pred[:n], pred[n:]
            else:
                pr = d_apply(d_full, name, real, stats)
                pf = d_apply(d_full, name, fake, stats)
            return 0.5 * (L.gan_loss(pr, True, opt.gan_mode)
                          + L.gan_loss(pf, False, opt.gan_mode))

        def d_losses(f, d_full, stats=None):
            m = {}
            total = 0.0
            if opt.disc_for_depth:
                # D_A: rec_depth_B as "real" (translation_model.py:201)
                real_A = f["rec_depth_B"] if opt.use_cycle_B else f["real_depth_B"]
                m["D_A_depth"] = d_pair(d_full, "D_A_depth", real_A,
                                        f["fake_depth_B"], stats)
                m["D_B_depth"] = d_pair(d_full, "D_B_depth", f["real_depth_A"],
                                        f["fake_depth_A"], stats)
                total += m["D_A_depth"] + m["D_B_depth"]
            if opt.disc_for_normals:
                real_nA = f["rec_norm_B"] if opt.use_cycle_B else f["real_norm_B"]
                m["D_A_normal"] = d_pair(d_full, "D_A_normal", real_nA,
                                         f["fake_norm_B"], stats)
                m["D_B_normal"] = d_pair(d_full, "D_B_normal", f["real_norm_A"],
                                         f["fake_norm_A"], stats)
                total += m["D_A_normal"] + m["D_B_normal"]
            return total, m

        return d_losses

    def _d_feed_keys(self):
        """The forward tensors backward_D consumes (translation_model.py:
        199-209) — the stale-feed contract between the last G step and the
        first D step (see optimize_parameters)."""
        opt = self.opt
        keys = []
        if opt.disc_for_depth:
            keys += ["fake_depth_B", "fake_depth_A", "real_depth_A",
                     "rec_depth_B" if opt.use_cycle_B else "real_depth_B"]
        if opt.disc_for_normals:
            keys += ["fake_norm_B", "fake_norm_A", "real_norm_A",
                     "rec_norm_B" if opt.use_cycle_B else "real_norm_B"]
        return sorted(set(keys))

    def _post_setup(self):
        opt = self.opt
        gen_forward = self._forward_fns()
        disc_names = self.disc_names
        g_losses = self._g_losses_fn()
        d_losses = self._d_losses_fn()
        feed_keys = self._d_feed_keys()

        def meters(x):
            return (x * (opt.max_distance / 2) + opt.max_distance / 2) / 1000.0

        def g_step(params, opt_state_g, batch, rng, lr, weights):
            rng_next, rng = jax.random.split(rng)
            trains, auxs = {}, {}
            for n in self.model_names:
                trains[n], auxs[n] = split_trainable(params[n])
            g_train = {n: trains[n] for n in ["G_A", "G_B"]}
            d_full = {n: dict(trains[n], **auxs[n]) for n in disc_names}

            def loss_fn(gt):
                g_full = {n: dict(gt[n], **auxs[n]) for n in ["G_A", "G_B"]}
                f = gen_forward(g_full, batch, rng, True)
                # torch keeps Ds in train mode during G steps, so their
                # BatchNorm running stats advance here too (Gu D case)
                stats = {}
                loss, m = g_losses(f, d_full, weights, stats)
                return loss, (m, f, stats)

            (loss, (m, f, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_train)
            new_g, new_opt = adam_update(grads, opt_state_g, g_train, lr,
                                         b1=opt.beta1, b2=0.999,
                                         weight_decay=opt.w_decay_G)
            new_params = dict(params)
            for n in ["G_A", "G_B"]:
                new_params[n] = dict(new_g[n], **auxs[n])
            for n, upd in stats.items():
                if upd:
                    new_params[n] = dict(new_params[n], **upd)
            m["depth_dif_A"] = L.masked_l1_loss(meters(f["real_depth_A"]),
                                                meters(f["fake_depth_B"]), ~f["hole_mask_A"])
            m["depth_dif_B"] = L.masked_l1_loss(meters(f["real_depth_B"]),
                                                meters(f["fake_depth_A"]), ~f["hole_mask_B"])
            feed = {k: jax.lax.stop_gradient(f[k]) for k in feed_keys}
            return new_params, new_opt, m, feed, rng_next

        def make_d_step(fresh):
            # fresh=False consumes the last G step's forward tensors (the
            # reference's j==0 D iteration reuses them, :284-291 — computed
            # with the PRE-update generator weights); fresh=True re-runs the
            # generator forward with the current weights (reference j>0).
            def d_step(params, opt_state_d, inp, rng, lr):
                rng_next, rng = jax.random.split(rng)
                trains, auxs = {}, {}
                for n in self.model_names:
                    trains[n], auxs[n] = split_trainable(params[n])
                if fresh:
                    g_full = {n: dict(trains[n], **auxs[n]) for n in ["G_A", "G_B"]}
                    f = gen_forward(g_full, inp, rng, True)
                    f = {k: (jax.lax.stop_gradient(v) if isinstance(v, jnp.ndarray) else v)
                         for k, v in f.items()}
                else:
                    f = inp
                d_train = {n: trains[n] for n in disc_names}

                def loss_fn(dt):
                    d_full = {n: dict(dt[n], **auxs[n]) for n in disc_names}
                    stats = {}
                    total, m = d_losses(f, d_full, stats)
                    return total, (m, stats)

                (total, (m, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_train)
                new_d, new_opt = adam_update(grads, opt_state_d, d_train, lr,
                                             b1=opt.beta1, b2=0.999)
                new_params = dict(params)
                for n in disc_names:
                    new_params[n] = dict(new_d[n], **auxs[n])
                    if stats.get(n):
                        new_params[n] = dict(new_params[n], **stats[n])
                return new_params, new_opt, m, rng_next
            return d_step

        def eval_step(params, batch, rng):
            g_full = {n: params[n] for n in ["G_A", "G_B"]}
            f = gen_forward(g_full, batch, rng, False)
            m = {
                "depth_dif_A": L.masked_l1_loss(meters(f["real_depth_A"]),
                                                meters(f["fake_depth_B"]), ~f["hole_mask_A"]),
                "depth_dif_B": L.masked_l1_loss(meters(f["real_depth_B"]),
                                                meters(f["fake_depth_A"]), ~f["hole_mask_B"]),
            }
            return m, f

        self._g_step = self.jit_train(g_step)
        self._d_step = self.jit_train(make_d_step(True)) if disc_names else None
        # feed variant: params/opt_state donated, the feed is NOT (arg 2)
        self._d_step_feed = self.jit_train(make_d_step(False)) if disc_names else None
        self._eval_step = jax.jit(eval_step)

        self._iter_step = None
        if self.isTrain and getattr(opt, "fused_iter", False):
            # ONE dispatch per training iteration: the num_iter_gen G-steps and
            # num_iter_dis D-steps (reference translation_model.py:274-291 —
            # several G steps per D step) run as lax.scans inside a single
            # jitted program. Trajectory identical to the per-call path (the
            # rng threads through the scan carries in the same order); saves
            # (num_iter_gen + num_iter_dis - 1) dispatch latencies per iter.
            n_g = max(1, opt.num_iter_gen)
            n_d = opt.num_iter_dis if disc_names else 0

            d_fresh, d_feed_fn = make_d_step(True), make_d_step(False)

            def iter_step(params, os_g, os_d, batch, rng, lr, weights):
                def g_body(carry, _):
                    p, o, r = carry
                    p, o, m, feed, r = g_step(p, o, batch, r, lr, weights)
                    return (p, o, r), (m, feed)

                (params, os_g, rng), (ms, feeds) = jax.lax.scan(
                    g_body, (params, os_g, rng), None, length=n_g)
                m = jax.tree_util.tree_map(lambda v: v[-1], ms)
                if n_d:
                    # first D iteration consumes the LAST G forward's tensors
                    # (reference :284-291 reuses them when j == 0)
                    feed = jax.tree_util.tree_map(lambda v: v[-1], feeds)
                    params, os_d, md, rng = d_feed_fn(params, os_d, feed, rng, lr)
                    if n_d > 1:
                        def d_body(carry, _):
                            p, o, r = carry
                            p, o, md, r = d_fresh(p, o, batch, r, lr)
                            return (p, o, r), md

                        (params, os_d, rng), mds = jax.lax.scan(
                            d_body, (params, os_d, rng), None, length=n_d - 1)
                        md = jax.tree_util.tree_map(lambda v: v[-1], mds)
                    m.update(md)
                return params, os_g, os_d, m, rng

            self._iter_step = self.jit_train(iter_step, donate=(0, 1, 2))

        if self.isTrain:
            g_train = {n: split_trainable(self.params[n])[0] for n in ["G_A", "G_B"]}
            self.opt_state_G = adam_init(g_train)
            if disc_names:
                d_train = {n: split_trainable(self.params[n])[0] for n in disc_names}
                self.opt_state_D = adam_init(d_train)

    # -- reference-API entry points -------------------------------------------

    def set_input(self, batch):
        self._batch = self.shard({
            "A_depth": batch["A_depth"], "A_img": batch["A_img"],
            "B_depth": batch["B_depth"], "B_img": batch["B_img"],
        })
        self._names = {"A_name": batch.get("A_name"), "B_name": batch.get("B_name")}

    def _weights(self):
        vals = (max(self.l_depth_A, 0.0), max(self.l_depth_B, 0.0),
                self.l_cycle_A, self.l_cycle_B)
        # cache device scalars: per-step device_puts are remote round trips
        if getattr(self, "_weights_vals", None) != vals:
            self._weights_dev = {
                "l_depth_A": jnp.float32(vals[0]),
                "l_depth_B": jnp.float32(vals[1]),
                "l_cycle_A": jnp.float32(vals[2]),
                "l_cycle_B": jnp.float32(vals[3]),
            }
            self._weights_vals = vals
        return self._weights_dev

    def optimize_parameters(self, iters, fr=1):
        lr = self.lr_scalar()
        weights = self._weights()
        if self._iter_step is not None:
            os_d = getattr(self, "opt_state_D", None)
            (self.params, self.opt_state_G, os_d,
             m, new_rng) = self._iter_step(self.params, self.opt_state_G, os_d,
                                           self._batch, self.step_rng(), lr, weights)
            if self._d_step is not None:
                self.opt_state_D = os_d
            self.set_step_rng(new_rng)
            self.metrics = dict(m)
            return
        feed = None
        for _ in range(self.opt.num_iter_gen):
            self.params, self.opt_state_G, m, feed, new_rng = self._g_step(
                self.params, self.opt_state_G, self._batch, self.step_rng(), lr, weights)
            self.set_step_rng(new_rng)
        self.metrics = dict(m)
        if self._d_step is not None:
            for j in range(self.opt.num_iter_dis):
                if j == 0 and feed is not None:
                    # reference :284-291: the first D iteration reuses the
                    # last G forward's (detached, pre-G-update) tensors;
                    # only j > 0 re-runs the generator forward
                    self.params, self.opt_state_D, md, new_rng = self._d_step_feed(
                        self.params, self.opt_state_D, feed, self.step_rng(), lr)
                else:
                    self.params, self.opt_state_D, md, new_rng = self._d_step(
                        self.params, self.opt_state_D, self._batch, self.step_rng(), lr)
                self.set_step_rng(new_rng)
            self.metrics.update(md)

    def calculate(self, stage="test"):
        m, f = self._eval_step(self.params, self._batch, self.next_rng())
        self.metrics = m
        self.visuals = {k: f[k] for k in self.visual_names if k in f}

    def calc_test_loss(self):
        self.calculate()
        self.test_depth_dif_A = float(self.metrics["depth_dif_A"])
        self.test_depth_dif_B = float(self.metrics["depth_dif_B"])

    # -- extra metric API (reference translation_model.py:307-323) ------------

    def _meters(self, x):
        md = self.opt.max_distance
        return (np.asarray(x) * (md / 2) + md / 2) / 1000.0

    def _masked_l1_m(self, a, b, mask):
        mask = np.asarray(mask)
        return float(np.sum(np.abs(self._meters(b) - self._meters(a)) * mask)
                     / (mask.sum() + 1e-6))

    def get_L1_loss(self):
        f = self.visuals
        return self._masked_l1_m(f["real_depth_A"], f["fake_depth_B"],
                                 np.asarray(f["real_depth_A"]) > HOLE_BORDER)

    def get_L1_loss_syn(self):
        f = self.visuals
        return self._masked_l1_m(f["real_depth_B"], f["fake_depth_A"],
                                 np.asarray(f["fake_depth_A"]) > HOLE_BORDER)

    def get_L1_loss_cycle(self):
        f = self.visuals
        return self._masked_l1_m(f["real_depth_A"], f["rec_depth_A"],
                                 np.asarray(f["real_depth_A"]) > HOLE_BORDER)

    def get_L1_loss_cycle_syn(self):
        f = self.visuals
        return float(np.mean(np.abs(self._meters(f["rec_depth_B"])
                                    - self._meters(f["real_depth_B"]))))

    def get_dif(self):
        """signed masked mean difference in meters (y - x)."""
        f = self.visuals
        mask = np.asarray(f["real_depth_A"]) > HOLE_BORDER
        return float(np.sum((self._meters(f["fake_depth_B"])
                             - self._meters(f["real_depth_A"])) * mask)
                     / (mask.sum() + 1e-6))

    def get_dif_syn(self):
        f = self.visuals
        mask = np.asarray(f["fake_depth_A"]) > HOLE_BORDER
        return float(np.sum((self._meters(f["fake_depth_A"])
                             - self._meters(f["real_depth_B"])) * mask)
                     / (mask.sum() + 1e-6))

    def get_mask(self, depth):
        return np.asarray(depth) <= HOLE_BORDER
