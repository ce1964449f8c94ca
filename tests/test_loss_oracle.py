"""Step-level loss-graph oracle: every per-stage loss term vs the reference.

The network parity tests prove layer semantics; these tests prove the LOSS
GRAPHS. For each stage we build OUR model, inject its exact parameters into
the reference torch model (via the state_dict weight-parity contract), feed a
bit-identical batch, run the reference's ``forward()`` +
``backward_G(back=False)`` / ``calculate()`` on CPU torch, and compare every
reported loss term and the total objective.

Randomized hole synthesis is made deterministic by capturing the reference's
random rectangle masks (np.random seeded) and injecting them into our jitted
step via a monkeypatched ``ops.depth.random_rect_holes`` — so the hole-region
losses are verified against NONZERO masks, not the all-ones test-stage ones.

Reference loss graphs: models/I2D_model.py:210-232, models/main_model.py:
340-419, models/main_sr_model.py:391-484, models/translation_model.py:211-272.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu.options.train_options import TrainOptions
from tests.reference_oracle import load_reference_package

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- helpers


def _to_state(params):
    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def _ref_opt(opt):
    r = copy.deepcopy(opt)
    r.gpu_ids = []  # reference init_net: empty gpu_ids -> CPU, no DataParallel
    return r


def _close(name, ours, ref, rtol=1e-3, atol=2e-5):
    ours, ref = float(ours), float(ref)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol,
                               err_msg=f"loss term {name}: ours={ours} ref={ref}")


def _inject_masks(monkeypatch, masks_in_call_order):
    """Make our random_rect_holes return the reference's captured masks."""
    import desr_tpu.ops.depth as DPT

    it = iter([jnp.asarray(m, jnp.float32) for m in masks_in_call_order])
    monkeypatch.setattr(DPT, "random_rect_holes", lambda rng, base, **kw: next(it))


# ---------------------------------------------------------------- I2D


def test_i2d_loss_oracle():
    from tests.test_model_i2d import make_opt, fake_batch
    from desr_tpu.models.i2d_model import I2DModel

    opt = make_opt(["--batch_size", "1"])
    ours = I2DModel(opt)
    ours.setup()

    ref_mod = load_reference_package("models.I2D_model")
    ref = ref_mod.I2DModel(_ref_opt(opt))
    ref.netImage_f.load_state_dict(_to_state(ours.params["Image_f"]), strict=True)
    ref.netTask.load_state_dict(_to_state(ours.params["Task"]), strict=True)

    batch = fake_batch(b=1)
    ours.set_input(batch)
    ours.calculate(stage="test")

    ref.eval()
    ref.set_input({"A_i": _nchw(batch["A_i"]), "B_i": _nchw(batch["B_i"]),
                   "A_d": _nchw(batch["A_d"]), "B_d": _nchw(batch["B_d"]),
                   "A_paths": batch["A_paths"], "B_paths": batch["B_paths"]})
    with torch.no_grad():
        ref.forward()
        ref.backward_G(back=False)

    _close("task_syn", ours.metrics["task_syn"], ref.loss_task_syn)
    _close("task_real", ours.metrics["task_real"], ref.loss_task_real)
    # image-space normals feed this term; fp32 vs the same fp32 graph
    _close("syn_norms", ours.metrics["syn_norms"], ref.loss_syn_norms, rtol=2e-3)
    _close("G", ours.metrics["G"], ref.loss_G)


# ---------------------------------------------------------------- main


def test_main_loss_oracle(monkeypatch):
    from tests.test_model_main import make_opt, fake_batch
    from desr_tpu.models.main_model import MainModel

    opt = make_opt(["--batch_size", "1"])
    batch = fake_batch(b=1)

    # --- reference side first: capture its random hole masks (train stage)
    ref_mod = load_reference_package("models.main_model")
    ref = ref_mod.MainModel(_ref_opt(opt))

    tb = {"A_i": _nchw(batch["A_i"]), "B_i": _nchw(batch["B_i"]),
          "A_d": _nchw(batch["A_d"]), "B_d": _nchw(batch["B_d"]),
          "A_paths": batch["A_paths"], "B_paths": batch["B_paths"],
          "K_A": torch.from_numpy(batch["K_A"]).double(),
          "K_B": torch.from_numpy(batch["K_B"]).double(),
          "crop_A": torch.from_numpy(batch["crop_A"]).double(),
          "crop_B": torch.from_numpy(batch["crop_B"]).double()}

    # --- our side: init params, inject them into the reference
    ours = MainModel(opt)
    ours.init_params(seed=0)
    for name, net_attr in [("G_A_d", "netG_A_d"), ("I2D_features", "netI2D_features"),
                           ("Image2Depth", "netImage2Depth"), ("Task", "netTask"),
                           ("Depth_f", "netDepth_f")]:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    ref.eval()
    ref.set_input(tb)
    # seed chosen so BOTH per-sample binomial gates draw 1 (the reference
    # multiplies ALL rect sizes by one binomial(1, p) scalar, so ~10% of
    # samples get empty masks; seed 1 yields nonzero masks for real AND syn)
    np.random.seed(1)
    with torch.no_grad():
        ref.forward(stage="train")  # train stage => nonzero random hole masks
        ref.backward_G(back=False)
    gt_real = ref.gt_mask_real.numpy()[:, 0].astype(np.float32)  # (B, H, W)
    gt_syn = ref.gt_mask_syn.numpy()[:, 0].astype(np.float32)
    assert gt_real.min() == 0.0 and gt_syn.min() == 0.0, "masks must be nonzero tests"

    # --- our side: same masks injected, full loss graph under jit
    _inject_masks(monkeypatch, [gt_real, gt_syn])
    ours.params = {k: v for k, v in ours.params.items()}
    ours._post_setup()
    ours.set_input(batch)
    ours.calculate(stage="test")
    m = ours.metrics

    for name, ref_val, kw in [
        ("task_syn", ref.loss_task_syn, {}),
        ("holes_syn", ref.loss_holes_syn, {}),
        ("holes_syn_l2", ref.loss_holes_syn_l2, {}),
        ("task_real_by_depth", ref.loss_task_real_by_depth, {}),
        ("task_real_by_image", ref.loss_task_real_by_image, {}),
        ("holes_real", ref.loss_holes_real, {}),
        ("holes_real_l2", ref.loss_holes_real_l2, {}),
        ("tv_syn_norm_old", ref.loss_tv_syn_norm_old, {"rtol": 2e-3}),
        ("tv_real_norm_old", ref.loss_tv_real_norm_old, {"rtol": 2e-3}),
        ("syn_norms_old", ref.loss_syn_norms_old, {"rtol": 2e-3}),
        # K-based normals: ours fp32 vs reference fp64 graph
        ("tv_syn_norm", ref.loss_tv_syn_norm, {"rtol": 5e-3}),
        ("tv_real_norm", ref.loss_tv_real_norm, {"rtol": 5e-3}),
        ("syn_norms", ref.loss_syn_norms, {"rtol": 5e-3}),
        ("syn_norms_holes", ref.loss_syn_norms_holes, {"rtol": 5e-3}),
        ("smooth", ref.loss_smooth, {"rtol": 2e-3}),
        ("G", ref.loss_G, {"rtol": 5e-3}),
    ]:
        _close(name, m[name], ref_val, **kw)


# ---------------------------------------------------------------- SR


def test_sr_loss_oracle(monkeypatch):
    from tests.test_model_sr import make_opt, fake_batch
    from desr_tpu.models.main_sr_model import MainSRModel

    opt = make_opt()
    opt.use_smooth_loss = True  # exercise the SR smooth term too (:470-472)
    batch = fake_batch(b=1)

    ref_mod = load_reference_package("models.main_sr_model")
    # the reference hardcodes gpu_ids=[0,1,2,3] for its frozen translator
    # (main_sr_model.py:166) — strip for CPU-torch oracle execution
    ref_tn = load_reference_package("models.translation_network")
    orig_define_gen = ref_tn.define_Gen

    def _cpu_define_gen(o, input_type="depth"):
        o.gpu_ids = []
        return orig_define_gen(o, input_type)

    monkeypatch.setattr(ref_tn, "define_Gen", _cpu_define_gen)
    ref = ref_mod.MainSRModel(_ref_opt(opt))

    ours = MainSRModel(opt)
    ours.init_params(seed=0)
    for name, net_attr in [("G_A_d", "netG_A_d"), ("I2D_features", "netI2D_features"),
                           ("Image2Depth", "netImage2Depth"), ("Task", "netTask"),
                           ("Depth_f", "netDepth_f")]:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    tb = {"A_i": _nchw(batch["A_i"]), "B_i": _nchw(batch["B_i"]),
          "A_d": _nchw(batch["A_d"]), "B_d": _nchw(batch["B_d"]),
          "A_paths": batch["A_paths"], "B_paths": batch["B_paths"],
          "K_A": torch.from_numpy(batch["K_A"]).double(),
          "K_B": torch.from_numpy(batch["K_B"]).double(),
          "crop_A": torch.from_numpy(batch["crop_A"]).double(),
          "crop_B": torch.from_numpy(batch["crop_B"]).double()}

    ref.eval()
    ref.set_input(tb)
    np.random.seed(1)
    with torch.no_grad():
        # train stage: the SR test stage computes no syn branch / losses at all
        ref.forward(stage="train")
        ref.backward_G(back=False)
    gt_real = ref.gt_mask_real.numpy()[:, 0].astype(np.float32)
    gt_syn = ref.gt_mask_syn.numpy()[:, 0].astype(np.float32)
    assert gt_real.min() == 0.0 and gt_syn.min() == 0.0, "need nonzero hole masks"

    _inject_masks(monkeypatch, [gt_real, gt_syn])
    ours._post_setup()
    ours.set_input(batch)
    ours.calculate(stage="test")
    m = ours.metrics

    for name, ref_val, kw in [
        ("task_syn", ref.loss_task_syn, {}),
        ("holes_syn", ref.loss_holes_syn, {}),
        ("holes_syn_l2", ref.loss_holes_syn_l2, {}),
        ("task_real_by_depth", ref.loss_task_real_by_depth, {}),
        ("task_real_by_image", ref.loss_task_real_by_image, {}),
        ("holes_real", ref.loss_holes_real, {}),
        ("holes_real_l2", ref.loss_holes_real_l2, {}),
        ("tv_syn_norm_old", ref.loss_tv_syn_norm_old, {"rtol": 2e-3}),
        ("tv_real_norm_old", ref.loss_tv_real_norm_old, {"rtol": 2e-3}),
        ("syn_norms_old", ref.loss_syn_norms_old, {"rtol": 2e-3}),
        ("tv_syn_norm", ref.loss_tv_syn_norm, {"rtol": 5e-3}),
        ("tv_real_norm", ref.loss_tv_real_norm, {"rtol": 5e-3}),
        ("syn_norms", ref.loss_syn_norms, {"rtol": 5e-3}),
        ("syn_norms_holes", ref.loss_syn_norms_holes, {"rtol": 5e-3}),
        ("smooth", ref.loss_smooth, {"rtol": 2e-3}),
        ("G", ref.loss_G, {"rtol": 5e-3}),
    ]:
        _close(name, m[name], ref_val, **kw)


def test_sr_use_rec_loss_oracle(monkeypatch):
    """--use_rec_as_real_input (QUIRKS #31): the real branch is re-degraded
    through frozen G_B_d -> G_A_d before masking (main_sr_model.py:263-265).
    The reference AS-SHIPPED crashes on :265 (it hands the two-encoder
    netG_A_d ONE concatenated 4-channel tensor; enc_img(None) TypeErrors at
    translation_network.py:643) — so the oracle patches the evident intent,
    G_A_d(r2s, real_image), onto the reference and verifies our loss graph
    against that. Our G_B_d (random-init) is injected into the reference's
    never-loaded net so both sides run identical weights."""
    from tests.test_model_sr import make_opt, fake_batch
    from desr_tpu.models.main_sr_model import MainSRModel

    opt = make_opt()
    opt.use_rec_as_real_input = True
    batch = fake_batch(b=1)

    ref_mod = load_reference_package("models.main_sr_model")
    ref_tn = load_reference_package("models.translation_network")
    orig_define_gen = ref_tn.define_Gen

    def _cpu_define_gen(o, input_type="depth"):
        o.gpu_ids = []
        return orig_define_gen(o, input_type)

    monkeypatch.setattr(ref_tn, "define_Gen", _cpu_define_gen)
    ref = ref_mod.MainSRModel(_ref_opt(opt))

    ours = MainSRModel(opt)
    ours.init_params(seed=0)
    assert "G_B_d" in ours.params  # defined under the flag
    for name, net_attr in [("G_A_d", "netG_A_d"), ("I2D_features", "netI2D_features"),
                           ("Image2Depth", "netImage2Depth"), ("Task", "netTask"),
                           ("Depth_f", "netDepth_f"), ("G_B_d", "netG_B_d")]:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    # intent shim: when main_sr_model.py:265 passes ONE 4-channel tensor,
    # split it back into (depth, img) instead of crashing (see docstring)
    gad = ref.netG_A_d

    class _SplitCall(torch.nn.Module):
        def forward(self, depth, img=None):
            if img is None and depth.shape[1] == 4:
                depth, img = depth[:, :1], depth[:, 1:]
            return gad(depth, img)

    ref.netG_A_d = _SplitCall()

    tb = {"A_i": _nchw(batch["A_i"]), "B_i": _nchw(batch["B_i"]),
          "A_d": _nchw(batch["A_d"]), "B_d": _nchw(batch["B_d"]),
          "A_paths": batch["A_paths"], "B_paths": batch["B_paths"],
          "K_A": torch.from_numpy(batch["K_A"]).double(),
          "K_B": torch.from_numpy(batch["K_B"]).double(),
          "crop_A": torch.from_numpy(batch["crop_A"]).double(),
          "crop_B": torch.from_numpy(batch["crop_B"]).double()}

    ref.eval()
    ref.set_input(tb)
    np.random.seed(1)
    with torch.no_grad():
        ref.forward(stage="train")
        ref.backward_G(back=False)
    gt_real = ref.gt_mask_real.numpy()[:, 0].astype(np.float32)
    gt_syn = ref.gt_mask_syn.numpy()[:, 0].astype(np.float32)
    assert gt_real.min() == 0.0 and gt_syn.min() == 0.0, "need nonzero hole masks"

    _inject_masks(monkeypatch, [gt_real, gt_syn])
    ours._post_setup()
    ours.set_input(batch)
    ours.calculate(stage="test")
    m = ours.metrics

    # checkpoint-exclusion quirk: save must not write a G_B_d file
    ours.save_networks("oracle")
    import os
    assert not os.path.exists(os.path.join(ours.save_dir(), "oracle_net_G_B_d.pth"))
    assert "G_B_d" in ours.params  # restored after save

    for name, ref_val, kw in [
        ("task_real_by_depth", ref.loss_task_real_by_depth, {}),
        ("task_real_by_image", ref.loss_task_real_by_image, {}),
        ("holes_real", ref.loss_holes_real, {}),
        ("holes_real_l2", ref.loss_holes_real_l2, {}),
        ("task_syn", ref.loss_task_syn, {}),
        ("tv_real_norm", ref.loss_tv_real_norm, {"rtol": 5e-3}),
        ("syn_norms", ref.loss_syn_norms, {"rtol": 5e-3}),
        ("G", ref.loss_G, {"rtol": 5e-3}),
    ]:
        _close(name, m[name], ref_val, **kw)


# ---------------------------------------------------------------- translation


def test_translation_loss_oracle():
    from tests.test_model_translation import make_opt, fake_batch
    from desr_tpu.models.translation_model import TranslationModel

    opt = make_opt()
    batch = fake_batch(b=1)

    # full-size translators: the reference hardcodes ngf=64 / 9 blocks
    ours = TranslationModel(opt)
    ours.init_params(seed=0)

    ref_mod = load_reference_package("models.translation_model")
    ref = ref_mod.TranslationModel(_ref_opt(opt))
    for name, net_attr in [("G_A", "netG_A"), ("G_B", "netG_B"),
                           ("D_A_depth", "netD_A_depth"), ("D_B_depth", "netD_B_depth"),
                           ("D_A_normal", "netD_A_normal"), ("D_B_normal", "netD_B_normal")]:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    ref.set_input({"A_img": _nchw(batch["A_img"]), "A_depth": _nchw(batch["A_depth"]),
                   "B_img": _nchw(batch["B_img"]), "B_depth": _nchw(batch["B_depth"]),
                   "A_name": batch["A_name"], "B_name": batch["B_name"]})
    ref.forward()
    ref.backward_G()          # computes loss attrs; grads discarded
    ref.backward_D_A()
    ref.backward_D_B()

    # ours: same graphs via the exposed loss fns, no optimizer updates
    gen_forward = ours._forward_fns()
    g_losses = ours._g_losses_fn()
    d_losses = ours._d_losses_fn()
    weights = {"l_depth_A": jnp.float32(ours.l_depth_A),
               "l_depth_B": jnp.float32(ours.l_depth_B),
               "l_cycle_A": jnp.float32(ours.l_cycle_A),
               "l_cycle_B": jnp.float32(ours.l_cycle_B)}

    @jax.jit
    def all_losses(params, b):
        g_full = {n: params[n] for n in ["G_A", "G_B"]}
        d_full = {n: params[n] for n in ours.disc_names}
        f = gen_forward(g_full, b, jax.random.PRNGKey(0), True)
        loss_g, m = g_losses(f, d_full, weights)
        _, md = d_losses(f, d_full)
        return loss_g, m, md

    jb = {k: jnp.asarray(v) for k, v in batch.items() if not k.endswith("name")}
    loss_g, m, md = all_losses(ours.params, jb)

    for name, ref_val, kw in [
        ("G_A", ref.loss_G_A, {}),
        ("G_B", ref.loss_G_B, {}),
        ("cycle_B", ref.loss_cycle_B, {}),
        ("cycle_n_B", ref.loss_cycle_n_B, {"rtol": 2e-3}),
        ("idt_B", ref.loss_idt_B, {}),
        ("depth_range_A", ref.loss_depth_range_A, {}),
        ("depth_range_B", ref.loss_depth_range_B, {}),
        ("D_A_depth", ref.loss_D_A_depth, {}),
        ("D_B_depth", ref.loss_D_B_depth, {}),
        ("D_A_normal", ref.loss_D_A_normal, {"rtol": 2e-3}),
        ("D_B_normal", ref.loss_D_B_normal, {"rtol": 2e-3}),
    ]:
        _close(name, (m | md)[name], ref_val, rtol=kw.get("rtol", 1e-3), atol=5e-5)
    _close("G", loss_g, ref.loss_G, rtol=2e-3, atol=5e-5)
