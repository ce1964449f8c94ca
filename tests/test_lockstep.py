"""Lockstep trajectory parity: N optimizer steps vs the torch reference.

From identical initialization, both frameworks run the SAME sequence of Adam
steps on the SAME fixed batches for the main stage (the flagship training
path), and the resulting trainable weights must stay within a small relative
drift. This is the strongest parity evidence available without real data: it
exercises forward + full loss zoo + backward + torch-exact Adam together,
step over step (reference optimize_parameters: models/main_model.py:422-429).

Random hole synthesis is neutralized identically on both sides (reference:
the per-sample binomial gate is forced to 0 so all rect sizes are zero; ours:
random_rect_holes returns the all-ones mask), making every step deterministic.

The translation lockstep additionally pins the G/D ALTERNATION semantics
(reference translation_model.py:274-291): num_iter_gen generator steps, then
a first discriminator step that REUSES the last G forward's detached tensors
(fakes from the pre-update generator weights) — only D iterations j > 0 rerun
the forward. A fresh-forward first D step trains the Ds on different fakes
and diverges the D trajectory; this test would catch it at iteration 1.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.reference_oracle import load_reference_package
from tests.test_loss_oracle import _nchw, _ref_opt, _to_state
from tests.test_model_main import fake_batch, make_opt

torch = pytest.importorskip("torch")

N_STEPS = 20


def test_main_lockstep_trajectory(monkeypatch):
    from desr_tpu.models.main_model import MainModel
    import desr_tpu.ops.depth as DPT

    opt = make_opt(["--batch_size", "1"])
    batches = [fake_batch(b=1, seed=s) for s in (0, 7)]

    # ---- neutralize hole randomness on both sides
    monkeypatch.setattr(DPT, "random_rect_holes",
                        lambda rng, base, **kw: jnp.ones_like(base))
    monkeypatch.setattr(np.random, "binomial", lambda n, p, *a, **kw: 0)

    ours = MainModel(opt)
    ours.setup()

    ref_mod = load_reference_package("models.main_model")
    ref = ref_mod.MainModel(_ref_opt(opt))
    for name, net_attr in [("G_A_d", "netG_A_d"), ("I2D_features", "netI2D_features"),
                           ("Image2Depth", "netImage2Depth"), ("Task", "netTask"),
                           ("Depth_f", "netDepth_f")]:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    tbs = []
    for batch in batches:
        tbs.append({"A_i": _nchw(batch["A_i"]), "B_i": _nchw(batch["B_i"]),
                    "A_d": _nchw(batch["A_d"]), "B_d": _nchw(batch["B_d"]),
                    "A_paths": batch["A_paths"], "B_paths": batch["B_paths"],
                    "K_A": torch.from_numpy(batch["K_A"]).double(),
                    "K_B": torch.from_numpy(batch["K_B"]).double(),
                    "crop_A": torch.from_numpy(batch["crop_A"]).double(),
                    "crop_B": torch.from_numpy(batch["crop_B"]).double()})

    # ---- gradient oracle at initialization: the sharp parity check.
    # (Raw-weight equality after N Adam steps is NOT a meaningful target:
    # conv biases directly before affine-free InstanceNorm are gradient-dead
    # — both frameworks produce ~1e-7 fp noise there, and Adam's sign-like
    # normalization turns that noise into independent +-lr random walks.
    # The function is invariant along those directions, so parity is asserted
    # on gradients, loss curves, and the functional value of the weights.)
    ref.set_input(tbs[0])
    ref.forward(stage="train")
    ref.backward_G(back=True)
    # The sharp fp32 check validates the LOSS-GRAPH MATH against torch, so it
    # runs with every reassociation-changing compute-path optimization off
    # (batched branches, split conv, one-pass IN stats) — each of those has
    # its own exactness/equivalence test (test_fused_ops, test_model_main),
    # but their reordered f32 sums amplify to ~4e-4 through deep backprop,
    # which exceeds this oracle's atol floor without indicating wrong math.
    for flag in ("no_batched_branches", "no_split_conv", "no_onepass_stats", "no_ring_pad"):
        setattr(ours.opt, flag, True)
    grads = ours._grads_for_oracle(batches[0])
    for flag in ("no_batched_branches", "no_split_conv", "no_onepass_stats", "no_ring_pad"):
        setattr(ours.opt, flag, False)
    worst = (None, 0.0)
    for net, net_attr in [("Task", "netTask"), ("Depth_f", "netDepth_f")]:
        named = dict(getattr(ref, net_attr).named_parameters())
        for k, gv in grads[net].items():
            rg = named[k].grad.detach().numpy().astype(np.float64)
            a = np.asarray(gv, np.float64)
            # excess over atol(fp-noise floor) + rtol * tensor gradient scale.
            # rtol 0.03 absorbs single tail coordinates of the fp32-vs-fp64
            # normal-loss path (median rel error of large-grad coords: ~1e-3)
            excess = np.max(np.abs(a - rg)) - (1e-5 + 0.03 * np.max(np.abs(rg)))
            if excess > worst[1]:
                worst = (f"{net}.{k}", excess)
    assert worst[1] <= 0.0, f"gradient mismatch (excess {worst[1]:.2e}) at {worst[0]}"
    ref.optimizer_G.zero_grad()

    loss_ours, loss_ref = [], []
    for it in range(N_STEPS):
        b = it % len(batches)
        ours.set_input(batches[b])
        ours.optimize_parameters(it + 1)
        loss_ours.append(float(ours.metrics["G"]))

        ref.set_input(tbs[b])
        ref.optimize_parameters(it + 1)
        loss_ref.append(float(ref.loss_G))

    # loss curves must track each other step for step
    np.testing.assert_allclose(loss_ours, loss_ref, rtol=2e-3,
                               err_msg=f"ours={loss_ours}\nref={loss_ref}")
    assert loss_ours[-1] < loss_ours[0], "training must reduce the loss"

    # weight drift bounded by the Adam random-walk scale (|update| <= lr/step)
    lr = ours.lr
    worst = (None, 0.0)
    for net, net_attr in [("Task", "netTask"), ("Depth_f", "netDepth_f")]:
        ref_sd = getattr(ref, net_attr).state_dict()
        for k, v in ours.params[net].items():
            d = np.max(np.abs(np.asarray(v, np.float64)
                              - ref_sd[k].detach().numpy().astype(np.float64)))
            if d > worst[1]:
                worst = (f"{net}.{k}", d)
    assert worst[1] < 2.0 * lr * N_STEPS, \
        f"weight drift {worst[1]:.2e} at {worst[0]} exceeds the Adam step budget"

    # functional drift: evaluate BOTH weight sets with OUR evaluator on a
    # held-out batch — the loss the reference-trained weights produce must
    # match the loss our trained weights produce
    held_out = fake_batch(b=1, seed=99)
    ref_params = dict(ours.params)
    for net, net_attr in [("Task", "netTask"), ("Depth_f", "netDepth_f")]:
        ref_params[net] = {k: jnp.asarray(t.detach().numpy())
                           for k, t in getattr(ref, net_attr).state_dict().items()}
    ours.set_input(held_out)
    rng = ours.next_rng()
    g_ours = float(ours._eval_step(ours.params, ours._batch, rng)[0]["G"])
    g_ref = float(ours._eval_step(ref_params, ours._batch, rng)[0]["G"])
    np.testing.assert_allclose(g_ours, g_ref, rtol=2e-3,
                               err_msg="functional drift after lockstep training")

    # frozen nets must be bit-identical to their (shared) initialization
    for net, net_attr in [("G_A_d", "netG_A_d"), ("I2D_features", "netI2D_features"),
                          ("Image2Depth", "netImage2Depth")]:
        ref_sd = getattr(ref, net_attr).state_dict()
        for k, v in ours.params[net].items():
            np.testing.assert_array_equal(np.asarray(v), ref_sd[k].detach().numpy(),
                                          err_msg=f"{net}.{k}")


N_ITERS_TR = 3  # x (num_iter_gen=2 G steps + 1 D step) each


def test_translation_lockstep_trajectory():
    """G/D alternation vs torch: 3 full optimize_parameters iterations.

    Iteration 1 is the sharp check of the stale-feed contract: the
    reference's first backward_D sees fakes produced by the PRE-update
    generator of the last G step (translation_model.py:284-291). A
    fresh-forward first D step shifts D_A losses by ~1.7e-3 rel (measured),
    while genuine cross-framework fp noise at iteration 1 is ~2.4e-5 rel —
    so iteration 1 is asserted at rtol 2e-4, between the two.

    Iterations 2-3 are CHAOTIC: the adversarial loop amplifies per-op fp
    noise ~100x per iteration (measured within our own framework — a
    device-count change perturbing only reduction order moved depth_range_A
    by 6e-3 rel at iteration 3, while a same-device re-run is bit-stable).
    Later iterations therefore get a loose 10% curve bound (catches wiring
    bugs: wrong tensors, missing terms) plus the Adam-step weight budget.
    """
    from tests.test_model_translation import fake_batch, make_opt
    from desr_tpu.models.translation_model import TranslationModel

    opt = make_opt()
    batches = [fake_batch(b=2, seed=s) for s in (0, 7, 13)]

    ours = TranslationModel(opt)
    ours.setup()

    ref_mod = load_reference_package("models.translation_model")
    ref = ref_mod.TranslationModel(_ref_opt(opt))
    net_map = [("G_A", "netG_A"), ("G_B", "netG_B"),
               ("D_A_depth", "netD_A_depth"), ("D_B_depth", "netD_B_depth"),
               ("D_A_normal", "netD_A_normal"), ("D_B_normal", "netD_B_normal")]
    for name, net_attr in net_map:
        getattr(ref, net_attr).load_state_dict(_to_state(ours.params[name]), strict=True)

    tbs = [{"A_img": _nchw(b["A_img"]), "A_depth": _nchw(b["A_depth"]),
            "B_img": _nchw(b["B_img"]), "B_depth": _nchw(b["B_depth"]),
            "A_name": b["A_name"], "B_name": b["B_name"]} for b in batches]

    track = ["G_A", "G_B", "depth_range_A", "depth_range_B",
             "D_A_depth", "D_B_depth", "D_A_normal", "D_B_normal"]
    curves_ours = {k: [] for k in track}
    curves_ref = {k: [] for k in track}
    for it in range(N_ITERS_TR):
        ours.set_input(batches[it])
        ours.optimize_parameters(it + 1)
        for k in track:
            curves_ours[k].append(float(ours.metrics[k]))

        ref.set_input(tbs[it])
        ref.optimize_parameters(it + 1)
        for k in track:
            curves_ref[k].append(float(getattr(ref, "loss_" + k)))

    for k in track:
        # iteration 1: sharp (above fp noise 2.4e-5, below the 1.7e-3
        # stale-vs-fresh D-feed signal); iterations 2+: chaos bound only
        np.testing.assert_allclose(
            curves_ours[k][0], curves_ref[k][0], rtol=2e-4, atol=1e-6,
            err_msg=f"{k}@iter1: ours={curves_ours[k]} ref={curves_ref[k]}")
        np.testing.assert_allclose(
            curves_ours[k], curves_ref[k], rtol=0.1, atol=1e-4,
            err_msg=f"{k}: ours={curves_ours[k]} ref={curves_ref[k]}")

    # discriminator weights: the direct witnesses of the stale-feed gradients
    lr = ours.lr
    for name, net_attr in net_map:
        ref_sd = getattr(ref, net_attr).state_dict()
        for k, v in ours.params[name].items():
            d = np.max(np.abs(np.asarray(v, np.float64)
                              - ref_sd[k].detach().numpy().astype(np.float64)))
            steps = N_ITERS_TR * (opt.num_iter_gen if name.startswith("G") else 1)
            # 2.5x: opposite-direction walks reach 2x exactly when the
            # chaotic iterations flip gradient signs (observed 1.22e-3 at
            # 3 steps of lr 2e-4), and early bias-corrected Adam steps run
            # slightly over lr; an lr/beta bug still overshoots 10x
            assert d < 2.5 * lr * steps, \
                f"{name}.{k} drift {d:.2e} exceeds the Adam step budget"
