"""--steps_per_call / --fused_iter: single-dispatch multi-step train paths.

The scanned programs run the SAME step math as N sequential calls with the
SAME rng threading, but XLA compiles scan bodies separately from the
standalone step program, so conv reductions reassociate at fp32 noise level.
Adam is scale-invariant (step ~= lr * sign(g) for near-zero gradient
elements), which amplifies that noise into +-lr-sized sign flips — bit
equality of trajectories across program structures is NOT achievable. As in
tests/test_lockstep.py, equivalence is asserted as:

- the rng carry advances EXACTLY as in N sequential calls (catches
  mis-counted steps / wrong key threading),
- a first-call loss computed from identical state matches to fp32 tolerance
  (catches wrong batch slicing / wrong loss graph),
- parameter divergence stays inside the Adam random-walk budget
  (~2 * lr * n_steps; catches wrong lr, skipped/extra updates).

Reference semantics being preserved: per-batch ``optimize_parameters``
(train.py:61-67) and the translation stage's 3 G + 1 D iteration
(translation_model.py:274-291).
"""

import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions

from tests.test_model_main import fake_batch

LR = 2e-4


def make_opt(extra=()):
    argv = [
        "--model_type", "main", "--name", "t_multi", "--checkpoints_dir",
        "/tmp/desr_multi_ckpt", "--batch_size", "2", "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--w_syn_norm", "0.1", "--lr", str(LR),
    ] + list(extra)
    return TrainOptions().parse(argv)


def _build(extra=()):
    from desr_tpu.models.main_model import MainModel

    m = MainModel(make_opt(extra))
    m.setup()
    return m


BATCHES = [fake_batch(h=64, w=64, seed=s) for s in range(3)]


@pytest.fixture(scope="module")
def pair():
    return _build(), _build(["--steps_per_call", "3"])


def test_scan_equivalent_to_sequential(pair):
    single, multi = pair
    assert not single.supports_multi_step()
    assert multi.supports_multi_step()

    # first group: length-1 scan from IDENTICAL state -> the last-step loss
    # must match the plain step to compile-noise tolerance
    single.set_input(BATCHES[0])
    single.optimize_parameters(1)
    multi.optimize_parameters_multi(BATCHES[:1], 1)
    assert float(single.metrics["G"]) == pytest.approx(
        float(multi.metrics["G"]), rel=1e-4)
    np.testing.assert_array_equal(np.asarray(single.step_rng()),
                                  np.asarray(multi.step_rng()))

    # remaining two batches: one length-2 scan vs two sequential steps
    for it, b in enumerate(BATCHES[1:]):
        single.set_input(b)
        single.optimize_parameters(it + 2)
    multi.optimize_parameters_multi(BATCHES[1:], 3)

    np.testing.assert_array_equal(np.asarray(single.step_rng()),
                                  np.asarray(multi.step_rng()))
    budget = 2.5 * LR * len(BATCHES)  # Adam random-walk bound (|update| <= ~lr)
    for net in single.params:
        for k in single.params[net]:
            a = np.asarray(single.params[net][k], np.float32)
            b_ = np.asarray(multi.params[net][k], np.float32)
            assert np.max(np.abs(a - b_)) < budget, f"{net}.{k}"
    assert np.isfinite(float(multi.metrics["G"]))


# ---------------------------------------------------------------------------
# --fused_iter: the translation stage's whole (2 G + 1 D) iteration as one
# dispatch must reproduce the per-call rng stream and stay inside the Adam
# budget of the per-call trajectory.

def _build_translation(extra=()):
    from desr_tpu.models import translation_networks as TN
    from desr_tpu.models.translation_model import TranslationModel

    argv = [
        "--model_type", "translation", "--name", "t_fused_iter",
        "--checkpoints_dir", "/tmp/desr_fi_ckpt",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--ndf", "16", "--num_iter_gen", "2", "--num_iter_dis", "1",
        "--lr", str(LR),
    ] + list(extra)
    m = TranslationModel(TrainOptions().parse(argv))
    gen_opt = TN.default_translator_opt(ngf_img=8, ngf_depth=8, n_blocks=2)
    m.nets["G_A"] = TN.define_Gen(gen_opt, input_type="img_depth")
    m.nets["G_B"] = TN.define_Gen(gen_opt, input_type="img_depth")
    m.setup()
    return m


def test_fused_iter_matches_sequential():
    from tests.test_model_translation import fake_batch as tr_batch

    plain = _build_translation()
    fused = _build_translation(["--fused_iter"])
    assert plain._iter_step is None and fused._iter_step is not None

    n_calls = 2
    for it in range(n_calls):
        b = tr_batch(seed=it)
        plain.set_input(b)
        plain.optimize_parameters(it + 1)
        fused.set_input(b)
        fused.optimize_parameters(it + 1)

    np.testing.assert_array_equal(np.asarray(plain.step_rng()),
                                  np.asarray(fused.step_rng()))
    budget = 2.5 * LR * n_calls * 2  # num_iter_gen=2 G updates per call
    for net in plain.params:
        for k in plain.params[net]:
            a = np.asarray(plain.params[net][k], np.float32)
            b_ = np.asarray(fused.params[net][k], np.float32)
            assert np.max(np.abs(a - b_)) < budget, f"{net}.{k}"
    assert set(plain.metrics) == set(fused.metrics)
    for k in plain.metrics:
        assert np.isfinite(float(fused.metrics[k])), k
