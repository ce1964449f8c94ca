import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.options.train_options import TrainOptions


def make_opt(extra=()):
    argv = [
        "--model_type", "I2D", "--name", "t_i2d", "--checkpoints_dir", "/tmp/desr_test_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "2", "--compute_dtype", "float32", "--norm_loss",
    ] + list(extra)
    return TrainOptions().parse(argv)


def fake_batch(b=2, h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    depth_a = rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.8] = -1.0
    return {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a,
        "B_d": depth_b,
        "A_paths": ["a.png"] * b,
        "B_paths": ["b.png"] * b,
    }


@pytest.fixture(scope="module")
def model():
    from desr_tpu.models.i2d_model import I2DModel

    m = I2DModel(make_opt())
    m.setup()
    return m


def test_i2d_train_step_decreases_loss(model):
    batch = fake_batch()
    model.set_input(batch)
    losses = []
    for it in range(8):
        model.optimize_parameters((it + 1) * 2)
        losses.append(model.metrics["G"])
    assert np.isfinite([float(l) for l in losses]).all()
    assert float(losses[-1]) < float(losses[0]), "loss should decrease on a fixed batch"


def test_i2d_image_f_frozen_by_default(model):
    # as-shipped reference quirk: only Task is optimized (I2D_model.py:143)
    before = {k: np.asarray(v).copy() for k, v in model.params["Image_f"].items()}
    model.set_input(fake_batch(seed=3))
    model.optimize_parameters(100)
    for k, v in model.params["Image_f"].items():
        np.testing.assert_array_equal(np.asarray(v), before[k])


def test_i2d_eval_and_visuals(model):
    model.set_input(fake_batch(seed=1))
    model.calculate(stage="test")
    assert "task_syn" in model.metrics and np.isfinite(float(model.metrics["task_syn"]))
    vis = model.get_current_visuals()
    assert vis["pred_real_depth"].shape == (2, 128, 128, 1)
    assert vis["pred_real_depth"].min() >= -1.0 and vis["pred_real_depth"].max() <= 1.0


def _fresh(extra=(), seed_batch=7, h=64, w=64):
    from desr_tpu.models.i2d_model import I2DModel

    m = I2DModel(make_opt(extra))
    m.setup()
    m.set_input(fake_batch(h=h, w=w, seed=seed_batch))
    return m


def test_i2d_direction_btoa_swaps_domains():
    # reference I2D_model.py:152-159: --direction BtoA binds syn_* to B_* and
    # real_* to A_*; feeding the BtoA model must equal feeding the AtoB model
    # a hand-swapped batch.
    batch = fake_batch(h=64, w=64, seed=11)
    swapped = dict(batch, A_i=batch["B_i"], B_i=batch["A_i"],
                   A_d=batch["B_d"], B_d=batch["A_d"])
    m_btoa = _fresh(["--direction", "BtoA"])
    m_atob = _fresh()
    m_btoa.set_input(batch)
    m_atob.set_input(swapped)
    m_btoa.calculate(stage="test")
    m_atob.calculate(stage="test")
    for k in ("task_syn", "task_real"):
        assert float(m_btoa.metrics[k]) == float(m_atob.metrics[k])
    np.testing.assert_array_equal(
        np.asarray(m_btoa.visuals["pred_real_depth"]),
        np.asarray(m_atob.visuals["pred_real_depth"]))


def test_i2d_use_d_g_term_is_noop_for_task_only_optimizer():
    # reference backward_features (I2D_model.py:203-208): the adversarial
    # gradient lands in Image_f, which the as-shipped Task-only optimizer
    # (:143) never applies — so one G step with/without --use_D must produce
    # byte-identical Task params.
    m_plain = _fresh()
    m_d = _fresh(["--use_D"])
    m_plain.optimize_parameters(2)
    m_d.optimize_parameters(2)
    for k in m_plain.params["Task"]:
        np.testing.assert_array_equal(np.asarray(m_plain.params["Task"][k]),
                                      np.asarray(m_d.params["Task"][k]))


def test_i2d_use_d_adv_term_reaches_exactly_image_f():
    # with --i2d_train_features the unweighted loss_G_pred term changes the
    # Image_f update (it flows D -> features_real -> Image_f) but NOT the
    # Task update (Task is not upstream of features_real), mirroring the
    # reference's two accumulating .backward() calls (I2D_model.py:239-243).
    m_nod = _fresh(["--i2d_train_features"])
    m_d = _fresh(["--use_D", "--i2d_train_features"])
    m_nod.optimize_parameters(2)
    m_d.optimize_parameters(2)
    for k in m_nod.params["Task"]:
        np.testing.assert_array_equal(np.asarray(m_nod.params["Task"][k]),
                                      np.asarray(m_d.params["Task"][k]))
    diff = max(
        float(np.abs(np.asarray(m_nod.params["Image_f"][k])
                     - np.asarray(m_d.params["Image_f"][k])).max())
        for k in m_nod.params["Image_f"]
        if np.asarray(m_nod.params["Image_f"][k]).dtype.kind == "f")
    assert diff > 0.0, "adversarial term should alter the Image_f update"


def test_i2d_checkpoint_roundtrip(model, tmp_path):
    model.opt.checkpoints_dir = str(tmp_path)
    model.save_networks("latest")
    import os

    for name in ["Image_f", "Task"]:
        assert os.path.exists(tmp_path / "t_i2d" / f"latest_net_{name}.pth")
    task_before = {k: np.asarray(v).copy() for k, v in model.params["Task"].items()}
    model.init_params(seed=99)  # scramble
    model.load_networks("latest")
    for k, v in model.params["Task"].items():
        np.testing.assert_array_equal(np.asarray(v), task_before[k])
