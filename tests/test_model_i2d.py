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
