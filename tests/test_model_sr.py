import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions


def make_opt():
    argv = [
        "--model_type", "main", "--SR", "--name", "t_sr",
        "--checkpoints_dir", "/tmp/desr_sr_ckpt",
        "--batch_size", "1", "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--crop_size_h", "128", "--crop_size_w", "128",
        "--w_syn_norm", "0.1",
    ]
    return TrainOptions().parse(argv)


def fake_batch(b=1, ch=128, cw=128, seed=0):
    h, w = ch * 2, cw * 2
    rng = np.random.default_rng(seed)
    depth_a = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.3] = -1.0
    K = np.tile(np.array([[[577.0, 0, 320], [0, 577, 240], [0, 0, 1]]], np.float32), (b, 1, 1))
    crop_a = np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1))
    crop_b = np.tile(np.array([[0, ch, 0, cw]], np.float32), (b, 1))
    return {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a, "B_d": depth_b,
        "K_A": K, "K_B": K.copy(), "crop_A": crop_a, "crop_B": crop_b,
        "A_paths": ["a.png"] * b, "B_paths": ["b.png"] * b,
    }


@pytest.fixture(scope="module")
def model():
    from desr_tpu.models.main_sr_model import MainSRModel

    m = MainSRModel(make_opt())
    m.setup()
    return m


def test_sr_train_step(model):
    model.set_input(fake_batch())
    losses = []
    for it in range(3):
        model.optimize_parameters(it + 1)
        losses.append(float(model.metrics["G"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sr_eval_hr_dump(model, tmp_path):
    model.opt.save_all = True
    model.opt.save_image_folder = str(tmp_path) + "/"
    model.set_input(fake_batch(seed=1))
    model.calculate(stage="test")
    import glob
    import imageio

    files = glob.glob(str(tmp_path) + "/*.png")
    assert len(files) == 1
    img = imageio.imread(files[0])
    assert img.dtype == np.uint16
    # HR dump (2x crop) minus the [32:-32] row crop
    assert img.shape == (256 - 64, 256)


def test_sr_use_d_rejected():
    from desr_tpu.models.main_sr_model import MainSRModel

    opt = make_opt()
    opt.use_D = True
    with pytest.raises(NotImplementedError):
        MainSRModel(opt)


def test_sr_use_rec_train_step_threads_frozen_gbd():
    """--use_rec_as_real_input (QUIRKS #31): the frozen, checkpoint-excluded
    G_B_d must still be visible INSIDE the jitted train step (regression: the
    loss closure used to rebuild params from model_names only -> KeyError at
    the first optimize_parameters through the real CLI). G_B_d stays frozen;
    the trainable nets still move."""
    from desr_tpu.models.main_sr_model import MainSRModel

    argv = [
        "--model_type", "main", "--SR", "--name", "t_sr_rec",
        "--checkpoints_dir", "/tmp/desr_sr_rec_ckpt",
        "--batch_size", "1", "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--use_rec_as_real_input",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--w_syn_norm", "0.1",
    ]
    opt = TrainOptions().parse(argv)
    model = MainSRModel(opt)
    model.init_params(seed=0)
    model._post_setup()
    model.set_input(fake_batch(ch=64, cw=64))

    gbd_before = {k: np.asarray(v) for k, v in model.params["G_B_d"].items()}
    task_key = next(iter(model.params["Task"]))
    task_before = np.asarray(model.params["Task"][task_key])

    model.optimize_parameters(1)
    assert np.isfinite(float(model.metrics["G"]))
    for k, v in gbd_before.items():  # frozen: out of the optimizer entirely
        np.testing.assert_array_equal(np.asarray(model.params["G_B_d"][k]), v)
    assert not np.array_equal(np.asarray(model.params["Task"][task_key]), task_before)
