import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.options.train_options import TrainOptions


def make_opt(extra=()):
    argv = [
        "--model_type", "main", "--name", "t_main", "--checkpoints_dir", "/tmp/desr_main_ckpt",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss", "--use_smooth_loss",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--crop_size_h", "128", "--crop_size_w", "128",
        "--w_syn_norm", "0.1",
    ] + list(extra)
    return TrainOptions().parse(argv)


def fake_batch(b=2, h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    depth_a = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.3] = -1.0
    K = np.tile(np.array([[[577.0, 0, 320], [0, 577, 240], [0, 0, 1]]], np.float32), (b, 1, 1))
    crop = np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1))
    return {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a, "B_d": depth_b,
        "K_A": K, "K_B": K.copy(), "crop_A": crop, "crop_B": crop.copy(),
        "A_paths": ["a.png"] * b, "B_paths": ["b.png"] * b,
    }


@pytest.fixture(scope="module")
def model():
    from desr_tpu.models.main_model import MainModel

    m = MainModel(make_opt())
    m.setup()
    return m


def test_main_train_step(model):
    model.set_input(fake_batch())
    losses = []
    for it in range(4):
        model.optimize_parameters(it + 1)
        losses.append(float(model.metrics["G"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # all declared loss names are reported
    for name in model.loss_names:
        assert name in model.metrics, name


def test_main_frozen_nets_unchanged(model):
    frozen = {}
    for net in ["G_A_d", "I2D_features", "Image2Depth"]:
        frozen[net] = {k: np.asarray(v).copy() for k, v in model.params[net].items()}
    model.set_input(fake_batch(seed=5))
    model.optimize_parameters(10)
    for net, before in frozen.items():
        for k, v in model.params[net].items():
            np.testing.assert_array_equal(np.asarray(v), before[k], err_msg=f"{net}.{k}")


def test_batched_branches_match_sequential(model):
    """--no_batched_branches A/B: one batch-2B pass == two per-branch passes.

    Per-sample layers only (InstanceNorm, no dropout), so the fused real/syn
    batch must reproduce the sequential outputs to fp32 compile noise."""
    import jax

    from desr_tpu.models.main_model import MainModel

    seq = MainModel(make_opt(["--no_batched_branches"]))
    seq.setup()
    # identical weights (the shared fixture was trained by earlier tests),
    # identical batch, eval mode (no holes rng)
    seq.params = {n: dict(p) for n, p in model.params.items()}
    batch = fake_batch(seed=7)
    model.set_input(batch)
    model.calculate(stage="test")
    out_b = {k: np.asarray(v) for k, v in model.visuals.items()}
    m_b = {k: float(v) for k, v in model.metrics.items()}
    seq.set_input(batch)
    seq.calculate(stage="test")
    out_s = {k: np.asarray(v) for k, v in seq.visuals.items()}
    for k in out_s:
        np.testing.assert_allclose(out_b[k], out_s[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    for k, v in seq.metrics.items():
        assert m_b[k] == pytest.approx(float(v), rel=1e-3, abs=1e-6), k


def test_main_eval_and_dump(model, tmp_path):
    model.opt.save_all = True
    model.opt.save_image_folder = str(tmp_path) + "/"
    model.set_input(fake_batch(seed=2))
    model.calculate(stage="test")
    assert np.isfinite(float(model.metrics["G"]))
    import glob

    files = glob.glob(str(tmp_path) + "/*.png")
    assert len(files) == 1  # both samples share stem "b"
    import imageio

    img = imageio.imread(files[0])
    assert img.dtype == np.uint16
    assert img.shape == (128 - 32, 128)  # [:, 16:-16, :] row crop


def test_main_requires_use_image_for_trans():
    from desr_tpu.models.main_model import MainModel

    argv_opt = make_opt()
    argv_opt.use_image_for_trans = False
    with pytest.raises(NotImplementedError):
        MainModel(argv_opt)


def test_main_rejects_use_rec_as_real_input():
    """QUIRKS #31: the reference main stage crashes on --use_rec_as_real_input
    (it calls self.netG_B_d without ever defining it, main_model.py:236-239);
    we gate it with a readable error instead of silently ignoring the flag."""
    from desr_tpu.models.main_model import MainModel

    argv_opt = make_opt()
    argv_opt.use_rec_as_real_input = True
    with pytest.raises(NotImplementedError, match="use_rec_as_real_input"):
        MainModel(argv_opt)
