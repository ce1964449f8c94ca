import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions


def make_opt():
    argv = [
        "--model_type", "translation", "--name", "t_tr",
        "--checkpoints_dir", "/tmp/desr_tr_ckpt",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--ndf", "16", "--num_iter_gen", "2", "--num_iter_dis", "1",
    ]
    return TrainOptions().parse(argv)


def fake_batch(b=2, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    da = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db[db < -0.3] = -1.0
    return {
        "A_depth": da, "A_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_depth": db, "B_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_name": ["a"] * b, "B_name": ["b"] * b,
    }


@pytest.fixture(scope="module")
def model():
    from desr_tpu.models.translation_model import TranslationModel

    opt = make_opt()
    from desr_tpu.models import translation_networks as TN

    m = TranslationModel(opt)
    # swap in small translators for test speed (before setup/init)
    gen_opt = TN.default_translator_opt(ngf_img=8, ngf_depth=8, n_blocks=2)
    m.nets["G_A"] = TN.define_Gen(gen_opt, input_type="img_depth")
    m.nets["G_B"] = TN.define_Gen(gen_opt, input_type="img_depth")
    m.setup()
    return m


def test_translation_alternating_steps(model):
    model.set_input(fake_batch())
    for it in range(2):
        model.optimize_parameters(it + 1)
    m = model.metrics
    for key in ["G_A", "G_B", "cycle_B", "cycle_n_B", "idt_B",
                "depth_range_A", "depth_range_B", "depth_dif_A", "depth_dif_B",
                "D_A_depth", "D_B_depth", "D_A_normal", "D_B_normal"]:
        assert key in m, key
        assert np.isfinite(float(m[key])), key


def test_translation_d_and_g_both_update(model):
    ga_before = {k: np.asarray(v).copy() for k, v in model.params["G_A"].items()}
    d_before = {k: np.asarray(v).copy() for k, v in model.params["D_A_depth"].items()}
    model.set_input(fake_batch(seed=3))
    model.optimize_parameters(5)
    assert any(not np.array_equal(np.asarray(model.params["G_A"][k]), ga_before[k])
               for k in ga_before)
    assert any(not np.array_equal(np.asarray(model.params["D_A_depth"][k]), d_before[k])
               for k in d_before)


def test_translation_weight_ramp(model):
    before = model.l_depth_A
    model.update_loss_weight(model.opt.l_max_iter + 1)
    assert model.l_depth_A == pytest.approx(before - model.l_depth_A_step)
    model.update_loss_weight(0)  # below threshold: no change
    assert model.l_depth_A == pytest.approx(before - model.l_depth_A_step)


def test_translation_eval(model):
    model.set_input(fake_batch(seed=4))
    model.calculate()
    assert np.isfinite(float(model.metrics["depth_dif_A"]))
    vis = model.get_current_visuals()
    # depth maps are planar (B, H, W) in the loss/visual tail
    assert vis["fake_depth_B"].shape == (2, 64, 64)
