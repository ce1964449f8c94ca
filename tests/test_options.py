"""Options system: dynamic per-model flag injection (reference base_options.py:63-90)."""

from desr_tpu.options.train_options import TrainOptions
from desr_tpu.options.test_options import TestOptions


def _parse(argv):
    return TrainOptions().parse(argv + ["--checkpoints_dir", "/tmp/desr_opt_test",
                                        "--name", "t_opt"])


def test_translation_injects_gan_flags():
    opt = _parse(["--model_type", "translation"])
    # as-shipped: max_distance keeps the TrainOptions default (10); README
    # commands pass 5100 explicitly (see TranslationModel option note)
    assert opt.max_distance == 10
    assert opt.num_iter_gen == 3
    assert opt.no_idt_A is True
    assert opt.inp_B == "img_depth"
    opt2 = _parse(["--model_type", "translation", "--max_distance", "5100"])
    assert opt2.max_distance == 5100


def test_main_injects_lambdas():
    opt = _parse(["--model_type", "main", "--use_image_for_trans"])
    assert opt.lambda_A == 10.0
    assert opt.no_dropout is True  # set_defaults from modify_commandline_options


def test_i2d_defaults_match_reference():
    opt = _parse(["--model_type", "I2D"])
    assert opt.Imagef_outf == 16
    assert opt.Task_type == "unet_128"
    assert opt.w_real_l1 == 0.1
    assert opt.lr == 2e-4
    assert opt.isTrain is True


def test_suffix_templating():
    opt = _parse(["--model_type", "I2D", "--suffix", "{model_type}_bs{batch_size}"])
    assert opt.name == "t_opt_I2D_bs1"


def test_test_options_phase():
    opt = TestOptions().parse([
        "--model_type", "I2D", "--checkpoints_dir", "/tmp/desr_opt_test",
        "--name", "t_opt2"])
    assert opt.phase == "test"
    assert opt.isTrain is False
    assert opt.results_dir == "./results/"


def test_opt_snapshot_written(tmp_path):
    opt = TrainOptions().parse(["--model_type", "I2D",
                                "--checkpoints_dir", str(tmp_path), "--name", "snap"])
    import os

    assert os.path.exists(tmp_path / "snap" / "train_opt.txt")
    content = open(tmp_path / "snap" / "train_opt.txt").read()
    assert "model_type" in content
