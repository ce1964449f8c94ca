"""Options system: dynamic per-model flag injection (reference base_options.py:63-90)."""

from desr_tpu.options.train_options import TrainOptions
from desr_tpu.options.test_options import TestOptions


def _parse(argv):
    return TrainOptions().parse(argv + ["--checkpoints_dir", "/tmp/desr_opt_test",
                                        "--name", "t_opt"])


def test_compile_cache_flag_applies(tmp_path):
    """--compile_cache_dir points JAX's persistent compilation cache there
    (and '' disables the override); applied at parse so every entry point
    inherits it. On the XLA:CPU backend (this suite) the cache is namespaced
    per host-CPU feature set — XLA:CPU's own cache key omits compile-machine
    features, so a cross-host replay of AOT code can SIGILL (QUIRKS-adjacent
    hazard observed in the round-3 dryrun artifact)."""
    import jax

    from desr_tpu.options.base_options import BaseOptions

    cache = str(tmp_path / "xla_cache")
    _parse(["--model_type", "I2D", "--compile_cache_dir", cache])
    # conftest forces the CPU backend, so the effective dir is namespaced
    tag = BaseOptions._host_cpu_tag()
    expected = f"{cache}/cpu-{tag}"
    assert jax.config.jax_compilation_cache_dir == expected
    import os

    assert os.path.isdir(expected)
    # the tag is stable per host and short enough for a path component
    assert tag == BaseOptions._host_cpu_tag() and len(tag) == 12
    # empty string: parse succeeds and leaves the config untouched
    _parse(["--model_type", "I2D", "--compile_cache_dir", ""])
    assert jax.config.jax_compilation_cache_dir == expected


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


# The five exact training commands from the reference README (README.md:28,54,
# 70,75,86), with only path/name placeholders filled and --gpu_ids -1 (no CUDA
# here). A user of the reference must be able to paste these verbatim.
_REFERENCE_README_COMMANDS = {
    "I2D": "--name w --gpu_ids -1 --display_freq 20 --print_freq 20"
           " --n_epochs 150 --n_epochs_decay 150 --image_and_depth"
           " --continue_train --batch_size 12 --custom_pathes --w_real_l1 1"
           " --w_syn_l1 1 --lr 0.0002 --Imagef_outf 128 --Imagef_basef 32"
           " --use_scannet --model I2D --norm_loss --do_train --model_type I2D",
    "translation": "--gpu_ids -1 --display_freq 20 --print_freq 20"
           " --n_epochs 20 --n_epochs_decay 60 --custom_pathes --use_scannet"
           " --lr 0.0002 --model translation_block --save_all --batch_size 6"
           " --name translation --netD n_layers --crop_size_h 256"
           " --crop_size_w 256 --do_train --dataroot d --max_distance 5100"
           " --init_type xavier --model_type translation",
    "main": "--gpu_ids -1 --display_freq 20 --print_freq 20 --n_epochs 20"
           " --n_epochs_decay 60 --image_and_depth --continue_train"
           " --custom_pathes --use_image_for_trans --w_syn_l1 15"
           " --w_real_l1_d 40 --norm_loss --w_syn_norm 2 --use_smooth_loss"
           " --w_smooth 1 --w_syn_holes 800 --w_real_holes 1600 --use_masked"
           " --use_scannet --lr 0.0001 --model main_network_best --save_all"
           " --batch_size 6 --name n --do_train --model_type main --use_wandb",
    "main_noaug": "--gpu_ids -1 --display_freq 20 --print_freq 20"
           " --n_epochs 10 --n_epochs_decay 20 --image_and_depth"
           " --continue_train --custom_pathes --use_image_for_trans"
           " --w_syn_l1 15 --w_real_l1_d 90 --norm_loss --w_syn_norm 2"
           " --use_smooth_loss --w_smooth 1 --w_syn_holes 1600"
           " --w_real_holes 1600 --use_masked --use_scannet --lr 0.00002"
           " --model main_network_best --save_all --batch_size 3 --name n"
           " --model_type main --use_wandb --no_aug",
    "sr": "--gpu_ids -1 --display_freq 20 --print_freq 20 --n_epochs 5"
           " --n_epochs_decay 15 --image_and_depth --continue_train"
           " --custom_pathes --use_image_for_trans --w_syn_l1 15"
           " --w_real_l1_d 90 --norm_loss --w_syn_norm 3 --use_smooth_loss"
           " --w_smooth 1 --w_syn_holes 1600 --w_real_holes 1600 --use_masked"
           " --use_scannet --lr 0.00002 --model main_network_best --save_all"
           " --batch_size 1 --name n --do_train --crop_size_h 512"
           " --crop_size_w 640 --use_wandb --model_type main --SR",
}


def test_reference_readme_commands_parse_verbatim(tmp_path):
    import shlex

    for key, cmd in _REFERENCE_README_COMMANDS.items():
        argv = shlex.split(cmd) + ["--checkpoints_dir", str(tmp_path)]
        opt = TrainOptions().parse(argv)
        assert opt.isTrain, key
    # spot-check the SR command resolved the flags that steer the model
    assert opt.SR and opt.crop_size_h == 512 and opt.w_syn_norm == 3.0
    assert opt.lr == 2e-5 and opt.use_masked and opt.no_aug is False
