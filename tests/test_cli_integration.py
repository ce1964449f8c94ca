"""End-to-end CLI integration: main.py train loop over fixture data."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _import_repo_main():
    """Import THIS repo's main.py by path — a bare `import main` can resolve
    to the reference's main.py if an oracle test put /root/reference on
    sys.path earlier in the process."""
    if "main" in sys.modules and getattr(sys.modules["main"], "__file__", "") == \
            os.path.join(REPO_ROOT, "main.py"):
        return sys.modules["main"]
    spec = importlib.util.spec_from_file_location("main", os.path.join(REPO_ROOT, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["main"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_fixtures(root, n=4, hw=(160, 200)):
    import imageio

    rng = np.random.default_rng(0)
    dirs = {}
    for name in ["A_depth", "A_img", "B_depth", "B_img"]:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        dirs[name] = d
    intr_root = os.path.join(root, "intr")
    for i in range(n):
        stem = f"scene{i:04d}_00_{i}"
        depth = (rng.uniform(0, 6000, hw)).astype(np.uint16)
        img = (rng.uniform(0, 255, (*hw, 3))).astype(np.uint8)
        imageio.imwrite(os.path.join(dirs["A_depth"], stem + ".png"), depth)
        imageio.imwrite(os.path.join(dirs["B_depth"], stem + ".png"), depth)
        imageio.imwrite(os.path.join(dirs["A_img"], stem + ".png"), img)
        imageio.imwrite(os.path.join(dirs["B_img"], stem + ".png"), img)
        d = os.path.join(intr_root, stem[:12], "intrinsic")
        os.makedirs(d, exist_ok=True)
        np.savetxt(os.path.join(d, "intrinsic_depth.txt"),
                   np.array([[577.0, 0, 100, 0], [0, 577, 80, 0], [0, 0, 1, 0], [0, 0, 0, 1]]))
    return dirs, intr_root


def test_main_cli_trains_main_model(tmp_path, monkeypatch, capsys):
    root = str(tmp_path)
    dirs, intr = _write_fixtures(root)
    argv = [
        "main.py",
        "--model_type", "main", "--do_train",
        "--image_and_depth", "--use_scannet",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--name", "cli_int", "--checkpoints_dir", os.path.join(root, "ckpt"),
        "--path_A", dirs["A_depth"], "--A_add_paths", dirs["A_img"],
        "--path_B", dirs["B_depth"], "--B_add_paths", dirs["B_img"],
        "--path_A_test", dirs["A_depth"], "--A_add_paths_test", dirs["A_img"],
        "--path_B_test", dirs["B_depth"], "--B_add_paths_test", dirs["B_img"],
        "--path_to_intr", intr,
        "--batch_size", "2", "--compute_dtype", "float32",
        "--n_epochs", "1", "--n_epochs_decay", "0",
        "--load_size_h", "160", "--load_size_w", "200",
        "--crop_size_h", "128", "--crop_size_w", "128",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--save_epoch_freq", "1", "--print_freq", "2",
        "--num_threads", "1",
        # --no_html disables the HTML gallery (and its extra eval forward);
        # with it on at display_freq 2 this run would write web/images PNGs
        "--display_freq", "2", "--no_html",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main_mod = _import_repo_main()

    main_mod.main()
    # per-epoch + latest checkpoints written, one per net
    ckpt_dir = os.path.join(root, "ckpt", "cli_int")
    assert not os.listdir(os.path.join(ckpt_dir, "web", "images"))
    for net in ["G_A_d", "I2D_features", "Image2Depth", "Task", "Depth_f"]:
        assert os.path.exists(os.path.join(ckpt_dir, f"latest_net_{net}.pth")), net
        assert os.path.exists(os.path.join(ckpt_dir, f"1_net_{net}.pth")), net
    # loss log written
    assert os.path.exists(os.path.join(ckpt_dir, "loss_log.txt"))
    # options snapshot (reference contract base_options.py:109-115)
    assert os.path.exists(os.path.join(ckpt_dir, "train_opt.txt"))


def test_main_cli_steps_per_call(tmp_path, monkeypatch, capsys):
    """--steps_per_call: the grouped scan path drives a real CLI epoch.

    3 batches with steps_per_call=2 exercises BOTH the full-group dispatch and
    the epoch-tail partial group (main.py group flush)."""
    root = str(tmp_path)
    dirs, intr = _write_fixtures(root, n=6)
    argv = [
        "main.py",
        "--model_type", "main", "--do_train",
        "--image_and_depth", "--use_scannet",
        "--use_image_for_trans", "--use_masked",
        "--name", "cli_spc", "--checkpoints_dir", os.path.join(root, "ckpt"),
        "--path_A", dirs["A_depth"], "--A_add_paths", dirs["A_img"],
        "--path_B", dirs["B_depth"], "--B_add_paths", dirs["B_img"],
        "--path_to_intr", intr,
        "--batch_size", "2", "--compute_dtype", "float32",
        "--steps_per_call", "2",
        "--n_epochs", "1", "--n_epochs_decay", "0",
        "--load_size_h", "160", "--load_size_w", "200",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--save_epoch_freq", "1", "--print_freq", "2",
        "--num_threads", "0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main_mod = _import_repo_main()

    main_mod.main()
    ckpt_dir = os.path.join(root, "ckpt", "cli_spc")
    for net in ["Task"]:
        assert os.path.exists(os.path.join(ckpt_dir, f"1_net_{net}.pth")), net
    out = capsys.readouterr().out
    assert "End of epoch 1" in out
