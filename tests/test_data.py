import os

import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions


def _write_fixtures(root, n=3, hw=(120, 160), with_intr=True):
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
        depth[:10, :10] = 0  # holes
        img = (rng.uniform(0, 255, (*hw, 3))).astype(np.uint8)
        imageio.imwrite(os.path.join(dirs["A_depth"], stem + ".png"), depth)
        imageio.imwrite(os.path.join(dirs["B_depth"], stem + ".png"), depth)
        imageio.imwrite(os.path.join(dirs["A_img"], stem + ".jpg"), img)
        imageio.imwrite(os.path.join(dirs["B_img"], stem + ".jpg"), img)
        if with_intr:
            d = os.path.join(intr_root, stem[:12], "intrinsic")
            os.makedirs(d, exist_ok=True)
            K = np.array([[577.0, 0, 320, 0], [0, 577, 240, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
            np.savetxt(os.path.join(d, "intrinsic_depth.txt"), K)
    return dirs, intr_root


def _opt(root, dirs, intr, model_type="main", extra=()):
    argv = [
        "--model_type", model_type, "--image_and_depth", "--use_scannet",
        "--path_A", dirs["A_depth"], "--A_add_paths", dirs["A_img"],
        "--path_B", dirs["B_depth"], "--B_add_paths", dirs["B_img"],
        "--path_A_test", dirs["A_depth"], "--A_add_paths_test", dirs["A_img"],
        "--path_B_test", dirs["B_depth"], "--B_add_paths_test", dirs["B_img"],
        "--path_to_intr", intr, "--checkpoints_dir", root,
        "--name", "t_data", "--crop_size_h", "96", "--crop_size_w", "128",
        "--load_size_h", "120", "--load_size_w", "160",
    ] + list(extra)
    return TrainOptions().parse(argv)


def test_i2d_dataset_shapes(tmp_path):
    dirs, intr = _write_fixtures(str(tmp_path), hw=(480, 640))
    opt = _opt(str(tmp_path), dirs, intr, "I2D")
    from desr_tpu.data.i2d_dataset import I2DDataset

    ds = I2DDataset(opt, stage="train")
    item = ds[0]
    assert item["A_i"].shape == (384, 512, 3)
    assert item["A_d"].shape == (384, 512, 1)
    assert -1 <= item["A_d"].min() and item["A_d"].max() <= 1
    ds_test = I2DDataset(opt, stage="test")
    item = ds_test[0]
    assert item["B_i"].shape == (512, 640, 3)


def test_main_dataset_and_loader(tmp_path):
    dirs, intr = _write_fixtures(str(tmp_path))
    opt = _opt(str(tmp_path), dirs, intr, "main")
    from desr_tpu.data.main_dataset import MainDataset
    from desr_tpu.data.loader import create_dataset

    ds = MainDataset(opt, stage="train")
    item = ds[0]
    assert item["A_d"].shape == (96, 128, 1)
    assert item["K_B"].shape == (3, 3)
    assert tuple(item["crop_A"]) == (0, 96, 0, 128)

    opt.batch_size = 2
    loader = create_dataset(opt, MainDataset, stage="train")
    batch = next(iter(loader))
    assert batch["A_d"].shape == (2, 96, 128, 1)
    assert batch["K_A"].shape == (2, 3, 3)
    assert len(batch["A_paths"]) == 2


def test_sr_dataset_hr_shapes(tmp_path):
    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt = _opt(str(tmp_path), dirs, intr, "main", extra=["--SR"])
    from desr_tpu.data.sr_dataset import NaiveSRDataset

    ds = NaiveSRDataset(opt, stage="train")
    item = ds[0]
    # HR crops: 2x crop size
    assert item["A_d"].shape == (192, 256, 1)
    assert item["A_i"].shape == (192, 256, 3)
    # K_A rescaled for 2x
    assert item["K_A"][0, 0] == pytest.approx(577.0 * 2)
    assert item["K_A"][0, 2] == pytest.approx(320.0 * 2)
    # crop boxes carry offsets: h + 2*crop_h
    ca = item["crop_A"]
    assert ca[1] - ca[0] == 192 and ca[3] - ca[2] == 256


def test_translation_dataset(tmp_path):
    import imageio

    rng = np.random.default_rng(1)
    for phase in ["train", "test"]:
        for dom in ["A", "B"]:
            for kind in ["img", "depth"]:
                os.makedirs(tmp_path / f"{phase}{dom}" / kind, exist_ok=True)
    for dom, n in [("A", 3), ("B", 4)]:
        for i in range(n):
            img = rng.uniform(0, 255, (96, 96, 3)).astype(np.uint8)
            depth = rng.uniform(0, 6000, (96, 96)).astype(np.uint16)
            for phase in ["train", "test"]:
                imageio.imwrite(tmp_path / f"{phase}{dom}" / "img" / f"f{i}.png", img)
                imageio.imwrite(tmp_path / f"{phase}{dom}" / "depth" / f"f{i}.png", depth)

    argv = ["--model_type", "translation", "--dataroot", str(tmp_path),
            "--checkpoints_dir", str(tmp_path), "--name", "t_tr",
            "--crop_size_h", "64", "--crop_size_w", "64"]
    opt = TrainOptions().parse(argv)
    from desr_tpu.data.translation_dataset import TranslationDataset

    ds = TranslationDataset(opt, stage="train")
    assert len(ds) == 4
    item = ds[0]
    assert item["A_depth"].shape == (64, 64, 1)
    assert item["B_img"].shape == (64, 64, 3)
    assert isinstance(item["A_name"], str)
    # unequal sizes -> queue pairing still yields valid items for all indices
    for i in range(len(ds)):
        ds[i]
