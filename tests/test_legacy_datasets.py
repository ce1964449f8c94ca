import os

import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions


def _fixture(tmp_path, n=3, hw=(64, 80)):
    import imageio

    rng = np.random.default_rng(0)
    for phase in ["trainA", "trainB", "train"]:
        os.makedirs(tmp_path / phase, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3)).astype(np.uint8)
        imageio.imwrite(tmp_path / "trainA" / f"a{i}.png", img)
        imageio.imwrite(tmp_path / "trainB" / f"b{i}.png", img)
        ab = np.concatenate([img, img], axis=1)
        imageio.imwrite(tmp_path / "train" / f"ab{i}.png", ab)


def _opt(root, extra=()):
    return TrainOptions().parse([
        "--model_type", "I2D", "--dataroot", str(root),
        "--checkpoints_dir", str(root), "--name", "t_leg",
        "--load_size", "48", "--crop_size", "32",
    ] + list(extra))


def test_registry_resolves_all_modes():
    from desr_tpu.data.legacy_datasets import find_dataset_using_name

    for mode in ["unaligned", "aligned", "single", "template", "translation", "my_main"]:
        assert find_dataset_using_name(mode) is not None
    with pytest.raises(NotImplementedError):
        find_dataset_using_name("nope")


def test_unaligned_dataset(tmp_path):
    _fixture(tmp_path)
    from desr_tpu.data.legacy_datasets import UnalignedDataset

    ds = UnalignedDataset(_opt(tmp_path))
    assert len(ds) == 3
    item = ds[0]
    assert item["A"].shape == (32, 32, 3)
    assert item["B"].shape == (32, 32, 3)
    assert -1 <= item["A"].min() and item["A"].max() <= 1


def test_aligned_dataset(tmp_path):
    _fixture(tmp_path)
    from desr_tpu.data.legacy_datasets import AlignedDataset

    ds = AlignedDataset(_opt(tmp_path))
    item = ds[0]
    assert item["A"].shape == (32, 32, 3)
    assert item["B"].shape == (32, 32, 3)


def test_single_dataset(tmp_path):
    _fixture(tmp_path)
    from desr_tpu.data.legacy_datasets import SingleDataset

    # single_dataset.py uses the full get_transform: the default
    # resize_and_crop preprocess crops to crop_size (not just resize)
    ds = SingleDataset(_opt(tmp_path / "trainA"))
    item = ds[0]
    assert item["A"].shape == (32, 32, 3)


def test_preprocess_modes(tmp_path):
    _fixture(tmp_path, hw=(62, 90))
    from desr_tpu.data.legacy_datasets import SingleDataset

    # scale_width: W -> load_size, H scales but stays >= crop_size
    # (reference data/base_dataset.py:130-136)
    ds = SingleDataset(_opt(tmp_path / "trainA", ["--preprocess", "scale_width"]))
    h, w = ds[0]["A"].shape[:2]
    assert w == 48 and h == max(int(48 * 62 / 90), 32)
    # scale_width_and_crop: then random-crops to crop_size
    ds = SingleDataset(_opt(tmp_path / "trainA",
                            ["--preprocess", "scale_width_and_crop"]))
    assert ds[0]["A"].shape[:2] == (32, 32)
    # crop: no resize, random crop straight off the 62x90 original
    ds = SingleDataset(_opt(tmp_path / "trainA", ["--preprocess", "crop"]))
    assert ds[0]["A"].shape[:2] == (32, 32)
    # none: round H/W to multiples of 4 (__make_power_2 base 4)
    ds = SingleDataset(_opt(tmp_path / "trainA",
                            ["--preprocess", "none", "--no_flip"]))
    # Python-3 round() is banker's: 62/4=15.5 -> 16 -> 64, 90/4=22.5 -> 22 -> 88
    assert ds[0]["A"].shape[:2] == (64, 88)


def test_unaligned_custom_pathes_and_take(tmp_path):
    _fixture(tmp_path, n=6)
    from desr_tpu.data.legacy_datasets import UnalignedDataset

    # --custom_pathes reroots A/B at --path_A/--path_B
    # (reference unaligned_dataset.py:36-38)
    ds = UnalignedDataset(_opt(tmp_path, [
        "--custom_pathes", "--path_A", str(tmp_path / "trainB"),
        "--path_B", str(tmp_path / "trainA")]))
    assert os.path.basename(ds.A_paths[0]).startswith("b")
    # --take N: seed-23 joint subsample, A drawn before B, high bound len-1
    # EXCLUSIVE (unaligned_dataset.py:46-53)
    ds = UnalignedDataset(_opt(tmp_path, ["--take", "4"]))
    assert len(ds.A_paths) == len(ds.B_paths) == 4
    rs = np.random.RandomState(23)
    exp_A = rs.randint(0, 5, 4)
    exp_B = rs.randint(0, 5, 4)
    all_A = sorted(str(tmp_path / "trainA" / f"a{i}.png") for i in range(6))
    assert list(ds.A_paths) == [all_A[i] for i in exp_A]
    all_B = sorted(str(tmp_path / "trainB" / f"b{i}.png") for i in range(6))
    assert list(ds.B_paths) == [all_B[i] for i in exp_B]


def test_unaligned_uint16(tmp_path):
    import imageio

    os.makedirs(tmp_path / "trainA"); os.makedirs(tmp_path / "trainB")
    rng = np.random.default_rng(1)
    d = rng.integers(0, 12000, (64, 80)).astype(np.uint16)
    imageio.imwrite(tmp_path / "trainA" / "d.png", d)
    imageio.imwrite(tmp_path / "trainB" / "d.png", d)
    from desr_tpu.data.legacy_datasets import UnalignedDataset

    # raw values -> geometry -> clamp 8000 -> /8000 -> [-1, 1], 1 channel
    # (reference unaligned_dataset.py:96-116)
    ds = UnalignedDataset(_opt(tmp_path, ["--uint16", "--preprocess", "none",
                                          "--no_flip", "--serial_batches"]))
    a = ds[0]["A"]
    assert a.shape == (64, 80, 1)
    exp = ((np.minimum(d.astype(np.float32), 8000) / 8000) - 0.5) / 0.5
    np.testing.assert_allclose(a[..., 0], exp, atol=1e-6)


def test_unaligned_image_and_depth(tmp_path):
    import imageio

    rng = np.random.default_rng(2)
    for sub in ["trainA", "trainB", "addA", "addB"]:
        os.makedirs(tmp_path / sub)
    for ph in ["trainA", "trainB"]:
        imageio.imwrite(tmp_path / ph / "f.png",
                        rng.integers(0, 9000, (64, 80)).astype(np.uint16))
    for ph in ["addA", "addB"]:
        imageio.imwrite(tmp_path / ph / "f.png",
                        rng.integers(0, 255, (64, 80, 3)).astype(np.uint8))
    from desr_tpu.data.legacy_datasets import UnalignedDataset

    # 4-channel [img | depth] at 256x256 (reference unaligned_dataset.py:117-158)
    ds = UnalignedDataset(_opt(tmp_path, [
        "--image_and_depth", "--serial_batches",
        "--A_add_paths", str(tmp_path / "addA"),
        "--B_add_paths", str(tmp_path / "addB")]))
    item = ds[0]
    assert item["A"].shape == (256, 256, 4)
    assert item["B"].shape == (256, 256, 4)
    assert item["A"][..., 3].min() >= -1 and item["A"][..., 3].max() <= 1


def test_template_dataset(tmp_path):
    _fixture(tmp_path)
    from desr_tpu.data.legacy_datasets import TemplateDataset

    ds = TemplateDataset(_opt(tmp_path / "trainA"))
    item = ds[0]
    assert item["data_A"].shape == (48, 48, 3)
    assert np.array_equal(item["data_A"], item["data_B"])
    assert len(ds) == 3
    # the modify_commandline_options hook injects its example flag
    import argparse

    parser = TemplateDataset.modify_commandline_options(
        argparse.ArgumentParser(), True)
    assert parser.parse_args([]).new_dataset_option == 1.0
