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

    ds = SingleDataset(_opt(tmp_path / "trainA"))
    item = ds[0]
    assert item["A"].shape == (48, 48, 3)


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
