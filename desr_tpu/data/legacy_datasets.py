"""Legacy CycleGAN-lineage datasets (reference: data/unaligned_dataset.py,
aligned_dataset.py, single_dataset.py, template_dataset.py).

Kept "only as far as the dataset_mode registry shape" (SURVEY §2.19): the
training pipeline always replaces these with the custom RGB-D datasets, but
``--dataset_mode unaligned|aligned|single`` remains resolvable and functional
for plain image folders.

All return HWC float32 images in [-1, 1] under keys A/B (+ paths), matching
the upstream CycleGAN batch schema.
"""

from __future__ import annotations

import os

import numpy as np

from desr_tpu.data import transforms as T
from desr_tpu.data.base_dataset import load_image
from desr_tpu.data.image_folder import make_dataset


def _norm_img(img):
    img = np.asarray(img).astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return (img[..., :3] - 127.5) / 127.5


def _load_crop(rng, path, load_size, crop_size, flip=True):
    img = _norm_img(load_image(path))
    img = T.resize(img, load_size, load_size, 2)
    y, x = T.random_crop_params(rng, load_size, load_size, crop_size, crop_size)
    img = T.crop(img, y, x, crop_size, crop_size)
    if flip and rng.uniform() < 0.5:
        img = T.hflip(img)
    return np.clip(img, -1, 1).astype(np.float32)


class UnalignedDataset:
    """Two unpaired folders <dataroot>/<phase>{A,B} (unaligned_dataset.py)."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def __init__(self, opt, stage="train"):
        self.opt = opt
        phase = getattr(opt, "phase", "train") if stage != "test" else "test"
        self.A_paths = sorted(make_dataset(os.path.join(opt.dataroot, phase + "A"),
                                           opt.max_dataset_size))
        self.B_paths = sorted(make_dataset(os.path.join(opt.dataroot, phase + "B"),
                                           opt.max_dataset_size))
        self.A_size, self.B_size = len(self.A_paths), len(self.B_paths)
        self.serial = getattr(opt, "serial_batches", False)
        self.seed = getattr(opt, "seed", 0)

    def __getitem__(self, index):
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, index]))
        A_path = self.A_paths[index % self.A_size]
        index_B = index % self.B_size if self.serial else int(rng.integers(0, self.B_size))
        B_path = self.B_paths[index_B]
        A = _load_crop(rng, A_path, self.opt.load_size, self.opt.crop_size,
                       not self.opt.no_flip)
        B = _load_crop(rng, B_path, self.opt.load_size, self.opt.crop_size,
                       not self.opt.no_flip)
        return {"A": A, "B": B, "A_paths": str(A_path), "B_paths": str(B_path)}

    def __len__(self):
        return max(self.A_size, self.B_size)


class AlignedDataset:
    """Side-by-side AB images under <dataroot>/<phase> (aligned_dataset.py)."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def __init__(self, opt, stage="train"):
        self.opt = opt
        phase = getattr(opt, "phase", "train") if stage != "test" else "test"
        self.AB_paths = sorted(make_dataset(os.path.join(opt.dataroot, phase),
                                            opt.max_dataset_size))

    def __getitem__(self, index):
        rng = np.random.default_rng(np.random.SeedSequence([self.opt.seed, index]))
        path = self.AB_paths[index]
        ab = _norm_img(load_image(path))
        w = ab.shape[1] // 2
        A, B = ab[:, :w], ab[:, w:]
        cs = self.opt.crop_size
        A = T.resize(A, self.opt.load_size, self.opt.load_size, 2)
        B = T.resize(B, self.opt.load_size, self.opt.load_size, 2)
        y, x = T.random_crop_params(rng, self.opt.load_size, self.opt.load_size, cs, cs)
        A, B = T.crop(A, y, x, cs, cs), T.crop(B, y, x, cs, cs)
        if not self.opt.no_flip and rng.uniform() < 0.5:
            A, B = T.hflip(A), T.hflip(B)
        return {"A": A.astype(np.float32), "B": B.astype(np.float32),
                "A_paths": str(path), "B_paths": str(path)}

    def __len__(self):
        return len(self.AB_paths)


class SingleDataset:
    """One folder of images, A-only (single_dataset.py)."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def __init__(self, opt, stage="train"):
        self.opt = opt
        self.A_paths = sorted(make_dataset(opt.dataroot, opt.max_dataset_size))

    def __getitem__(self, index):
        path = self.A_paths[index]
        A = _norm_img(load_image(path))
        A = T.resize(A, self.opt.load_size, self.opt.load_size, 2)
        return {"A": A.astype(np.float32), "A_paths": str(path)}

    def __len__(self):
        return len(self.A_paths)


class TemplateDataset:
    """Minimal example dataset showing the registry contract
    (reference data/template_dataset.py): a ``modify_commandline_options``
    hook adding a flag, paired A/B from one folder, fixed-size output."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--new_dataset_option", type=float, default=1.0,
                            help="template example option")
        return parser

    def __init__(self, opt, stage="train"):
        self.opt = opt
        self.paths = sorted(make_dataset(opt.dataroot, opt.max_dataset_size))

    def __getitem__(self, index):
        path = self.paths[index]
        img = _norm_img(load_image(path))
        img = T.resize(img, self.opt.load_size, self.opt.load_size, 2)
        img = np.clip(img, -1, 1).astype(np.float32)
        return {"data_A": img, "data_B": img, "path": str(path)}

    def __len__(self):
        return len(self.paths)


def find_dataset_using_name(dataset_mode):
    """dataset_mode registry (reference data/__init__.py:19-39)."""
    from desr_tpu.data.i2d_dataset import I2DDataset
    from desr_tpu.data.main_dataset import MainDataset
    from desr_tpu.data.sr_dataset import NaiveSRDataset
    from desr_tpu.data.translation_dataset import TranslationDataset

    registry = {
        "unaligned": UnalignedDataset,
        "aligned": AlignedDataset,
        "single": SingleDataset,
        "template": TemplateDataset,
        "my_i2d": I2DDataset,
        "my_main": MainDataset,
        "my_naive_sr": NaiveSRDataset,
        "translation": TranslationDataset,
    }
    if dataset_mode not in registry:
        raise NotImplementedError(
            f"dataset mode [{dataset_mode}] is not registered; "
            f"available: {sorted(registry)}")
    return registry[dataset_mode]
