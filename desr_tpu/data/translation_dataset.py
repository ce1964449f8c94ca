"""Stage-2 translation dataset (reference: data/translation_dataset.py).

Layout ``<dataroot>/<phase>{A,B}/{img,depth}`` with strict pairing asserts
(:100-105, :139-142); epoch-shuffled queue pairing when |A| != |B| (:109-128);
NaN / constant-image rejection with recursive resample (:153-168); transforms
Resize(320, 320, Lanczos) + RandomCrop(crop_h, crop_w) + HFlip applied per
domain INDEPENDENTLY (:184-208); uint8 img and uint16 depth normalizers with
dtype asserts (:38-64). Depth hole threshold uses --max_distance (default
5100 via modify_commandline_options, :78-83).
"""

from __future__ import annotations

import glob
import itertools
import os
import queue

import numpy as np

from desr_tpu.data import transforms as T


class TranslationDataset:
    IMG_EXTENSIONS = (".png", ".jpg")

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--max_distance", type=float, default=5100.0)
        return parser

    def __init__(self, opt, stage="train"):
        self.opt = opt
        self.stage = stage
        self.train = stage != "test"
        self.scale = opt.max_distance / 2
        self.seed = getattr(opt, "seed", 0)
        self._draw = itertools.count()
        phase = getattr(opt, "phase", "train") if self.train else "test"
        root = opt.dataroot
        self.dir_A = os.path.join(root, phase + "A")
        self.dir_B = os.path.join(root, phase + "B")
        self.A_imgs = self._paths(os.path.join(self.dir_A, "img"))
        self.A_depths = self._paths(os.path.join(self.dir_A, "depth"))
        assert len(self.A_imgs) == len(self.A_depths), "not pair img depth"
        self._check_ext(self.A_imgs + self.A_depths)
        self.B_imgs = self._paths(os.path.join(self.dir_B, "img"))
        self.B_depths = self._paths(os.path.join(self.dir_B, "depth"))
        assert len(self.B_imgs) == len(self.B_depths), "not pair img depth"
        self._check_ext(self.B_imgs + self.B_depths)
        self.A_size = len(self.A_imgs)
        self.B_size = len(self.B_imgs)
        self.queue_A_index = queue.Queue()

    def _paths(self, d):
        assert os.path.isdir(d), f"{d} is not a valid directory"
        files = sorted(glob.glob(os.path.join(d, "**/*.*"), recursive=True))
        return files[: min(self.opt.max_dataset_size, len(files))]

    def _check_ext(self, files):
        for f in files:
            assert any(f.endswith(e) for e in self.IMG_EXTENSIONS), \
                f"not implemented file extension type {f}"

    def _update_A_idx(self, rng):
        for i in rng.permutation(self.A_size):
            self.queue_A_index.put(int(i))

    @staticmethod
    def normalize_img(img):
        assert isinstance(img, np.ndarray) and img.dtype == np.uint8, "Img datatype"
        if img.ndim == 3 and img.shape[2] > 3:
            img = img[:, :, :3]
        return img.astype(np.float32) / 127.5 - 1.0

    def normalize_depth(self, depth):
        assert isinstance(depth, np.ndarray) and depth.dtype == np.uint16, "Depth datatype"
        d = depth.astype(np.float32)
        d = np.where(d > self.opt.max_distance, self.opt.max_distance, d)
        return d / self.scale - 1.0

    def _transform(self, rng, depth, img):
        img = self.normalize_img(img)
        depth = self.normalize_depth(depth)
        img = T.resize(img, 320, 320, 4)   # Lanczos (:185)
        depth = T.resize(depth, 320, 320, 4)
        if self.opt.isTrain and self.train:
            y, x = T.random_crop_params(rng, 320, 320, self.opt.crop_size_h, self.opt.crop_size_w)
            img = T.crop(img, y, x, self.opt.crop_size_h, self.opt.crop_size_w)
            depth = T.crop(depth, y, x, self.opt.crop_size_h, self.opt.crop_size_w)
            if rng.uniform() < 0.5:
                img, depth = T.hflip(img), T.hflip(depth)
        return depth[..., None].astype(np.float32), img.astype(np.float32)

    @staticmethod
    def _bad(*imgs):
        for i in imgs:
            if not np.isfinite(i).all():
                return True
            if np.unique(i).shape[0] < 2:
                return True
        return False

    def __getitem__(self, index, _depth_guard=0):
        import imageio

        rng = np.random.default_rng(np.random.SeedSequence([self.seed, index, next(self._draw)]))
        if self.A_size != self.B_size:
            if self.queue_A_index.empty():
                self._update_A_idx(rng)
            index_A = self.queue_A_index.get()
        else:
            index_A = index
        index_B = index
        A_img_p, A_depth_p = self.A_imgs[index_A], self.A_depths[index_A]
        B_img_p, B_depth_p = self.B_imgs[index_B], self.B_depths[index_B]
        name = lambda p: os.path.basename(p).split(".")[0]  # noqa: E731
        assert name(A_img_p) == name(A_depth_p), "not pair img depth"
        assert name(B_img_p) == name(B_depth_p), "not pair img depth"
        A_depth, A_img = self._transform(rng, np.asarray(imageio.imread(A_depth_p)),
                                         np.asarray(imageio.imread(A_img_p)))
        B_depth, B_img = self._transform(rng, np.asarray(imageio.imread(B_depth_p)),
                                         np.asarray(imageio.imread(B_img_p)))
        if self.opt.isTrain and _depth_guard < 8 and self._bad(A_depth, A_img, B_depth, B_img):
            return self.__getitem__(int(rng.integers(0, self.B_size)), _depth_guard + 1)
        return {"A_depth": A_depth, "A_img": A_img, "A_name": name(A_img_p),
                "B_depth": B_depth, "B_img": B_img, "B_name": name(B_img_p)}

    def __len__(self):
        return self.B_size
