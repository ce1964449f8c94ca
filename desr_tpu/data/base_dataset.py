"""Shared dataset machinery for the unpaired folder datasets.

Covers the common skeleton of data/my_I2D_dataset.py, data/my_main_dataset.py
and data/my_naive_sr_dataset.py (__init__ path handling at :94-147, ``--take``
subsampling with seed 23 at :118-133, unpaired indexing at :154-160, decode at
:163-170).
"""

from __future__ import annotations

import glob
import itertools
import os

import numpy as np

from desr_tpu.data.image_folder import make_dataset
from desr_tpu.data import transforms as T


def load_image(path):
    if str(path).endswith(".png"):
        from desr_tpu.data import native_io

        arr = native_io.decode_png(path)
        if arr is not None:
            return arr.astype(np.uint8) if arr.max(initial=0) <= 255 and arr.ndim == 3 else arr
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    return np.array(Image.open(path))


def load_depth_png(path):
    """uint16 PNG -> int32 array (the reference's int path).

    Uses the native C++ libpng decoder (native/dataio.cpp) when available,
    falling back to PIL."""
    from desr_tpu.data import native_io

    arr = native_io.decode_png(path)
    if arr is None:
        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True
        arr = np.array(Image.open(path))
    if arr.ndim == 3:
        arr = arr[..., 0]
    if arr.dtype == np.uint16:
        arr = arr.astype(np.int32)
    return arr


def _read_split(split_dir, fname, base_dir):
    """Read a frozen split list, dedupe preserving order, join onto base_dir.

    The published lists contain duplicates (testA_d.txt lists every name
    twice); entries whose files are missing on disk are dropped with a
    warning so partial local mirrors still load.
    """
    path = os.path.join(split_dir, fname)
    seen, names = set(), []
    with open(path) as f:
        for line in f:
            name = line.strip()
            if name and name not in seen:
                seen.add(name)
                names.append(name)
    paths = [os.path.join(base_dir, n) for n in names]
    existing = [p for p in paths if os.path.exists(p)]
    if len(existing) != len(paths):
        print(f"split {fname}: {len(paths) - len(existing)}/{len(paths)} "
              f"listed files missing under {base_dir}")
    return existing


def draw_geo_params(rng, p_rot, h, w, crop_h, crop_w):
    """Shared host/device augmentation parameter draws.

    Consumes the rng EXACTLY like the original inline chain (gate draw,
    angle draw only when gated, crop y/x draws, flip draw) so the host and
    ``--device_aug`` paths produce identical parameter streams from the same
    seed (reference chain: my_main_dataset.py:66-76).
    """
    did_rot = bool(rng.uniform() < p_rot)
    angle = float(rng.uniform(-30, 30)) if did_rot else 0.0
    y, x = T.random_crop_params(rng, h, w, crop_h, crop_w)
    flip = bool(rng.uniform() < 0.5)
    return did_rot, angle, y, x, flip


class UnpairedFolderDataset:
    """Unpaired sampling: B sequential (index % B_size), A uniform random."""

    def __init__(self, opt, stage="train"):
        self.opt = opt
        self.stage = stage
        self.train = stage != "test"
        self._draw = itertools.count()
        self.seed = getattr(opt, "seed", 0)

        dir_A = opt.path_A if self.train else opt.path_A_test
        dir_B = opt.path_B if self.train else opt.path_B_test
        dir_A_add = opt.A_add_paths if self.train else opt.A_add_paths_test
        dir_B_add = opt.B_add_paths if self.train else opt.B_add_paths_test

        split_dir = getattr(opt, "split_files", "")
        if split_dir:
            # frozen split lists (reference split_file_names/*.txt, mirrored
            # in splits/scannet/): file membership comes from the lists, not
            # directory walks — pins the published train/test splits exactly.
            phase = "train" if self.train else "test"
            self.A_paths = _read_split(split_dir, f"{phase}A_d.txt", dir_A)
            self.B_paths = _read_split(split_dir, f"{phase}B_d.txt", dir_B)
            if opt.image_and_depth:
                self.A_add_paths = _read_split(split_dir, f"{phase}A_i.txt", dir_A_add)
                self.B_add_paths = _read_split(split_dir, f"{phase}B_i.txt", dir_B_add)
            if getattr(opt, "take", 0) > 0:
                np.random.seed(23)
                idx_A = np.random.randint(0, len(self.A_paths) - 1, opt.take)
                idx_B = np.random.randint(0, len(self.B_paths) - 1, opt.take)
                self.A_paths = list(np.array(self.A_paths)[idx_A])
                self.B_paths = list(np.array(self.B_paths)[idx_B])
                if opt.image_and_depth:
                    self.A_add_paths = list(np.array(self.A_add_paths)[idx_A])
                    self.B_add_paths = list(np.array(self.B_add_paths)[idx_B])
        elif getattr(opt, "take", 0) > 0:
            np.random.seed(23)  # reference: my_main_dataset.py:118-133
            A = sorted(glob.glob(dir_A + "/*"))
            B = sorted(glob.glob(dir_B + "/*"))
            idx_A = np.random.randint(0, len(A) - 1, opt.take)
            idx_B = np.random.randint(0, len(B) - 1, opt.take)
            self.A_paths = list(np.array(A)[idx_A])
            self.B_paths = list(np.array(B)[idx_B])
            if opt.image_and_depth:
                A_add = sorted(glob.glob(dir_A_add + "/*"))
                B_add = sorted(glob.glob(dir_B_add + "/*"))
                self.A_add_paths = list(np.array(A_add)[idx_A])
                self.B_add_paths = list(np.array(B_add)[idx_B])
        else:
            self.A_paths = sorted(make_dataset(dir_A, opt.max_dataset_size))
            self.B_paths = sorted(glob.glob(f"{dir_B}/*"))
            if opt.image_and_depth:
                self.A_add_paths = sorted(make_dataset(dir_A_add, opt.max_dataset_size))
                self.B_add_paths = sorted(glob.glob(f"{dir_B_add}/*"))
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self._K_cache = {}
        self._device_augmenter = None  # lazy jit, parent process only

    def item_rng(self, index):
        # pid in the entropy: forked loader workers inherit the same _draw
        # counter, so without it workers would replay identical augmentations
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, index, next(self._draw), os.getpid()]))

    def pick_indices(self, index, rng):
        index_B = index % self.B_size
        index_A = int(rng.integers(0, self.A_size))
        return index_A, index_B

    def load_depth(self, path, domain):
        if str(path).endswith(".npy"):
            return np.load(path).astype(np.float32)
        if domain == "B" and not self.opt.use_scannet and not str(path).endswith(".png"):
            return np.load(path).astype(np.float32)
        return load_depth_png(path)

    def get_intrinsics(self, f_path):
        """Per-scene 3x3 K, cached (vs the reference's per-item np.loadtxt,
        my_main_dataset.py:149-152)."""
        f_name = os.path.basename(str(f_path)).split(".")[0]
        scene = f_name[:12]
        if scene not in self._K_cache:
            p = os.path.join(self.opt.path_to_intr, scene, "intrinsic", "intrinsic_depth.txt")
            self._K_cache[scene] = np.loadtxt(p)[:3, :3]
        return self._K_cache[scene]

    def interiornet_K(self):
        return np.asarray([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])

    # -- --device_aug: on-TPU geometric augmentation ------------------------

    P_ROT = 0.9  # rotate gate probability; subclasses override

    def device_aug_active(self):
        """Subclasses widen this (e.g. main excludes --no_aug)."""
        return self.train and getattr(self.opt, "device_aug", False)

    def aug_geometry(self):
        """(load_h, load_w, crop_h, crop_w) for the geometric chain."""
        opt = self.opt
        return opt.load_size_h, opt.load_size_w, opt.crop_size_h, opt.crop_size_w

    def prepare_full(self, rng, depth, img, raw_img=False):
        """Host half of --device_aug: decode/resize/normalize at load size,
        draw the SAME parameter stream as the host chain, and emit the
        (H, W, 4) img+depth stack plus its [angle, cy, cx, flip] row for the
        on-device warp (ops/device_aug.py). The stack ships UNCLIPPED (bicubic
        resize can overshoot [-1, 1]); the warp clips its output, exactly like
        the host path's post-crop clip.

        ``raw_img=True`` (I2D, on-device ColorJitter) keeps the image channels
        in raw [0, 255] range — the device jitters then normalizes."""
        lh, lw, ch, cw = self.aug_geometry()
        if raw_img:
            depth = T.normalize_depth_np(np.asarray(depth))
            img = np.asarray(img, np.float32)
        else:
            depth, img = normalize_pair(depth, img)
        img = T.resize(img, lh, lw, 3)
        depth = T.resize(depth, lh, lw, 3)
        _, angle, y, x, flip = draw_geo_params(rng, self.P_ROT, lh, lw, ch, cw)
        full = np.concatenate([img, depth[..., None]], axis=-1).astype(np.float32)
        return full, np.array([angle, y, x, float(flip)], np.float32)

    def device_finish(self, arrays):
        """Parent-process device-side completion of a --device_aug batch:
        one fused rotate+crop+flip warp per domain (see ops/device_aug.py),
        replacing A_full/B_full with the standard crop-size input keys."""
        if "A_full" not in arrays:
            return arrays
        jitter = "A_jit" in arrays
        if self._device_augmenter is None:
            from desr_tpu.ops.device_aug import make_pair_augmenter

            _, _, ch, cw = self.aug_geometry()
            self._device_augmenter = make_pair_augmenter(ch, cw, jitter=jitter)
        out = dict(arrays)
        if jitter:
            warped = self._device_augmenter(
                out.pop("A_full"), out.pop("A_aug"), out.pop("A_jit"),
                out.pop("B_full"), out.pop("B_aug"), out.pop("B_jit"))
        else:
            warped = self._device_augmenter(out.pop("A_full"), out.pop("A_aug"),
                                            out.pop("B_full"), out.pop("B_aug"))
        out.update(warped)
        return out

    def __len__(self):
        return min(self.A_size, self.B_size)


def normalize_pair(depth, img):
    """Image + depth normalization (my_main_dataset.py:32-52)."""
    img = T.normalize_image_np(np.asarray(img))
    depth = T.normalize_depth_np(np.asarray(depth))
    return depth, img
