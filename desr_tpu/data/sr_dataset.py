"""Naive SR dataset (reference: data/my_naive_sr_dataset.py).

Full-size 2x pipeline: Resize(960, 1280, INTER_AREA) + PadIfNeeded(1024, 1280),
then a manual random crop of (2*crop_h, 2*crop_w) at train time (whole canvas
at test) (:56-89). The reference computes an LR pair too but DISCARDS it at
__getitem__ (:186-187) — A_d/B_d are the HR crops; LR versions are recreated
in-model via bicubic interpolation (models/main_sr_model.py:279-293). K_A is
rescaled for 2x via the elementwise [[2,1,2],[1,2,2],[1,1,1]] matrix
(:199-200); crop boxes carry the random offsets (:201-207).
"""

from __future__ import annotations

import numpy as np

from desr_tpu.data import transforms as T
from desr_tpu.data.base_dataset import UnpairedFolderDataset, load_image, normalize_pair

SCALE_K = np.array([[2.0, 1.0, 2.0], [1.0, 2.0, 2.0], [1.0, 1.0, 1.0]])


class NaiveSRDataset(UnpairedFolderDataset):
    LOAD_H, LOAD_W = 960, 1280
    PAD_H, PAD_W = 1024, 1280

    def _draw_crop(self, rng):
        """The ONE rng consumption of the SR transform (host and --device_aug
        paths draw identically, keeping the augmentation stream shared)."""
        ch, cw = self.opt.crop_size_h * 2, self.opt.crop_size_w * 2
        h = int(rng.integers(0, self.PAD_H - ch + 1))
        w = int(rng.integers(0, self.PAD_W - cw + 1))
        return h, w

    def _transform_pair(self, rng, depth, img):
        opt = self.opt
        depth, img = normalize_pair(depth, img)
        img = T.resize(img, self.LOAD_H, self.LOAD_W, 3)
        depth = T.resize(depth, self.LOAD_H, self.LOAD_W, 3)
        img = T.pad_if_needed(img, self.PAD_H, self.PAD_W)
        depth = T.pad_if_needed(depth, self.PAD_H, self.PAD_W)
        ch, cw = opt.crop_size_h * 2, opt.crop_size_w * 2
        if self.train:
            h, w = self._draw_crop(rng)
            depth = depth[h : h + ch, w : w + cw]
            img = img[h : h + ch, w : w + cw]
        else:
            h, w = 0, 0
        img = np.clip(img, -1, 1).astype(np.float32)
        depth = np.clip(depth, -1, 1).astype(np.float32)
        return depth[..., None], img, h, w

    def __getitem__(self, index):
        rng = self.item_rng(index)
        index_A, index_B = self.pick_indices(index, rng)
        A_path, B_path = self.A_paths[index_A], self.B_paths[index_B]
        A_depth = self.load_depth(A_path, "A")
        B_depth = self.load_depth(B_path, "B")
        A_img_raw = load_image(self.A_add_paths[index_A])[..., :3]
        B_img_raw = load_image(self.B_add_paths[index_B])[..., :3]
        device_half = None
        if self.device_aug_active():
            # host keeps DECODE only and ships the raw uint8/uint16 frames
            # (4x smaller transfers than float32); normalization + the
            # full-canvas INTER_AREA resize + pad + crop (the costliest host
            # work at this stage, PERF.md) run on device
            # (ops/device_aug.make_sr_finisher). Same rng draw order as the
            # host path -> identical crop offsets.
            h_a, w_a = self._draw_crop(rng)
            h_b, w_b = self._draw_crop(rng)
            device_half = {
                "A_img_src": np.ascontiguousarray(A_img_raw),
                "A_d_src": A_depth,
                "A_off": np.array([h_a, w_a], np.int32),
                "B_img_src": np.ascontiguousarray(B_img_raw),
                "B_d_src": B_depth,
                "B_off": np.array([h_b, w_b], np.int32),
            }
        else:
            A_img = A_img_raw.astype(np.float32)
            B_img = B_img_raw.astype(np.float32)
            A_d, A_i, h_a, w_a = self._transform_pair(rng, A_depth, A_img)
            B_d, B_i, h_b, w_b = self._transform_pair(rng, B_depth, B_img)
        K_B = self.get_intrinsics(B_path)
        K_A = self.interiornet_K() if self.opt.interiornet else self.get_intrinsics(A_path)
        K_A = K_A * SCALE_K
        opt = self.opt
        if self.train:
            crop_A = np.array([h_a, opt.crop_size_h * 2 + h_a, w_a, opt.crop_size_w * 2 + w_a],
                              np.float32)
            crop_B = np.array([h_b, opt.crop_size_h + h_b, w_b, opt.crop_size_w + w_b],
                              np.float32)
        else:
            crop_A = np.array([0, 1024, 0, 1280], np.float32)
            crop_B = np.array([0, 512, 0, 640], np.float32)
        item = {"A_paths": str(A_path), "B_paths": str(B_path),
                "K_A": K_A.astype(np.float32), "K_B": K_B.astype(np.float32),
                "crop_A": crop_A, "crop_B": crop_B}
        if device_half is not None:
            item.update(device_half)
        else:
            item.update(A_i=A_i, B_i=B_i, A_d=A_d, B_d=B_d)
        return item

    def device_finish(self, arrays):
        """Parent-process device half of SR --device_aug: INTER_AREA resize
        to the 960x1280 canvas + REFLECT_101 pad + crop, one jitted call per
        source geometry (ops/device_aug.make_sr_finisher)."""
        if "A_img_src" not in arrays:
            return arrays
        if not hasattr(self, "_sr_finishers"):
            self._sr_finishers = {}  # one jitted fn per source geometry
        out = dict(arrays)
        a_img, a_d = out.pop("A_img_src"), out.pop("A_d_src")
        b_img, b_d = out.pop("B_img_src"), out.pop("B_d_src")
        key = (a_img.shape[1:3], a_d.shape[1:3], b_img.shape[1:3], b_d.shape[1:3])
        if self._sr_finishers.get(key) is None:
            from desr_tpu.ops.device_aug import make_sr_finisher

            self._sr_finishers[key] = make_sr_finisher(
                self.LOAD_H, self.LOAD_W, self.PAD_H, self.PAD_W,
                self.opt.crop_size_h * 2, self.opt.crop_size_w * 2)
        done = self._sr_finishers[key](a_img, a_d, out.pop("A_off"),
                                       b_img, b_d, out.pop("B_off"))
        out.update(done)
        return out
