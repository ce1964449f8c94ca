"""Small host-side utilities (reference: util/util.py)."""

from __future__ import annotations

import os

import numpy as np


def data_to_meters(x, max_distance):
    """Canonical denormalization for logging/eval (util/util.py:8-12)."""
    x = x * (max_distance / 2) + (max_distance / 2)
    return x / 1000.0


def tensor2im(arr, imtype=np.uint8):
    """[-1,1] float array (H,W,C) or (C,H,W)-agnostic -> uint8 HWC image.

    Reference: util/util.py:14-32 (ours takes NHWC / HWC numpy directly).
    """
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 3 and a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    a = (a + 1) / 2.0 * 255.0
    return np.clip(a, 0, 255).astype(imtype)


def save_image(image_numpy, image_path, aspect_ratio=1.0):
    from PIL import Image

    img = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[0], image_numpy.shape[1]
    if aspect_ratio > 1.0:
        img = img.resize((int(w * aspect_ratio), h), Image.BICUBIC)
    if aspect_ratio < 1.0:
        img = img.resize((w, int(h / aspect_ratio)), Image.BICUBIC)
    img.save(image_path)


def save_uint16_png(depth01, path):
    """Save a [0,1] depth map as a x5100 uint16 PNG (main_model.py:323-336)."""
    import imageio

    arr = np.clip(np.asarray(depth01), 0, 1) * 5100.0
    imageio.imwrite(path, arr.astype(np.uint16))


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            os.makedirs(p, exist_ok=True)
    else:
        os.makedirs(paths, exist_ok=True)


def crop_indx(f_name):
    """Decode the ssim-patch crop box from a Scannet_ssim filename
    ``scene0000_00_<i>_<j>``: h = 64*i + 5, w = 64*j + 5, 320x320
    (reference models/norms.py:167-174)."""
    parts = f_name.split("_")
    i, j = int(parts[-2]), int(parts[-1])
    h_start = 64 * i + 5
    w_start = 64 * j + 5
    return h_start, h_start + 320, w_start, w_start + 320


def diagnose_network(params, name="network"):
    """Mean absolute value probe (util/util.py:35-51 analog over param dicts)."""
    vals = [np.abs(np.asarray(v)).mean() for v in params.values()]
    mean = float(np.mean(vals)) if vals else 0.0
    print(name, mean)
    return mean
