#!/usr/bin/env python3
"""SSIM-based clean-patch filter — data-prep stage (reference: filtering.ipynb).

Compares raw (sensor) depth against rendered (mesh) depth per frame and
extracts "clean" training patches where the two agree:

1. SSIM map between raw depth and the 2x-subsampled rendered depth
   (11x11 gaussian sigma 1.5, K1=.01 K2=.03, L=1 on depth/max_value; 'valid'
   fftconvolve, so a border of (11-1)/2 px is cropped from all images)
2. 320x320 patches on a 64-px grid whose mean SSIM > 0.8
3. rendered 640x640 patches (128-px grid) must contain no holes (<= h_val mm)
4. surviving patches are written to <save_path>/{img, raw, render, hr} with
   names `<frame>_<i>_<j>.<ext>` — the "Scannet_ssim" dataset layout the
   training pipeline consumes (and whose crop boxes crop_indx decodes:
   h = 64*i + 5, w = 64*j + 5, reference models/norms.py:167-174)

Usage:
    python tools/ssim_filter.py --source_path <dir with raw/ render/ img/> \
        --save_path <out> [--max_value 5100] [--h_val 10] [--ssim_thr 0.8]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy import signal


def fspecial_gauss(size=11, sigma=1.5):
    x, y = np.mgrid[-size // 2 + 1 : size // 2 + 1, -size // 2 + 1 : size // 2 + 1]
    g = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    return g / g.sum()


def ssim_map(img1, img2, max_value, L=1.0):
    img1 = img1.astype(np.float64) / max_value
    img2 = img2.astype(np.float64) / max_value
    window = fspecial_gauss()
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    mu1 = signal.fftconvolve(window, img1, mode="valid")
    mu2 = signal.fftconvolve(window, img2, mode="valid")
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = signal.fftconvolve(window, img1 * img1, mode="valid") - mu1_sq
    s2 = signal.fftconvolve(window, img2 * img2, mode="valid") - mu2_sq
    s12 = signal.fftconvolve(window, img1 * img2, mode="valid") - mu1_mu2
    return ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def sliding_window(arr, window, step):
    """Patch grid view: (ny, nx, *window)."""
    win_h, win_w = window[0], window[1]
    step_h, step_w = step[0], step[1]
    view = np.lib.stride_tricks.sliding_window_view(arr, (win_h, win_w) + arr.shape[2:])
    view = view[::step_h, ::step_w]
    # collapse the broadcast singleton dims for >2-D inputs
    return view.reshape(view.shape[0], view.shape[1], win_h, win_w, *arr.shape[2:])


def filter_frame(fname, source_path, save_path, max_value=5100.0, L=1.0,
                 h_val=10, ssim_thr=0.8):
    import imageio
    import cv2

    depth_lq = np.asarray(imageio.imread(os.path.join(source_path, "raw", fname)))
    depth_sr = np.asarray(imageio.imread(os.path.join(source_path, "render", fname)))
    H, W = depth_lq.shape
    H_sr, W_sr = depth_sr.shape
    fname_base, ext = os.path.splitext(fname)
    img = np.asarray(imageio.imread(os.path.join(source_path, "img", fname_base + ".jpg")))
    img = cv2.resize(img, (W_sr, H_sr), interpolation=cv2.INTER_LINEAR)

    if np.max(depth_lq) > max_value or np.max(depth_sr) > max_value:
        return 0
    mtrx = ssim_map(depth_lq, depth_sr[0::2, 0::2], max_value, L)
    H_p, W_p = mtrx.shape
    pad = (H - H_p) // 2
    depth_sr = depth_sr[2 * pad : -2 * pad, 2 * pad : -2 * pad]
    img = img[2 * pad : -2 * pad, 2 * pad : -2 * pad, :]
    depth_lq = depth_lq[pad:-pad, pad:-pad]

    ssim_patch = sliding_window(mtrx, (320, 320), (64, 64))
    ssim_idx = ssim_patch.mean(axis=(2, 3)) > ssim_thr
    if ssim_idx.sum() == 0:
        return 0
    sr_patch = sliding_window(depth_sr, (640, 640), (128, 128))
    hole_idx = (sr_patch <= h_val).sum(axis=(2, 3)) == 0
    ny = min(ssim_idx.shape[0], hole_idx.shape[0])
    nx = min(ssim_idx.shape[1], hole_idx.shape[1])
    final_idx = hole_idx[:ny, :nx] * ssim_idx[:ny, :nx]
    n_good = int(final_idx.sum())
    if n_good == 0:
        return 0
    patch_idx = np.argwhere(final_idx)
    lq_patch = sliding_window(depth_lq, (320, 320), (64, 64))
    img_patch = sliding_window(img, (640, 640), (128, 128))
    for sub in ["img", "raw", "render", "hr"]:
        os.makedirs(os.path.join(save_path, sub), exist_ok=True)
    for i, j in patch_idx:
        stem = f"{fname_base}_{i}_{j}"
        imageio.imwrite(os.path.join(save_path, "img", stem + ".jpg"),
                        img_patch[i, j].astype(np.uint8))
        imageio.imwrite(os.path.join(save_path, "raw", stem + ext), lq_patch[i, j])
        imageio.imwrite(os.path.join(save_path, "render", stem + ext),
                        sr_patch[i, j][0::2, 0::2])
        imageio.imwrite(os.path.join(save_path, "hr", stem + ext), sr_patch[i, j])
    return n_good


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", required=True,
                        help="dir containing raw/, render/, img/ subfolders")
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--max_value", type=float, default=5100.0)
    parser.add_argument("--h_val", type=float, default=10)
    parser.add_argument("--ssim_thr", type=float, default=0.8)
    args = parser.parse_args(argv)
    total = 0
    names = sorted(os.listdir(os.path.join(args.source_path, "raw")))
    for fname in names:
        n = filter_frame(fname, args.source_path, args.save_path,
                         args.max_value, 1.0, args.h_val, args.ssim_thr)
        total += n
        print(f"{fname}: {n} patches")
    print(f"total {total} clean patches")


if __name__ == "__main__":
    main()
