"""wandb matplotlib panels (reference: plots.py).

``plot_main`` (4x5 grid of syn/real images, depths, masks, normals, RdYlBu
colormap, plots.py:17-106), ``plot_I2D`` (4x3 grid, :111-179) and
``plot_translation`` (2n x 8 grid with per-row depth scanline, :203-280).
All take NHWC numpy visuals dicts. Safe no-ops if matplotlib is unavailable.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def tensor2im_depth(arr, max_distance=5100.0):
    """[-1,1] depth -> meters for display (plots.py:183-201)."""
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    a = a[..., 0] if a.ndim == 3 else a
    return (a * (max_distance / 2) + max_distance / 2) / 1000.0


def tensor2im_rgb(arr):
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    return np.clip((a + 1) / 2, 0, 1)


def get_normals(depth):
    """numpy normal display helper (plots.py:6-15)."""
    dzdx = -np.gradient(depth, axis=0)
    dzdy = -np.gradient(depth, axis=1)
    ones = np.ones_like(depth)
    n = np.stack([dzdx, dzdy, ones], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-6
    return (n + 1) / 2


def _grid(wandb, image_dict, step, keys, ncols, title, stage, depth_cmap="RdYlBu"):
    plt = _plt()
    keys = [k for k in keys if k in image_dict]
    nrows = (len(keys) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for ax in axes.ravel():
        ax.axis("off")
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        arr = np.asarray(image_dict[k])
        if arr.ndim == 4:
            arr = arr[0]
        if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
            arr = arr.transpose(1, 2, 0)  # planar (3, H, W) normal map
        if arr.ndim == 3 and arr.shape[-1] == 3:
            ax.imshow(tensor2im_rgb(arr))
        else:
            ax.imshow(tensor2im_depth(arr), cmap=depth_cmap)
        ax.set_title(k)
    if wandb is not None:
        wandb.log({f"{stage}/{title}": wandb.Image(fig)}, step=step)
    plt.close(fig)
    return fig


def plot_main(wandb, image_dict, step, depth=False, stage="train"):
    keys = ["syn_image", "syn_depth", "syn2real_depth", "syn_mask", "pred_syn_depth",
            "mask_syn_add_holes", "syn_depth_by_image", "real_image", "real_depth",
            "real_depth_by_image", "pred_real_depth", "real_mask", "depth_masked",
            "syn2real_depth_masked", "norm_syn", "norm_syn_pred", "norm_real",
            "norm_real_pred", "norm_syn2real"]
    return _grid(wandb, image_dict, step, keys, 5, "main", stage)


def plot_I2D(wandb, image_dict, step, depth=False, stage="train"):
    keys = ["syn_image", "syn_depth", "pred_syn_depth",
            "real_image", "real_depth", "pred_real_depth"]
    return _grid(wandb, image_dict, step, keys, 3, "I2D", stage)


def plot_translation(wandb, image_dict, step, depth=False, stage="train"):
    """Translation panel incl. the per-row depth scanline plot the reference
    renders (plots.py:203-280): mid-row depth profiles in meters for
    real/fake/rec, which makes translator depth-range drift visible."""
    plt = _plt()
    keys = ["real_img_A", "real_depth_A", "fake_depth_B", "rec_depth_A",
            "real_img_B", "real_depth_B", "fake_depth_A", "rec_depth_B"]
    keys = [k for k in keys if k in image_dict]
    ncols = 4
    nrows = (len(keys) + ncols - 1) // ncols + 1  # +1 row for scanlines
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for ax in axes.ravel():
        ax.axis("off")
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        arr = np.asarray(image_dict[k])
        if arr.ndim == 4:
            arr = arr[0]
        if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
            arr = arr.transpose(1, 2, 0)
        if arr.ndim == 3 and arr.shape[-1] == 3:
            ax.imshow(tensor2im_rgb(arr))
        else:
            ax.imshow(tensor2im_depth(arr), cmap="RdYlBu")
        ax.set_title(k)
        ax.axis("off")
    # scanline row: mid-row depth profiles per domain
    for col, group in enumerate([("real_depth_A", "fake_depth_B", "rec_depth_A"),
                                 ("real_depth_B", "fake_depth_A", "rec_depth_B")]):
        ax = axes[-1][col]
        ax.axis("on")
        for k in group:
            if k not in image_dict:
                continue
            d = tensor2im_depth(image_dict[k])
            ax.plot(d[d.shape[0] // 2, :], label=k, linewidth=0.8)
        ax.set_title("mid-row depth (m)")
        ax.legend(fontsize=6)
    if wandb is not None:
        wandb.log({f"{stage}/translation": wandb.Image(fig)}, step=step)
    plt.close(fig)
    return fig
