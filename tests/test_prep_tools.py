"""Offline data-prep tools: scene-level splits and the SSIM patch filter
(reference: scannet_rendering/render_scannet.ipynb cell 22 split logic and
filtering.ipynb max_val_ssim_filter)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_make_splits_scene_level_and_deterministic(tmp_path):
    from make_splits import make_splits, main

    names = [f"scene{si:04d}_00_{fi * 100}.jpg" for si in range(40) for fi in range(5)]
    splits = make_splits(names, val_frac=0.05, test_frac=0.05, seed=23)

    # scene-level: a scene's frames never straddle splits
    scene_of = {}
    for split, files in splits.items():
        for f in files:
            sid = f[:12]
            assert scene_of.setdefault(sid, split) == split, f"{sid} straddles splits"
    assert sum(len(v) for v in splits.values()) == len(names)
    assert len(splits["val"]) == len(splits["test"]) == 2 * 5  # 5% of 40 scenes

    # seed determinism
    assert make_splits(names, seed=23) == splits
    assert make_splits(names, seed=24) != splits

    # CLI writes the three list files
    data = tmp_path / "frames"
    data.mkdir()
    for n in names:
        (data / n).touch()
    main(["--data_dir", str(data), "--out_dir", str(tmp_path / "lists"),
          "--prefix", "A"])
    out = sorted(os.listdir(tmp_path / "lists"))
    assert len(out) == 3 and all("A" in f for f in out)


def test_ssim_filter_accepts_clean_rejects_corrupt(tmp_path):
    import imageio.v2 as imageio
    from ssim_filter import filter_frame

    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    for sub in ["raw", "render", "img"]:
        (src / sub).mkdir(parents=True)

    # LR 480x640 raw vs 2x render: identical content -> SSIM 1 -> patches kept
    base = rng.integers(800, 4800, (480, 640)).astype(np.uint16)
    hr = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    imageio.imwrite(src / "raw" / "scene0000_00_0.png", base)
    imageio.imwrite(src / "render" / "scene0000_00_0.png", hr)
    imageio.imwrite(src / "img" / "scene0000_00_0.jpg",
                    rng.integers(0, 255, (480, 640, 3)).astype(np.uint8))

    out = tmp_path / "out"
    n = filter_frame("scene0000_00_0.png", str(src), str(out))
    assert n > 0
    patches = os.listdir(out / "hr")
    assert len(patches) == n
    hr_patch = np.asarray(imageio.imread(out / "hr" / patches[0]))
    lr_patch = np.asarray(imageio.imread(out / "raw" / patches[0]))
    assert hr_patch.shape == (640, 640) and lr_patch.shape == (320, 320)
    # render/ holds the 2x-downsampled HR patch (the [0::2,0::2] eval rule)
    rd_patch = np.asarray(imageio.imread(out / "render" / patches[0]))
    np.testing.assert_array_equal(rd_patch, hr_patch[0::2, 0::2])

    # a frame whose render disagrees everywhere -> rejected
    imageio.imwrite(src / "render" / "scene0000_00_1.png",
                    rng.integers(800, 4800, (960, 1280)).astype(np.uint16))
    imageio.imwrite(src / "raw" / "scene0000_00_1.png",
                    rng.integers(800, 4800, (480, 640)).astype(np.uint16))
    imageio.imwrite(src / "img" / "scene0000_00_1.jpg",
                    rng.integers(0, 255, (480, 640, 3)).astype(np.uint8))
    assert filter_frame("scene0000_00_1.png", str(src), str(out / "o2")) == 0

    # over-range depth (> max_value) -> rejected outright
    bad = base.copy()
    bad[0, 0] = 6000
    imageio.imwrite(src / "raw" / "scene0000_00_2.png", bad)
    imageio.imwrite(src / "render" / "scene0000_00_2.png", hr)
    imageio.imwrite(src / "img" / "scene0000_00_2.jpg",
                    rng.integers(0, 255, (480, 640, 3)).astype(np.uint8))
    assert filter_frame("scene0000_00_2.png", str(src), str(out / "o3")) == 0
