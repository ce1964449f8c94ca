#!/usr/bin/env python3
"""Generate frozen train/val/test split file lists.

The reference ships 28,762 frozen filenames under ``split_file_names/*.txt``
(trainA 6222 / trainB 5946 / testA+B 502 / valA 821-1095; names like
``scene0000_00_100.jpg`` with the scene id in chars [0:12]). Those lists were
produced by the rendering/filtering notebooks: scene-level partitioning with a
5%-of-scenes validation split at seed 23 (render_scannet.ipynb cell 22) and
size floors for the test/val patch sets (filtering.ipynb).

This tool regenerates equivalent lists from an exported dataset directory so
users without the reference artifacts can reproduce the protocol:

    python tools/make_splits.py --data_dir <dir-with-frame-files> \
        --out_dir split_file_names --val_frac 0.05 --test_frac 0.05 --seed 23

Frames are grouped by scene id (first 12 characters) and whole scenes are
assigned to splits, so no scene leaks across train/val/test.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def make_splits(names, val_frac=0.05, test_frac=0.05, seed=23):
    scenes = defaultdict(list)
    for n in names:
        scenes[os.path.basename(n)[:12]].append(os.path.basename(n))
    scene_ids = sorted(scenes)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(scene_ids))
    n_val = max(int(len(scene_ids) * val_frac), 1 if val_frac > 0 else 0)
    n_test = max(int(len(scene_ids) * test_frac), 1 if test_frac > 0 else 0)
    val_scenes = {scene_ids[i] for i in order[:n_val]}
    test_scenes = {scene_ids[i] for i in order[n_val:n_val + n_test]}
    splits = {"train": [], "val": [], "test": []}
    for sid in scene_ids:
        key = "val" if sid in val_scenes else "test" if sid in test_scenes else "train"
        splits[key].extend(sorted(scenes[sid]))
    return splits


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True,
                        help="directory of frame files (scene id = first 12 chars)")
    parser.add_argument("--out_dir", default="split_file_names")
    parser.add_argument("--prefix", default="", help="list-name prefix, e.g. 'A' or 'B'")
    parser.add_argument("--val_frac", type=float, default=0.05)
    parser.add_argument("--test_frac", type=float, default=0.05)
    parser.add_argument("--seed", type=int, default=23)
    args = parser.parse_args(argv)

    names = sorted(os.listdir(args.data_dir))
    splits = make_splits(names, args.val_frac, args.test_frac, args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for split, files in splits.items():
        path = os.path.join(args.out_dir, f"{split}{args.prefix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(files) + ("\n" if files else ""))
        print(f"{path}: {len(files)} files")


if __name__ == "__main__":
    main()
