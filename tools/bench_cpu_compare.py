"""Same-silicon framework comparison: reference torch-CPU vs desr_tpu jax-CPU.

BASELINE.md's north star (>=3x per-chip training throughput) needs an
auditable comparison artifact, but the reference publishes no numbers and no
multi-GPU rig exists here. What CAN be measured honestly is both frameworks'
full main-stage train step (forward + loss zoo + backward + Adam) on the SAME
host CPU, at the same shapes and flags, in fp32 on both sides. That isolates
framework/compiler efficiency from hardware; the TPU number in bench.py then
stands on its own chip.

Reference step driven exactly like main.py's loop: set_input + optimize_
parameters (/root/reference/models/main_model.py:422-429, train.py:61-67).

Usage:  python tools/bench_cpu_compare.py [--h 384 --w 512 --batch 1 --steps 3]
Prints one JSON line; run manually, results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import contextlib
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def make_batch(b, h, w, torch_side):
    rng = np.random.default_rng(0)
    depth_a = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.3] = -1.0
    K = np.tile(np.array([[[577.0, 0, 320], [0, 577, 240], [0, 0, 1]]], np.float32), (b, 1, 1))
    crop = np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1))
    batch = {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a, "B_d": depth_b,
        "K_A": K, "K_B": K.copy(), "crop_A": crop, "crop_B": crop.copy(),
        "A_paths": ["a.png"] * b, "B_paths": ["b.png"] * b,
    }
    if torch_side:
        import torch

        def nchw(x):
            return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

        return {
            "A_i": nchw(batch["A_i"]), "B_i": nchw(batch["B_i"]),
            "A_d": nchw(batch["A_d"]), "B_d": nchw(batch["B_d"]),
            "K_A": torch.from_numpy(K).double(), "K_B": torch.from_numpy(K).double(),
            "crop_A": torch.from_numpy(crop).double(),
            "crop_B": torch.from_numpy(crop).double(),
            "A_paths": batch["A_paths"], "B_paths": batch["B_paths"],
        }
    return batch


def main_flags(b, h, w):
    return [
        "--model_type", "main", "--name", "bench_cpu", "--checkpoints_dir",
        "/tmp/desr_cpu_bench", "--batch_size", str(b),
        "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss", "--use_smooth_loss",
        "--crop_size_h", str(h), "--crop_size_w", str(w),
        "--w_syn_norm", "0.1", "--lr", "1e-4",
    ]


def time_reference(opt, b, h, w, steps):
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)  # append: never shadow repo modules
    from models.main_model import MainModel as RefMainModel  # noqa: the reference package

    ropt = copy.deepcopy(opt)
    ropt.gpu_ids = []  # reference init_net: empty gpu_ids -> CPU, no DataParallel
    with contextlib.redirect_stdout(sys.stderr):
        model = RefMainModel(ropt)
    batch = make_batch(b, h, w, torch_side=True)
    model.set_input(batch)
    np.random.seed(0)
    model.optimize_parameters(1)  # warmup (allocator, conv algo selection)
    t0 = time.perf_counter()
    for i in range(steps):
        model.optimize_parameters(i + 2)
    return (time.perf_counter() - t0) / steps


def time_ours(opt, b, h, w, steps):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from desr_tpu.models.main_model import MainModel

    with contextlib.redirect_stdout(sys.stderr):
        model = MainModel(opt)
        model.setup()
    model.set_input(make_batch(b, h, w, torch_side=False))
    for i in range(2):  # compile + one settle step
        model.optimize_parameters(i + 1)
    float(model.metrics["G"])
    t0 = time.perf_counter()
    for i in range(steps):
        model.optimize_parameters(i + 3)
    float(model.metrics["G"])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from desr_tpu.options.train_options import TrainOptions

    with contextlib.redirect_stdout(sys.stderr):
        opt = TrainOptions().parse(main_flags(args.batch, args.h, args.w))

    import torch

    ncpu = os.cpu_count()
    torch.set_num_threads(ncpu)

    t_ref = time_reference(opt, args.batch, args.h, args.w, args.steps)
    t_ours = time_ours(opt, args.batch, args.h, args.w, args.steps)

    print(json.dumps({
        "metric": "main_stage_train_step_cpu_same_host",
        "shape": f"{args.batch}x{args.h}x{args.w}",
        "cpu_cores": ncpu,
        "ref_torch_s_per_step": round(t_ref, 3),
        "ours_jax_s_per_step": round(t_ours, 3),
        "speedup_same_cpu": round(t_ref / t_ours, 3),
    }))


if __name__ == "__main__":
    main()
