"""Trajectory-level quality evidence: train -> serve -> score, end to end.

PERF.md round-4 plan #1: the 1%-RMSE north star so far rests on lockstep
weight-drift bounds (tests/test_lockstep.py) — parity evidence, not quality
evidence. This tool closes the loop on a *learnable* synthetic dataset by
exercising the full user-visible capability chain the reference offers
(datasets -> main.py training -> .pth checkpoints -> predict.py serving ->
new_metrics.py scoring) and showing the trained model beats the degraded
input on the reference's own offline metrics (new_metrics.py semantics:
rmse over valid-target pixels, rmse_h over input-hole pixels, rmse_d over
jointly-valid pixels — /root/reference/new_metrics.py:150-210).

Scene model (structured, not noise, so the task is learnable):
- clean depth  = sum of low-frequency sinusoids + planar ramp, in mm
- RGB          = Lambertian shading of the depth normals x low-freq albedo
  (so the image genuinely informs the geometry, as RGB guidance assumes)
- degraded     = clean + Gaussian sensor noise + random rectangular holes
  (the same degradation family the main stage's on-device syn branch
  supervises against — ops/depth.random_rect_holes)

Usage (CPU, ~5-10 min at the defaults):
    python tools/quality_eval.py --root /tmp/qeval --epochs 40

Prints ONE JSON line:
    {"baseline": {rmse...}, "trained": {rmse...}, "improvement": {...}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


# ---------------------------------------------------------------- scene gen

def _lowfreq_field(rng, h, w, n_waves=4, amp=1.0):
    """Sum of random low-frequency sinusoids in [-amp, amp]-ish."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f = np.zeros((h, w))
    for _ in range(n_waves):
        fx, fy = rng.uniform(0.3, 2.0, 2) * 2 * np.pi
        px, py = rng.uniform(0, 2 * np.pi, 2)
        f += rng.uniform(0.3, 1.0) * np.sin(fx * xx / w + px) * np.sin(fy * yy / h + py)
    return amp * f / n_waves


def make_scene(rng, h, w):
    """Returns (clean_mm uint16, rgb uint8, degraded_mm uint16)."""
    base = rng.uniform(1400, 2600)
    ramp = (_lowfreq_field(rng, h, w, 2, 600.0)
            + rng.uniform(-3, 3) * np.arange(w)[None, :]
            + rng.uniform(-3, 3) * np.arange(h)[:, None])
    clean = np.clip(base + ramp + _lowfreq_field(rng, h, w, 5, 500.0), 600, 4800)

    # Lambertian shade from the depth gradient + low-freq albedo -> RGB that
    # carries geometric signal (the guidance the image branches rely on).
    dzdx = np.gradient(clean, axis=1)
    dzdy = np.gradient(clean, axis=0)
    n = np.stack([-dzdx, -dzdy, 20.0 * np.ones_like(clean)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    light = np.array([0.3, -0.2, 0.93])
    shade = np.clip(n @ light, 0, 1)
    albedo = 0.55 + _lowfreq_field(rng, h, w, 3, 0.35)
    rgb = np.stack([np.clip(shade * albedo * g, 0, 1)
                    for g in rng.uniform(0.8, 1.2, 3)], -1)
    rgb8 = (rgb * 255).astype(np.uint8)

    noisy = clean + rng.normal(0, 25.0, clean.shape)
    for _ in range(rng.integers(6, 12)):  # sensor dropout rectangles
        rh, rw = rng.integers(8, 28, 2)
        rh, rw = min(rh, h - 1), min(rw, w - 1)  # keep rects inside tiny frames
        y0 = int(rng.integers(0, h - rh))
        x0 = int(rng.integers(0, w - rw))
        noisy[y0:y0 + rh, x0:x0 + rw] = 0.0
    noisy[rng.random(clean.shape) < 0.01] = 0.0  # speckle holes
    return (clean.astype(np.uint16), rgb8,
            np.clip(noisy, 0, 65535).astype(np.uint16))


def write_dataset(root, n_train, n_test, h, w, seed=23):
    import imageio

    rng = np.random.default_rng(seed)
    dirs = {k: os.path.join(root, k) for k in
            ["A_depth", "A_img", "B_depth", "B_img",
             "test_in", "test_img", "test_gt"]}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    intr = os.path.join(root, "intr")
    fx = 4.5 * w  # steep focal: keeps normals well-conditioned at small h,w

    def put_intr(stem):
        d = os.path.join(intr, stem[:12], "intrinsic")
        os.makedirs(d, exist_ok=True)
        np.savetxt(os.path.join(d, "intrinsic_depth.txt"),
                   np.array([[fx, 0, w / 2, 0], [0, fx, h / 2, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1]]))

    for i in range(n_train):
        stem = f"scene{i:04d}_00_{i}"
        clean, rgb, noisy = make_scene(rng, h, w)
        # A = degraded "real" domain; B = clean "synthetic" domain. Distinct
        # scenes per domain (unpaired), matching the main stage's data model.
        imageio.imwrite(os.path.join(dirs["A_depth"], stem + ".png"), noisy)
        imageio.imwrite(os.path.join(dirs["A_img"], stem + ".png"), rgb)
        clean_b, rgb_b, _ = make_scene(rng, h, w)
        imageio.imwrite(os.path.join(dirs["B_depth"], stem + ".png"), clean_b)
        imageio.imwrite(os.path.join(dirs["B_img"], stem + ".png"), rgb_b)
        put_intr(stem)
    for i in range(n_test):
        stem = f"scene{n_train + i:04d}_00_{n_train + i}"
        clean, rgb, noisy = make_scene(rng, h, w)
        imageio.imwrite(os.path.join(dirs["test_in"], stem + ".png"), noisy)
        imageio.imwrite(os.path.join(dirs["test_img"], stem + ".png"), rgb)
        imageio.imwrite(os.path.join(dirs["test_gt"], stem + ".png"), clean)
        put_intr(stem)
    return dirs, intr


# ---------------------------------------------------------------- pipeline

def width_flags(width):
    w = str(width)
    return ["--ImageDepthf_outf", w, "--ImageDepthf_basef", w,
            "--Depthf_outf", w, "--Depthf_basef", w,
            "--I2D_base", w, "--Task_basef", w]


def train(dirs, intr, args):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "desr_main", os.path.join(REPO_ROOT, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    argv = [
        "main.py", "--model_type", "main", "--do_train",
        "--image_and_depth", "--use_scannet",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--name", args.name, "--checkpoints_dir", args.ckpt_dir,
        "--path_A", dirs["A_depth"], "--A_add_paths", dirs["A_img"],
        "--path_B", dirs["B_depth"], "--B_add_paths", dirs["B_img"],
        "--path_to_intr", intr,
        "--batch_size", str(args.batch_size),
        "--compute_dtype", args.compute_dtype,
        "--lr", str(args.lr),
        "--n_epochs", str(args.epochs), "--n_epochs_decay", "0",
        "--load_size_h", str(args.hw[0]), "--load_size_w", str(args.hw[1]),
        "--crop_size_h", str(args.hw[0]), "--crop_size_w", str(args.hw[1]),
        "--save_epoch_freq", str(args.epochs), "--print_freq",
        str(args.batch_size * 8), "--num_threads", "1",
    ] + width_flags(args.width)
    old_argv = sys.argv
    sys.argv = argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv


def serve(dirs, args, out_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "desr_predict", os.path.join(REPO_ROOT, "predict.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main([
        "--name", args.name, "--checkpoints_dir", args.ckpt_dir,
        "--input_depth", dirs["test_in"], "--input_img", dirs["test_img"],
        "--output", out_dir, "--batch_size", str(args.n_test),
        "--compute_dtype", args.compute_dtype, "--num_devices", "1",
        "--net_args",
    ] + width_flags(args.width))


def score(dirs, pred_dir, intr):
    from glob import glob

    from desr_tpu.metrics import DEFAULT_METRICS, calculate_given_paths

    inp = sorted(glob(os.path.join(dirs["test_in"], "*.png")))
    pred = sorted(glob(os.path.join(pred_dir, "*.png")))
    tgt = sorted(glob(os.path.join(dirs["test_gt"], "*.png")))
    assert len(inp) == len(pred) == len(tgt) and inp, "pred/gt mismatch"
    return calculate_given_paths(inp, pred, tgt, list(DEFAULT_METRICS),
                                 5100, n_cpus=1, intr_root=intr)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/desr_quality_eval")
    p.add_argument("--name", default="qeval")
    p.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                   help="'cpu' forces the JAX CPU backend (default: this is "
                        "a trajectory-evidence run, not a perf run); "
                        "'native' keeps the session backend (TPU)")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--width", type=int, default=8)
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_test", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--compute_dtype", default="float32")
    args = p.parse_args(argv)
    args.ckpt_dir = os.path.join(args.root, "ckpt")

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    dirs, intr = write_dataset(args.root, args.n_train, args.n_test, *args.hw)
    baseline = score(dirs, dirs["test_in"], intr)  # degraded input as "pred"

    train(dirs, intr, args)
    pred_dir = os.path.join(args.root, "pred")
    serve(dirs, args, pred_dir)
    trained = score(dirs, pred_dir, intr)

    steps = args.epochs * (args.n_train // args.batch_size)
    result = {
        "steps": steps, "epochs": args.epochs, "width": args.width,
        "hw": list(args.hw), "n_train": args.n_train, "n_test": args.n_test,
        "baseline": baseline, "trained": trained,
        # self-describing: includes rmse_d (the known-risk metric) and the
        # higher-is-better deltas, so the JSON alone tells the whole story
        "improvement": {k: (1.0 - trained[k] / baseline[k]
                            if baseline.get(k) else None)
                        for k in ("rmse", "mae", "rmse_h", "rmse_d", "mse_v")
                        if k in trained and k in baseline},
        "delta_higher_better": {k: trained[k] - baseline[k]
                                for k in ("psnr", "ssim")
                                if k in trained and k in baseline},
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
