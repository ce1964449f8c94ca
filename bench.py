"""Benchmark: RGB-D pairs/sec/chip on the SR fine-tune train step.

Headline metric per BASELINE.json: "RGB-D pairs/sec/chip at 640x480 x4 SR".
This runs the full MainSR training step (forward + all losses + backward +
Adam) at the README SR configuration — batch 1, LR crop 512x640, HR output
1024x1280 (x4 pixels) — on the available TPU chip(s) and reports
pairs/sec/chip.

The reference repo publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` is tracked against the first recorded run of this bench
(bench_baseline.json, committed after round 1) — i.e. round-over-round
speedup; >= 1.0 means at least as fast as the round-1 implementation.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def make_batch(b, ch, cw):
    rng = np.random.default_rng(0)
    h, w = ch * 2, cw * 2
    depth_a = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.3] = -1.0
    K = np.tile(np.array([[[1154.0, 0, 640], [0, 1154, 480], [0, 0, 1]]], np.float32), (b, 1, 1))
    crop_a = np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1))
    crop_b = np.tile(np.array([[0, ch, 0, cw]], np.float32), (b, 1))
    return {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a, "B_d": depth_b,
        "K_A": K, "K_B": K.copy(), "crop_A": crop_a, "crop_B": crop_b,
    }


def main():
    import contextlib
    import io

    import jax

    from desr_tpu.options.train_options import TrainOptions
    from desr_tpu.models.main_sr_model import MainSRModel

    n_chips = len(jax.devices())
    batch = max(1, n_chips)  # README SR config: batch 1 per chip
    ch, cw = 512, 640

    def build(remat):
        argv = [
            "--model_type", "main", "--SR", "--name", "bench_sr",
            "--checkpoints_dir", "/tmp/desr_bench_ckpt",
            "--batch_size", str(batch),
            "--use_image_for_trans", "--use_masked", "--norm_loss", "--use_smooth_loss",
            "--w_syn_norm", "0.05",
            "--crop_size_h", str(ch), "--crop_size_w", str(cw),
            "--lr", "2e-5",
        ] + (["--remat"] if remat else [])
        # keep stdout to exactly ONE JSON line: option/network dumps -> stderr
        with contextlib.redirect_stdout(sys.stderr):
            opt = TrainOptions().parse(argv)
            model = MainSRModel(opt)
            model.setup()
        return model

    def sync(model):
        # the experimental axon backend's block_until_ready can return early;
        # a host transfer of the loss (which depends on the whole donated
        # params chain) reliably drains the step queue.
        return float(model.metrics["G"])

    data = make_batch(batch, ch, cw)
    model = build(remat=False)
    model.set_input(data)
    try:
        # warmup / compile. The first ~10 executions of a large program run
        # slowly on the tunneled runtime (background optimization); steady
        # state only shows after a deep warmup.
        for i in range(12):
            model.optimize_parameters(i + 1)
        sync(model)
    except Exception as e:  # HBM OOM -> retry with rematerialization
        print(f"# no-remat step failed ({type(e).__name__}); retrying with --remat",
              file=sys.stderr)
        model = build(remat=True)
        model.set_input(data)
        for i in range(12):
            model.optimize_parameters(i + 1)
        sync(model)

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        model.optimize_parameters(i + 20)
    sync(model)
    dt = (time.perf_counter() - t0) / n_steps

    pairs_per_sec_chip = batch / dt / n_chips

    # Modeled vs-reference ratio (BASELINE.md §2, driver-visible): the SR
    # step is memory-bound, so any implementation's per-chip ceiling is
    # HBM_bandwidth / bytes_per_step. The reference's byte budget is a fixed
    # property of ITS program — fp32 end-to-end (no amp anywhere in the
    # reference) over the same computation — modeled as 2x the 363 GB/step
    # XLA counted for OUR bf16 program BEFORE any TPU-specific byte
    # optimization (round-1 cost analysis, PERF.md; the campaigns since cut
    # ours to ~221 GB, a saving the torch reference does not get). On a V100
    # (900 GB/s) its roofline-best is 900e9/726e9 ~= 1.24 pairs/s; the ratio
    # EXCLUDES its measured-in-code host hole-synthesis and DataParallel
    # losses, so it is a lower bound on the real gap.
    REF_V100_BOUND_PAIRS_S = 900e9 / (2.0 * 363e9)
    vs_reference_modeled = round(pairs_per_sec_chip / REF_V100_BOUND_PAIRS_S, 4)

    # Our CURRENT roofline position, from XLA's cost analysis of the live
    # executable (sub-second with the default-on persistent compile cache);
    # tracks today's byte budget so the artifact self-updates per round.
    hbm_util_pct = None
    try:
        ca = model.lower_train_step().compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        step_bytes = float(ca.get("bytes accessed", 0.0))
        if step_bytes > 0:  # global program bytes over n_chips' aggregate BW
            hbm_util_pct = round(100.0 * (step_bytes / dt) / (819e9 * n_chips), 1)
    except Exception as e:
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}", file=sys.stderr)

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                base = json.load(f)["value"]
            vs_baseline = pairs_per_sec_chip / base
        except Exception:
            pass
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"value": pairs_per_sec_chip,
                       "desc": "round-1 SR train-step pairs/sec/chip"}, f)

    out = {
        "metric": "sr_train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec_chip, 4),
        "unit": "RGB-D pairs/sec/chip (512x640 LR -> 1024x1280 HR train step)",
        "vs_baseline": round(vs_baseline, 4),
    }
    # > 1.0 = faster than the reference's V100 roofline-best (see comment)
    out["vs_reference_modeled"] = vs_reference_modeled
    if hbm_util_pct is not None:
        out["hbm_util_pct"] = hbm_util_pct
    print(json.dumps(out))


if __name__ == "__main__":
    main()
