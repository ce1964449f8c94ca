"""Per-stage step-time A/B driver (real chip).

Runs one stage's full train step at its README configuration with extra flags
passed through, and prints steady-state s/step + pairs/sec/chip. This is the
hardware-isolation harness behind every default flip (PERF.md methodology:
profile ranks candidates, but only a measured step-level A/B changes a
default).

    python tools/ab_step.py sr                      # baseline
    python tools/ab_step.py sr --pallas_conv        # candidate
    python tools/ab_step.py translation --steps 6   # slower stages: fewer reps

Synthetic batches (same generators as bench.py / the model tests); timing via
host transfer of the loss (axon's block_until_ready is unreliable), after a
>=12-step runtime warmup (PERF.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_ARGV = {
    "sr": ["--model_type", "main", "--SR", "--batch_size", "1",
           "--use_image_for_trans", "--use_masked", "--norm_loss",
           "--use_smooth_loss", "--w_syn_norm", "0.05",
           "--crop_size_h", "512", "--crop_size_w", "640", "--lr", "2e-5"],
    "main": ["--model_type", "main", "--batch_size", "6",
             "--use_image_for_trans", "--use_masked", "--norm_loss",
             "--use_smooth_loss", "--w_syn_norm", "0.05",
             "--crop_size_h", "384", "--crop_size_w", "512"],
    "i2d": ["--model_type", "I2D", "--batch_size", "12", "--norm_loss",
            "--crop_size_h", "384", "--crop_size_w", "512"],
    "translation": ["--model_type", "translation", "--batch_size", "6",
                    "--crop_size_h", "256", "--crop_size_w", "256"],
}


def make_batch(stage, b, h, w):
    rng = np.random.default_rng(0)
    if stage == "sr":
        h, w = h * 2, w * 2
    da = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db[db < -0.3] = -1.0
    ai = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    bi = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    if stage == "translation":
        return {"A_depth": da, "A_img": ai, "B_depth": db, "B_img": bi,
                "A_name": ["a"] * b, "B_name": ["b"] * b}
    batch = {"A_i": ai, "B_i": bi, "A_d": da, "B_d": db,
             "A_paths": ["a.png"] * b, "B_paths": ["b.png"] * b}
    if stage in ("sr", "main"):
        K = np.tile(np.array([[[1154.0, 0, w // 2], [0, 1154, h // 2],
                               [0, 0, 1]]], np.float32), (b, 1, 1))
        crop_a = np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1))
        ch, cw = (h // 2, w // 2) if stage == "sr" else (h, w)
        crop_b = np.tile(np.array([[0, ch, 0, cw]], np.float32), (b, 1))
        batch.update(K_A=K, K_B=K.copy(), crop_A=crop_a, crop_B=crop_b)
    return batch


def run_eval(args, model, b):
    """Steady-state timing of the serving forward (predict.py's graph)."""
    import jax

    forward = model._forward_fn()

    def fwd_fn(p, bt, r):
        f = forward(p, bt, r, False)
        # scalar computed in-program: float() of it blocks on the whole
        # executable with a one-element transfer (axon's block_until_ready
        # is unreliable and full-tensor pulls skew tunnel timing — PERF.md).
        import jax.numpy as jnp

        if args.serve:
            # predict.py's graph: only the real-branch prediction is kept,
            # so XLA prunes the synthetic branch (pair with
            # --no_batched_branches, which predict.py forces)
            key = ("pred_real_depth_hr" if "pred_real_depth_hr" in f
                   else "pred_real_depth")
            return jnp.mean(f[key].astype(jnp.float32))
        # sum over EVERY output so XLA cannot dead-code-eliminate any net
        # (a single-tensor scalar let DCE delete the other branches)
        return sum(jnp.mean(v.astype(jnp.float32))
                   for v in f.values() if hasattr(v, "shape"))

    fwd = jax.jit(fwd_fn)
    rng = jax.random.PRNGKey(0)

    def step():
        return float(fwd(model.params, model._batch, rng))

    for _ in range(args.warmup):
        step()
    if args.profile_dir:
        import jax.profiler

        with jax.profiler.trace(args.profile_dir):
            step()
            step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    n_chips = max(1, len(jax.devices()))
    mode = "SERVE" if args.serve else "EVAL"
    print(f"[ab] stage={args.stage} {mode} backend={jax.default_backend()}"
          f" steps={args.steps}")
    print(f"[ab] {dt:.4f} s/fwd  {b / dt / n_chips:.4f} frames/sec/chip")

    if args.pipeline:
        # predict.py's actual dispatch pattern: jax's async dispatch keeps the
        # next call in flight while the previous result is pulled, so the
        # ~32 ms tunnel round-trip overlaps device compute instead of adding
        # to it. Dispatch all steps, sync ONCE at the end — the per-step
        # quotient is the sustained pipelined rate a folder-serving run sees.
        outs = []
        t0 = time.perf_counter()
        for _ in range(args.steps):
            outs.append(fwd(model.params, model._batch, rng))
        for o in outs:
            float(o)
        dt_p = (time.perf_counter() - t0) / args.steps
        print(f"[ab] pipelined {dt_p:.4f} s/fwd  "
              f"{b / dt_p / n_chips:.4f} frames/sec/chip "
              f"(sync-every-step was {dt:.4f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=sorted(STAGE_ARGV))
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=12)
    ap.add_argument("--profile_dir", default=None,
                    help="capture a 2-step jax.profiler trace after warmup "
                         "(analyse with tools/xplane_profile.py)")
    ap.add_argument("--pipeline", action="store_true",
                    help="with --eval: also time async pipelined dispatch "
                         "(sync once at the end) — predict.py's real "
                         "pattern, where the tunnel round-trip overlaps "
                         "device compute")
    ap.add_argument("--serve", action="store_true",
                    help="with --eval: keep only the real-branch prediction "
                         "(predict.py's graph) so XLA prunes the synthetic "
                         "branch; combine with --no_batched_branches")
    ap.add_argument("--multi", type=int, default=0,
                    help="N>0: time optimize_parameters_multi (lax.scan of N "
                         "steps, ONE device dispatch per call). Pair with a "
                         "LONG --warmup (counted in CALLS): the axon runtime "
                         "warms larger programs slower (PERF.md round-3/4 "
                         "lessons) — the round-2 scan-of-8 number used only "
                         "16 executions")
    ap.add_argument("--eval", action="store_true",
                    help="time the SERVING graph instead: the jitted "
                         "forward-only multi-net apply predict.py dispatches "
                         "(no loss tail, no backward, no Adam). The relevant "
                         "surface for --pallas_conv/--pallas_fuse, whose "
                         "layout tax only train-graph XLA convs pay")
    args, extra = ap.parse_known_args()

    import jax

    from desr_tpu.models import create_model
    from desr_tpu.options.train_options import TrainOptions

    argv = STAGE_ARGV[args.stage] + [
        "--name", f"ab_{args.stage}", "--checkpoints_dir", "/tmp/desr_ab_ckpt",
    ] + (["--steps_per_call", str(args.multi)] if args.multi > 0 else []) + extra
    opt = TrainOptions().parse(argv)
    model = create_model(opt)
    model.setup()

    b = opt.batch_size
    data = make_batch(args.stage, b, opt.crop_size_h, opt.crop_size_w)
    model.set_input(data)

    if args.eval:
        run_eval(args, model, b)
        return

    def sync():
        m = model.metrics
        key = "G" if "G" in m else sorted(m)[0]
        return float(m[key])

    if args.multi > 0:
        assert model.supports_multi_step(), "stage lacks a train scan"
        batches = [data] * args.multi
        for i in range(args.warmup):
            model.optimize_parameters_multi(batches, (i + 1) * args.multi)
            if i % 5 == 4:
                sync()  # surface warmup progress / keep the pipeline honest
        sync()
        t0 = time.perf_counter()
        for i in range(args.steps):
            model.optimize_parameters_multi(
                batches, (args.warmup + i + 1) * args.multi)
        sync()
        dt = (time.perf_counter() - t0) / (args.steps * args.multi)
        n_chips = max(1, len(jax.devices()))
        print(f"[ab] stage={args.stage} MULTI={args.multi} extra={extra} "
              f"backend={jax.default_backend()} calls={args.steps} "
              f"warmup_calls={args.warmup}")
        print(f"[ab] {dt:.4f} s/step  {b / dt / n_chips:.4f} pairs/sec/chip")
        return

    for i in range(args.warmup):
        model.optimize_parameters(i + 1)
    sync()

    if args.profile_dir:
        import jax.profiler

        with jax.profiler.trace(args.profile_dir):
            for i in range(2):
                model.optimize_parameters(100 + i)
            sync()

    t0 = time.perf_counter()
    for i in range(args.steps):
        model.optimize_parameters(args.warmup + i + 1)
    sync()
    dt = (time.perf_counter() - t0) / args.steps

    n_chips = max(1, len(jax.devices()))
    print(f"[ab] stage={args.stage} extra={extra} backend={jax.default_backend()}"
          f" steps={args.steps}")
    print(f"[ab] {dt:.4f} s/step  {b / dt / n_chips:.4f} pairs/sec/chip")


if __name__ == "__main__":
    main()
