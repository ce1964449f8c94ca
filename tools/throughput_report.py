"""Per-stage throughput + roofline table -> THROUGHPUT.json (driver-visible).

VERDICT r3 weak #3/#5/#8: the roofline argument underpinning BASELINE.md §2
was pinned to round-1 byte counts (363 GB/step SR), and the round-3 wins
(serving, capacity) lived only in PERF.md prose. This tool re-derives the
whole table from TODAY'S compiled programs on the real chip and writes one
auditable artifact:

  - measured steady-state s/step (host-transfer sync, >= --warmup steps,
    PERF.md axon warmup rule)
  - flops/step + HBM bytes/step from XLA's own cost analysis of the CURRENT
    executable (compiled.cost_analysis(), the compiler's post-fusion count)
  - % of HBM roofline (achieved bytes/s vs --hbm_gbps) and MXU utilization
    (achieved flops/s vs --peak_tflops) per stage
  - train rows for all four stages INCLUDING translation (never had a
    roofline statement before) + serving rows (main/SR/I2D/translate,
    batch 8, pruned predict.py graphs) + the SR batch-4 capacity row
    (remat_blocks)

Usage (real chip; ~warm compile cache makes this minutes, not hours):
    python tools/throughput_report.py                        # all rows
    python tools/throughput_report.py --stages sr,main       # subset
    python tools/throughput_report.py --out THROUGHPUT.json

Reference counterpart: none — the reference publishes no perf numbers
(BASELINE.md §1); this artifact is the auditable stand-in.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from ab_step import STAGE_ARGV, make_batch  # noqa: E402  (README configs)

# v5e defaults; override for other parts. bf16 MXU peak + HBM BW per chip.
V5E_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _cost(compiled):
    """(flops, bytes_accessed) from XLA cost analysis; (None, None) if n/a."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        byts = ca.get("bytes accessed")
        return (float(flops) if flops else None,
                float(byts) if byts else None)
    except Exception as e:  # backend without cost analysis support
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None, None


def _build(stage, extra=(), passthrough=()):
    from desr_tpu.models import create_model
    from desr_tpu.options.train_options import TrainOptions

    argv = STAGE_ARGV[stage] + [
        "--name", f"tput_{stage}", "--checkpoints_dir", "/tmp/desr_tput_ckpt",
    ] + list(extra) + list(passthrough)
    with contextlib.redirect_stdout(sys.stderr):
        opt = TrainOptions().parse(argv)
        model = create_model(opt)
        model.setup()
    b = opt.batch_size
    model.set_input(make_batch(stage, b, opt.crop_size_h, opt.crop_size_w))
    return model, opt, b


def _sync(model):
    m = model.metrics
    key = "G" if "G" in m else sorted(m)[0]
    return float(m[key])


def _time_train(model, warmup, steps):
    for i in range(warmup):
        model.optimize_parameters(i + 1)
    _sync(model)
    t0 = time.perf_counter()
    for i in range(steps):
        model.optimize_parameters(warmup + i + 1)
    _sync(model)
    return (time.perf_counter() - t0) / steps


def _train_cost(model, stage):
    """flops/bytes of ONE optimize_parameters cycle from the lowered steps."""
    import jax

    rng = jax.random.PRNGKey(0)
    lr = model.lr_scalar()
    if stage != "translation":
        low = model._train_step.lower(model.params, model.opt_state_G,
                                      model._batch, rng, lr)
        return _cost(low.compile())

    # translation cycle at defaults: num_iter_gen x g_step + 1 x d_step_feed
    # + (num_iter_dis - 1) x d_step (translation_model.py:526-541)
    w = model._weights()
    g_c = model._g_step.lower(model.params, model.opt_state_G, model._batch,
                              rng, lr, w).compile()
    gf, gb = _cost(g_c)
    if gf is None or model._d_step is None:
        return gf, gb
    # one real g_step output supplies a correctly-shaped D feed
    _, _, _, feed, _ = model._g_step(model.params, model.opt_state_G,
                                     model._batch, rng, lr, w)
    df, db = _cost(model._d_step_feed.lower(
        model.params, model.opt_state_D, feed, rng, lr).compile())
    d2f, d2b = _cost(model._d_step.lower(
        model.params, model.opt_state_D, model._batch, rng, lr).compile())
    if None in (df, d2f):
        return None, None
    nig, nid = model.opt.num_iter_gen, model.opt.num_iter_dis
    return (nig * gf + df + (nid - 1) * d2f,
            nig * gb + db + (nid - 1) * d2b)


def _serve(stage, batch, warmup, steps, passthrough=()):
    """Pruned predict.py graph (real-branch prediction only), README width."""
    import jax
    import jax.numpy as jnp

    if stage == "translate":
        # predict.py --translate BtoA: G_B (LQ->HQ) only; the untranslated
        # direction + cycle/normal tensors DCE away (predict.py)
        model, opt, _ = _build("translation", ["--batch_size", str(batch)],
                               passthrough)
        gen_forward = model._forward_fns()

        def fwd_fn(p, bt, r):
            return jnp.mean(
                gen_forward(p, bt, r, False)["fake_depth_A"].astype(jnp.float32))
    else:
        model, opt, _ = _build(stage, ["--batch_size", str(batch),
                                       "--no_batched_branches"], passthrough)
        forward = model._forward_fn()

        def fwd_fn(p, bt, r):
            f = forward(p, bt, r, False)
            if stage == "i2d":  # tuple return; [3] = pred_real (predict.py --I2D)
                return jnp.mean(f[3].astype(jnp.float32))
            key = ("pred_real_depth_hr" if "pred_real_depth_hr" in f
                   else "pred_real_depth")
            return jnp.mean(f[key].astype(jnp.float32))

    fwd = jax.jit(fwd_fn)
    rng = jax.random.PRNGKey(0)

    def step():
        return float(fwd(model.params, model._batch, rng))

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    # Pipelined dispatch (predict.py's real pattern: the next batch is
    # dispatched before the previous result is pulled, so the ~32 ms tunnel
    # round-trip overlaps device compute): dispatch all steps, sync once.
    # Measured main b8: 107 sync -> 157 pipelined frames/s/chip (round 4).
    for o in [fwd(model.params, model._batch, rng) for _ in range(steps)]:
        float(o)  # warm the async pattern AND drain the queue before timing
    t0 = time.perf_counter()
    outs = [fwd(model.params, model._batch, rng) for _ in range(steps)]
    for o in outs:
        float(o)
    dt_pipe = (time.perf_counter() - t0) / steps
    fl, by = _cost(fwd.lower(model.params, model._batch, rng).compile())
    return dt, dt_pipe, fl, by


def _row(name, dt, items, flops, byts, peak_tflops, hbm_gbps, n_chips):
    dt_chip = dt * n_chips  # per-chip time at per-chip items
    row = {"name": name, "s_per_step": round(dt, 4),
           "items_per_s_per_chip": round(items / dt / n_chips, 4),
           "flops_per_step": flops, "bytes_per_step": byts}
    if byts:
        row["hbm_util_pct"] = round(100.0 * (byts / dt_chip) / (hbm_gbps * 1e9), 1)
    if flops:
        row["mxu_util_pct"] = round(100.0 * (flops / dt_chip) / (peak_tflops * 1e12), 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="sr,main,i2d,translation,"
                                        "serve_main,serve_sr,serve_i2d,"
                                        "serve_translate,sr_batch4")
    ap.add_argument("--warmup", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--serve_batch", type=int, default=8)
    ap.add_argument("--peak_tflops", type=float, default=V5E_PEAK_TFLOPS,
                    help="bf16 MXU peak per chip (v5e default)")
    ap.add_argument("--hbm_gbps", type=float, default=V5E_HBM_GBPS)
    ap.add_argument("--out", default=os.path.join(REPO, "THROUGHPUT.json"))
    args, passthrough = ap.parse_known_args()  # e.g. width/crop overrides

    import jax

    n_chips = max(1, len(jax.devices()))
    rows = []
    for token in [s.strip() for s in args.stages.split(",") if s.strip()]:
        if token.startswith("serve_"):
            stage = token[len("serve_"):]
            dt, dt_pipe, fl, by = _serve(stage, args.serve_batch,
                                         max(args.warmup, 36), args.steps,
                                         passthrough)
            row = _row(f"serve_{stage}_b{args.serve_batch}", dt,
                       args.serve_batch, fl, by,
                       args.peak_tflops, args.hbm_gbps, n_chips)
            # predict.py's async-overlap pattern; the sync-every-step
            # s_per_step above is the per-call latency floor instead
            row["s_per_step_pipelined"] = round(dt_pipe, 4)
            row["items_per_s_per_chip_pipelined"] = round(
                args.serve_batch / dt_pipe / n_chips, 4)
            rows.append(row)
        else:
            extra = ()
            stage = token
            if token == "sr_batch4":  # the remat_blocks capacity option
                stage, extra = "sr", ("--batch_size", "4", "--remat_blocks")
            model, opt, b = _build(stage, extra, passthrough)
            warm = max(args.warmup, 36) if (stage == "sr" and b > 1) else args.warmup
            dt = _time_train(model, warm, args.steps)
            fl, by = _train_cost(model, stage)
            rows.append(_row(token, dt, b, fl, by,
                             args.peak_tflops, args.hbm_gbps, n_chips))
            del model
        print(f"# {rows[-1]}", file=sys.stderr)

    result = {
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "cost_model_caveat": (
            "flops/bytes are XLA cost-analysis estimates of the compiled "
            "program; 'bytes accessed' counts each fusion operand at full "
            "size even when the fusion reads a slice, so *_util_pct can "
            "overcount (translation's composite row exceeding 100% HBM is "
            "this bias, not measurement error). s_per_step and "
            "items_per_s_per_chip are measured ground truth."),
        "n_chips": n_chips,
        "assumed_peak_tflops_bf16": args.peak_tflops,
        "assumed_hbm_gbps": args.hbm_gbps,
        "warmup": args.warmup, "steps": args.steps,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
