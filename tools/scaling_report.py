"""Multi-chip scaling report from the compiled SPMD program.

Real multi-chip hardware is not reachable from this dev box (one tunneled
chip), so the scaling story is derived from the two artifacts that ARE
available and auditable:

1. the actual collectives GSPMD inserts into the compiled train step on an
   n-device mesh (parsed out of the optimized HLO, byte-exact), and
2. the measured single-chip steady-state step time (PERF.md).

The report combines them with the v5e ICI roofline to bound data-parallel
scaling efficiency: per-step all-reduce time on a 1-D ring is
``2*(n-1)/n * bytes / W_axis`` with ``W_axis`` the bidirectional per-axis
ICI bandwidth (2 links x 45 GB/s each way on v5e). Two bounds are printed:
zero overlap (all collective time exposed) and full overlap (GSPMD hides the
gradient all-reduce behind the backward pass, the steady-state behavior for
convnets whose backward is much longer than the reduce).

Usage (virtual CPU mesh, same trick as tests/conftest.py):
    python tools/scaling_report.py --stage main --n 8
    python tools/scaling_report.py --stage main --n 8 --spatial 2
    python tools/scaling_report.py --stage SR --n 4
    python tools/scaling_report.py --stage I2D --n 8
    python tools/scaling_report.py --stage translation --n 8

By default uses shrunk channel widths (fast CPU compile) and CORRECTS the
gradient-all-reduce bytes analytically from the full-width parameter count —
collective bytes for the DP all-reduce depend only on the trainable tree, not
on activations. ``--full_width`` compiles the real widths instead (slow).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# v5e ICI: 4 links/chip (2-D torus), 45 GB/s per link per direction.
# One mesh axis rides 2 links (a bidirectional ring) => 90 GB/s per axis.
ICI_AXIS_GBPS = 90.0

# steady-state single-chip step seconds (PERF.md round-2/3 tables, v5e-1)
MEASURED_STEP_S = {"main": 0.2589, "SR": 0.3653, "I2D": 0.1017, "translation": 0.6537}

# README-shaped training crop per stage (height x width). SR's U-Nets need
# /128 crop dims (the README uses 512x640); the smaller /128 multiple below
# keeps the virtual-CPU compile tractable — collective bytes for the DP
# grad all-reduce depend only on the trainable tree, not the geometry.
DEFAULT_HW = {"main": (384, 512), "SR": (128, 256), "I2D": (384, 512),
              "translation": (256, 256)}

_SHAPE = re.compile(r"(f64|f32|bf16|f16|s32|u32|s16|u16|s8|u8|pred|c64)\[([\d,]*)\]")
_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
          "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "c64": 8}
_COLL = re.compile(
    r"^\s*(?:%\S+ )?(?:\S+ )?=\s*(.*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(", re.M)


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def collect_collectives(hlo_text: str):
    """Sum output bytes of each collective kind in optimized HLO."""
    sums: dict[str, int] = {}
    counts: dict[str, int] = {}
    for m in _COLL.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        b = shape_bytes(shapes)
        sums[kind] = sums.get(kind, 0) + b
        counts[kind] = counts.get(kind, 0) + 1
    return sums, counts


def _stage_argv(stage: str, batch: int, h: int, w: int, small: bool,
                n: int, spatial: int):
    base = ["--name", f"scaling_{stage}", "--checkpoints_dir", "/tmp/desr_scaling",
            "--batch_size", str(batch),
            "--num_devices", str(n), "--spatial_devices", str(spatial),
            "--crop_size_h", str(h), "--crop_size_w", str(w)]
    if stage in ("main", "SR"):
        argv = ["--model_type", "main", "--use_image_for_trans", "--use_masked",
                "--norm_loss", "--w_syn_norm", "0.05"] + base
        if stage == "SR":
            argv.append("--SR")
        if small:
            argv += ["--ImageDepthf_outf", "16", "--ImageDepthf_basef", "8",
                     "--Depthf_outf", "16", "--Depthf_basef", "8",
                     "--I2D_base", "8", "--Task_basef", "8"]
    elif stage == "I2D":
        argv = ["--model_type", "I2D", "--norm_loss"] + base
        if small:
            argv += ["--Imagef_outf", "8", "--Imagef_basef", "8",
                     "--Task_basef", "8"]
    elif stage == "translation":
        argv = ["--model_type", "translation"] + base
        if small:
            argv += ["--ndf", "16"]
    else:
        raise SystemExit(f"unknown stage {stage!r}")
    return argv


def _stage_batch(stage: str, b: int, h: int, w: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    if stage in ("main", "SR", "I2D"):
        ah, aw = (2 * h, 2 * w) if stage == "SR" else (h, w)
        depth_a = rng.uniform(-0.5, 1, (b, ah, aw, 1)).astype(np.float32)
        depth_b = rng.uniform(-0.5, 1, (b, ah, aw, 1)).astype(np.float32)
        depth_b[depth_b < -0.3] = -1.0
        batch = {
            "A_i": rng.uniform(-1, 1, (b, ah, aw, 3)).astype(np.float32),
            "B_i": rng.uniform(-1, 1, (b, ah, aw, 3)).astype(np.float32),
            "A_d": depth_a, "B_d": depth_b,
        }
        if stage != "I2D":
            K = np.tile(np.array([[[577.0, 0, aw / 2], [0, 577, ah / 2],
                                   [0, 0, 1]]], np.float32), (b, 1, 1))
            batch["K_A"] = K
            batch["K_B"] = K.copy()
            batch["crop_A"] = np.tile(np.array([[0, ah, 0, aw]], np.float32), (b, 1))
            ch, cw = (h, w) if stage == "SR" else (ah, aw)
            batch["crop_B"] = np.tile(np.array([[0, ch, 0, cw]], np.float32), (b, 1))
        return batch
    # translation
    da = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db[db < -0.3] = -1.0
    return {
        "A_depth": da,
        "A_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_depth": db,
        "B_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_name": ["a"] * b, "B_name": ["b"] * b,
    }


def _build_model(stage: str, n: int, spatial: int, hw, full_width: bool):
    from desr_tpu.options.train_options import TrainOptions

    h, w = hw
    n_data = n // spatial
    argv = _stage_argv(stage, n_data, h, w, not full_width, n, spatial)
    opt = TrainOptions().parse(argv)
    if stage in ("main", "SR"):
        cls_mod = ("desr_tpu.models.main_sr_model" if stage == "SR"
                   else "desr_tpu.models.main_model")
        cls_name = "MainSRModel" if stage == "SR" else "MainModel"
    elif stage == "I2D":
        cls_mod, cls_name = "desr_tpu.models.i2d_model", "I2DModel"
    else:
        cls_mod, cls_name = "desr_tpu.models.translation_model", "TranslationModel"
    import importlib

    model = getattr(importlib.import_module(cls_mod), cls_name)(opt)
    if stage == "translation" and not full_width:
        # shrunk translators, same trick as tests/test_model_translation.py
        from desr_tpu.models import translation_networks as TN

        gen_opt = TN.default_translator_opt(ngf_img=8, ngf_depth=8, n_blocks=2)
        model.nets["G_A"] = TN.define_Gen(gen_opt, input_type="img_depth")
        model.nets["G_B"] = TN.define_Gen(gen_opt, input_type="img_depth")
    model.setup()
    model.set_input(_stage_batch(stage, n_data, h, w))
    return model


def _lowered_texts(stage: str, model):
    """Optimized-HLO text of every per-iteration train executable."""
    lr = model.lr_scalar()
    if stage == "translation":
        weights = model._weights()
        texts = {"g_step": model._g_step.lower(
            model.params, model.opt_state_G, model._batch, model.step_rng(),
            lr, weights).compile().as_text()}
        if model._d_step is not None:
            texts["d_step"] = model._d_step.lower(
                model.params, model.opt_state_D, model._batch,
                model.step_rng(), lr).compile().as_text()
        return texts
    return {"train_step": model._train_step.lower(
        model.params, model.opt_state_G, model._batch, model.step_rng(),
        lr).compile().as_text()}


def _trainable_count(model) -> int:
    """Trainable parameter count = leaves of the Adam state (m+v) / 2."""
    import jax

    n = sum(int(v.size) for v in jax.tree_util.tree_leaves(model.opt_state_G))
    if getattr(model, "opt_state_D", None) is not None:
        n += sum(int(v.size)
                 for v in jax.tree_util.tree_leaves(model.opt_state_D))
    return n // 2


def full_width_trainable(stage: str, hw) -> int:
    """Full-width trainable parameter count without compiling anything:
    build the full-width model at a tiny spatial size (init + adam_init are
    eager numpy/zeros; the jitted steps are lazy and never traced)."""
    model = _build_model(stage, 1, 1, (64, 64), full_width=True)
    return _trainable_count(model)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="main",
                    choices=["main", "SR", "I2D", "translation"])
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=1)
    ap.add_argument("--hw", default=None, help="crop HxW, e.g. 384x512")
    ap.add_argument("--full_width", action="store_true")
    ap.add_argument("--step_seconds", type=float, default=None,
                    help="measured single-chip step time (default: PERF.md)")
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < args.n or jax.default_backend() != "cpu":
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={args.n}")
        code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
                f"import sys; sys.path.insert(0, {HERE!r}); "
                f"sys.argv = ['scaling_report.py'] + {sys.argv[1:]!r}; "
                "import scaling_report; scaling_report.main()")
        out = subprocess.run([sys.executable, "-c", code],
                             env=env, input="", capture_output=True, text=True,
                             cwd=REPO)
        sys.stdout.write(out.stdout)
        sys.stderr.write(out.stderr)
        raise SystemExit(out.returncode)

    hw = args.hw or "%dx%d" % DEFAULT_HW[args.stage]
    h, w = (int(x) for x in hw.split("x"))
    model = _build_model(args.stage, args.n, args.spatial, (h, w),
                         args.full_width)
    texts = _lowered_texts(args.stage, model)
    sums: dict[str, int] = {}
    counts: dict[str, int] = {}
    for name, text in texts.items():
        s, c = collect_collectives(text)
        print(f"-- {name}: " + (", ".join(
            f"{k} x{c[k]} {s[k] / 1e6:.2f} MB" for k in sorted(s)) or "(none)"))
        for k in s:
            sums[k] = sums.get(k, 0) + s[k]
            counts[k] = counts.get(k, 0) + c[k]

    print(f"\n== compiled SPMD collectives/iteration: stage={args.stage} mesh="
          f"(data={args.n // args.spatial}, spatial={args.spatial}) "
          f"{h}x{w} {'full' if args.full_width else 'shrunk'}-width ==")
    for k in sorted(sums):
        print(f"  {k:<20} x{counts[k]:<4} {sums[k] / 1e6:10.2f} MB")
    if not sums:
        print("  (none)")

    # gradient all-reduce bytes scale with the trainable tree only; correct
    # to full width analytically when the compile used shrunk widths
    ar_bytes = sums.get("all-reduce", 0)
    n_train_small = _trainable_count(model)
    if not args.full_width:
        n_full = full_width_trainable(args.stage, (h, w))
        scale = n_full / max(n_train_small, 1)
        ar_full = ar_bytes * scale
        print(f"  trainable params: shrunk {n_train_small / 1e6:.3f}M -> "
              f"full {n_full / 1e6:.3f}M; grad all-reduce scaled x{scale:.1f} "
              f"to {ar_full / 1e6:.1f} MB")
    else:
        ar_full = ar_bytes

    t1 = args.step_seconds or MEASURED_STEP_S.get(args.stage)
    # pessimistic floor: charge EVERY collective byte to the ICI axis with
    # zero overlap (all-to-all/all-gather/permute bytes don't grow with the
    # data-axis size the way the grad all-reduce does, so this floor is
    # computed at the compiled mesh size and held constant across n)
    other = sum(v for k, v in sums.items() if k != "all-reduce")
    t_other = other / (ICI_AXIS_GBPS * 1e9)
    print(f"\n== DP scaling projection (v5e, {ICI_AXIS_GBPS:.0f} GB/s per mesh "
          f"axis, single-chip step {t1:.4f}s measured; non-all-reduce "
          f"collectives {other / 1e6:.1f} MB -> {t_other * 1e3:.2f} ms "
          f"charged at zero overlap) ==")
    print("  n_chips  t_allreduce   eff(no overlap)   eff(full overlap)")
    for n in (2, 4, 8, 16, 32, 64, 256):
        t_ar = 2 * (n - 1) / n * ar_full / (ICI_AXIS_GBPS * 1e9)
        eff_no = t1 / (t1 + t_ar + t_other)
        eff_full = min(1.0, t1 / max(t1, t_ar))
        print(f"  {n:>7}  {t_ar * 1e3:9.2f} ms   {eff_no:15.1%}   {eff_full:17.1%}")
    cp = sums.get("collective-permute", 0)
    if cp and args.spatial > 1:
        print(f"\n  spatial halo exchange (collective-permute): {cp / 1e6:.2f}"
              f" MB/step -> {cp / (ICI_AXIS_GBPS * 1e9) * 1e6:.1f} us on ICI")
    elif cp:
        print(f"\n  note: {cp / 1e6:.2f} MB of collective-permute at spatial=1 "
              f"— GSPMD layout resharding, not halo exchange; see PERF.md")


if __name__ == "__main__":
    main()
