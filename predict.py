"""Serving CLI: enhance (or x2-SR) a folder of RGB-D frames.

The reference's only inference path is ``main.py --do_test --save_all`` with
its fixed 512x640 test geometry. This dedicated driver is serving-oriented:

- loads the stage-3 checkpoint set (``latest_net_G_A_d.pth`` etc.) from
  ``--checkpoints_dir/--name`` via the tolerant .pth loader
- streams ``--input_depth`` / ``--input_img`` folders, auto-pads each frame
  to the U-Net's /128 geometry, and crops the padding back off before
  writing ``<stem>.png`` uint16-mm predictions
- one jitted forward, batch-sharded over all local chips; ``--num_workers``
  forks a host decode/encode pool so a many-core host can feed the chip
  (the device consumes 157 frames/s at main batch-8 vs ~16 PNG decodes/s
  per host core — PERF.md "Pipelined serving dispatch")

Usage:
    python predict.py --name <exp> --checkpoints_dir checkpoints \
        --input_depth .../depth --input_img .../img --output out/ \
        [--SR] [--batch_size 4] [--compute_dtype bfloat16]

AOT deployment (desr_tpu/serving.py): ``--export DIR`` serializes the pruned
serving graph + weights at the input geometry; ``--from_export DIR`` serves
from such an artifact with no model classes / options / .pth parsing at all.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def pad_to_multiple(arr, mult, axes=(0, 1)):
    pads = [(0, 0)] * arr.ndim
    for ax in axes:
        target = -(-arr.shape[ax] // mult) * mult
        extra = target - arr.shape[ax]
        pads[ax] = (extra // 2, extra - extra // 2)
    return np.pad(arr, pads, mode="reflect"), pads


# ------------------------------------------------------- host worker pool
# Serve-side host work (PNG decode + normalize + pad, and the uint16 PNG
# encodes) is the measured serving bottleneck: the pipelined main-b8 graph
# consumes 157 frames/s/chip while one host core decodes ~16 PNG pairs/s
# (PERF.md "Pipelined serving dispatch"). ``--num_workers`` forks a host
# pool running the EXACT inline helpers below (fork ctx: workers inherit
# the process image; no jax in the decode path), so a many-core serving
# host can feed the chip. Numerics are verified byte-identical vs the
# inline path by tests/test_predict_cli.py::test_predict_workers_parity.
#
# The pool is forked BEFORE the jax import / model construction, so
# workers never inherit a live runtime-client thread pool (fork-after-
# client-init is a latent deadlock/fd-inheritance hazard on the axon
# runtime); cfg ships per-call via functools.partial, keeping the
# children strictly jax-free.


def _init_predict_worker():
    try:
        import cv2

        cv2.setNumThreads(1)  # one OpenCV thread per worker, workers only
    except ImportError:
        pass


def _pad_frame(arr, cfg):
    if cfg["exp_h"] is not None:  # exported artifact: fixed geometry
        pads = [(0, 0)] * arr.ndim
        for ax, target in ((0, cfg["exp_h"]), (1, cfg["exp_w"])):
            extra = target - arr.shape[ax]
            if extra < 0:
                raise ValueError(
                    f"frame {arr.shape[:2]} exceeds the exported geometry "
                    f"({cfg['exp_h']}x{cfg['exp_w']}); re-export for this size")
            pads[ax] = (extra // 2, extra - extra // 2)
        return np.pad(arr, pads, mode="reflect"), pads
    # SR frames pad to /256: the graph's LR branch runs at half size
    # and the U-Nets need the /128 grid THERE (README geometry 1024x1280
    # -> LR 512x640)
    return pad_to_multiple(arr, 256 if cfg["sr"] else 128)


def _decode_frame(pair, cfg):
    """(depth_path, img_path) -> (depth [H,W,1], img [H,W,3], pad_info)."""
    from desr_tpu.data.base_dataset import load_depth_png, load_image
    from desr_tpu.data.transforms import normalize_depth_np, normalize_image_np

    dp, ip = pair
    im = normalize_image_np(load_image(ip)[..., :3].astype(np.float32))
    if cfg["no_depth"]:  # --I2D: no depth input; the jitted graph DCEs A_d/B_d
        d = np.zeros(im.shape[:2], np.float32)
    else:
        d = normalize_depth_np(load_depth_png(dp), cfg["max_distance"])
    d, pads = _pad_frame(d, cfg)
    im, _ = _pad_frame(im, cfg)
    return d[..., None], im, pads


def _encode_frame(out01, path):
    from desr_tpu.utils.util import save_uint16_png

    save_uint16_png(out01, path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default=None,
                        help="experiment name under --checkpoints_dir "
                             "(required unless --from_export)")
    parser.add_argument("--checkpoints_dir", default="./checkpoints")
    parser.add_argument("--epoch", default="latest")
    parser.add_argument("--input_depth", default=None,
                        help="depth frames folder (required except --I2D, "
                             "which predicts from RGB alone)")
    parser.add_argument("--input_img", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--SR", action="store_true")
    parser.add_argument("--I2D", action="store_true",
                        help="serve the stage-1 Image-Guidance nets instead: "
                             "depth predicted from RGB only (loads "
                             "latest_net_Image_f/_Task; reference "
                             "I2D_model.py has no serving path — its only "
                             "dump is the row-cropped --save_all quirk)")
    parser.add_argument("--translate", default=None, choices=["AtoB", "BtoA"],
                        help="serve the stage-2 translation nets instead: "
                             "AtoB applies G_A (syn/HQ -> real/LQ degrader), "
                             "BtoA applies G_B (real/LQ -> syn/HQ) to each "
                             "RGB-D frame (loads latest_net_G_A/_G_B; the "
                             "reference has no translation inference path)")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="frames per device dispatch; batching amortizes "
                             "the per-call dispatch + layout-conversion "
                             "overheads (measured SR serve, v5e-1: batch 1 = "
                             "11.8 frames/s/chip, 4 = 13.6, 8 = 19.6, 16 = "
                             "21.3 — PERF.md 'Serving batch scaling')")
    parser.add_argument("--max_distance", type=float, default=5100.0)
    parser.add_argument("--num_workers", type=int, default=0,
                        help="fork this many host workers: PNG decode + "
                             "normalize + pad and the uint16 PNG writes run "
                             "in the pool, with 2 batches decoded ahead of "
                             "the device. The serve-side host floor is ~16 "
                             "PNG decodes/s/core vs 157 frames/s/chip device "
                             "capability at main batch-8 (PERF.md 'Pipelined "
                             "serving dispatch') — a many-core serving host "
                             "needs this to feed the chip. 0/1 = inline")
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="limit the mesh to the first N chips (0=all); "
                             "data axis = num_devices / spatial_devices")
    parser.add_argument("--spatial_devices", type=int, default=1,
                        help="shard the image H axis over this many chips "
                             "(data x spatial mesh): chips cooperate on one "
                             "large frame instead of one frame per chip")
    parser.add_argument("--export", default=None, metavar="DIR",
                        help="AOT-export the serving graph+weights for the "
                             "input geometry to DIR (jax.export artifact; see "
                             "desr_tpu/serving.py) instead of predicting")
    parser.add_argument("--from_export", default=None, metavar="DIR",
                        help="serve from an exported artifact: no options "
                             "system, model classes or .pth parsing — just "
                             "the serialized graph + npz weights")
    parser.add_argument("--net_args", nargs=argparse.REMAINDER, default=[],
                        help="extra net-architecture flags forwarded to the model")
    args = parser.parse_args(argv)
    if args.name is None and not args.from_export:
        parser.error("--name is required unless serving --from_export")
    if args.I2D and (args.SR or args.export or args.from_export):
        parser.error("--I2D is a standalone mode (no --SR/--export/--from_export)")
    if args.translate and (args.SR or args.I2D or args.export or args.from_export):
        parser.error("--translate is a standalone mode "
                     "(no --SR/--I2D/--export/--from_export)")
    if args.input_depth is None and not args.I2D:
        parser.error("--input_depth is required (omit only with --I2D)")

    # fork the host pool FIRST: the children must never inherit a live jax
    # client (see the worker-pool comment above)
    pool, writes = None, []
    if args.num_workers > 1 and hasattr(os, "fork"):
        import multiprocessing

        ctx = multiprocessing.get_context("fork")
        pool = ctx.Pool(args.num_workers, initializer=_init_predict_worker)

    import jax

    from desr_tpu.options.train_options import TrainOptions
    from desr_tpu.data.base_dataset import load_depth_png

    if args.from_export:
        from desr_tpu.serving import load_serving
        exp_fn, exp_params, manifest = load_serving(args.from_export)
        args.SR = manifest["sr"]
        exp_b, exp_h, exp_w = manifest["batch"]["A_d"][0][:3]
        if args.batch_size != exp_b:
            print(f"[from_export] batch_size -> {exp_b} (artifact geometry)",
                  file=sys.stderr)
            args.batch_size = exp_b
        model = None
        run = lambda batch: exp_fn(exp_params, batch, 0)
    else:
        exp_h = exp_w = None
        model_type = ("translation" if args.translate
                      else "I2D" if args.I2D else "main")
        model_argv = [
            "--model_type", model_type, "--name", args.name,
            "--checkpoints_dir", args.checkpoints_dir,
            "--use_image_for_trans", "--use_masked",
            "--compute_dtype", args.compute_dtype,
            "--batch_size", str(args.batch_size),
            "--epoch", str(args.epoch), "--continue_train",
            "--spatial_devices", str(args.spatial_devices),
            # export records 1-device shardings; live serving uses the mesh
            "--num_devices", "1" if args.export else str(args.num_devices),
            # serving only consumes the real branch: with the branches UNbatched
            # (separate shared-weight applies instead of one concat-2B call),
            # returning only pred_real lets XLA dead-code-eliminate the entire
            # synthetic branch — translator + syn guidance + syn fusion head
            "--no_batched_branches",
        ] + (["--SR"] if args.SR else []) + list(args.net_args)
        if args.SR and "--crop_size_h" not in args.net_args:
            # the SR graph's internal LR geometry must be half the (padded)
            # input frame (hr_hw == input grid, main_sr_model lr_hw/hr_hw);
            # derive it from the first frame instead of crashing on the
            # default crop flags
            first = sorted(glob.glob(os.path.join(args.input_depth, "*")))
            assert first, f"no depth frames in {args.input_depth}"
            d0 = load_depth_png(first[0])
            ph, _ = pad_to_multiple(np.zeros(d0.shape[:2], np.float32), 256)
            model_argv += ["--crop_size_h", str(ph.shape[0] // 2),
                           "--crop_size_w", str(ph.shape[1] // 2)]
        opt = TrainOptions().parse(model_argv)

        if args.SR:
            from desr_tpu.models.main_sr_model import MainSRModel as Model
        elif args.I2D:
            from desr_tpu.models.i2d_model import I2DModel as Model
        elif args.translate:
            from desr_tpu.models.translation_model import TranslationModel as Model
        else:
            from desr_tpu.models.main_model import MainModel as Model
        model = Model(opt)
        model.setup()
        # return ONLY the real-branch prediction: XLA dead-code-eliminates the
        # whole synthetic branch (translator G_A_d + pred_syn head for main;
        # the syn Image_f/Task pass for I2D; the untranslated direction +
        # cycle/normal tensors for --translate) that the train-time forward
        # computes for the loss zoo — roughly half the serving FLOPs — and
        # the transfer pulls one tensor, not the full dict
        if args.translate:
            gen_forward = model._forward_fns()
            key = "fake_depth_B" if args.translate == "AtoB" else "fake_depth_A"
            remap = lambda b: {"A_depth": b["A_d"], "A_img": b["A_i"],
                               "B_depth": b["B_d"], "B_img": b["B_i"]}
            fwd = jax.jit(lambda p, b, r: gen_forward(p, remap(b), r, False)[key])
        elif args.I2D:  # I2D forward returns a tuple; [3] = pred_real (B,H,W,1)
            forward = model._forward_fn()
            fwd = jax.jit(lambda p, b, r: forward(p, b, r, False)[3][..., 0])
        else:
            forward = model._forward_fn()
            key = "pred_real_depth_hr" if args.SR else "pred_real_depth"
            fwd = jax.jit(lambda p, b, r: forward(p, b, r, False)[key])
        rng0 = jax.random.PRNGKey(0)
        run = lambda batch: fwd(model.params, model.shard(batch), rng0)

    img_paths = sorted(glob.glob(os.path.join(args.input_img, "*")))
    if args.input_depth is None:  # --I2D from RGB alone: stems from images
        depth_paths = img_paths
    else:
        depth_paths = sorted(glob.glob(os.path.join(args.input_depth, "*")))
    assert len(depth_paths) == len(img_paths), "depth/img folder size mismatch"
    os.makedirs(args.output, exist_ok=True)

    K = np.array([[577.0, 0, 320], [0, 577, 240], [0, 0, 1]], np.float32)
    # the SR prediction lives on the INPUT grid (the reference SR dataflow
    # feeds the HR canvas and predicts on it, main_sr_model.py:228-265;
    # ours: pred_real_depth_hr has batch['B_d']'s shape) — pad offsets map
    # 1:1 onto the output in BOTH modes. (A 2x pad crop here used to shrink
    # padded SR outputs; caught by driving predict.py --SR on a 200x200
    # frame: 144x144 came out.)
    scale = 1
    n_done = 0
    cfg = {"sr": args.SR, "exp_h": exp_h, "exp_w": exp_w,
           "no_depth": args.input_depth is None,
           "max_distance": args.max_distance}
    import functools

    decode = functools.partial(_decode_frame, cfg=cfg)

    def chunk_pairs(i):
        return list(zip(depth_paths[i : i + args.batch_size],
                        img_paths[i : i + args.batch_size]))

    def assemble(frames, i):
        depths = [f[0] for f in frames]
        imgs = [f[1] for f in frames]
        pad_infos = [f[2] for f in frames]
        stems = [os.path.splitext(os.path.basename(dp))[0]
                 for dp in depth_paths[i : i + args.batch_size]]
        while args.from_export and len(depths) < args.batch_size:
            depths.append(depths[-1])  # pad the tail chunk to the exported
            imgs.append(imgs[-1])      # batch size; extras are not written
        b = len(depths)
        h, w = depths[0].shape[:2]
        batch = {
            "A_d": np.stack(depths), "B_d": np.stack(depths),
            "A_i": np.stack(imgs).astype(np.float32), "B_i": np.stack(imgs).astype(np.float32),
            "K_A": np.tile(K[None], (b, 1, 1)), "K_B": np.tile(K[None], (b, 1, 1)),
            "crop_A": np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1)),
            "crop_B": np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1)),
        }
        return batch, pad_infos, stems

    if args.export:
        from desr_tpu.serving import export_serving
        batch, _, _ = assemble([decode(p) for p in chunk_pairs(0)], 0)
        key = "pred_real_depth_hr" if args.SR else "pred_real_depth"
        manifest = export_serving(
            model, batch, args.export, key,
            provenance={"name": args.name, "epoch": str(args.epoch),
                        "net_args": list(args.net_args)})
        print(f"exported serving artifact to {args.export}: "
              f"{json.dumps(manifest['batch'])}")
        return

    def write_preds(preds, pad_infos, stems):
        nonlocal n_done
        for j, stem in enumerate(stems):
            (t, bpad), (l, rpad) = pad_infos[j][0], pad_infos[j][1]
            p = preds[j]
            p = p[t * scale : p.shape[0] - bpad * scale,
                  l * scale : p.shape[1] - rpad * scale]
            out01 = np.clip((p + 1) / 2, 0, 1)
            path = os.path.join(args.output, f"{stem}.png")
            if pool is not None:  # PNG encode off the dispatch thread
                # backpressure: if encodes lag the device, wait on the oldest
                # instead of queuing unbounded full-res float frames
                while len(writes) >= 2 * args.num_workers:
                    writes.pop(0).get()
                writes.append(pool.apply_async(_encode_frame, (out01, path)))
            else:
                _encode_frame(out01, path)
            n_done += 1
        print(f"{n_done}/{len(depth_paths)} frames", file=sys.stderr)

    def decoded_chunks():
        starts = list(range(0, len(depth_paths), args.batch_size))
        if pool is None:
            for i in starts:
                yield assemble([decode(p) for p in chunk_pairs(i)], i)
            return
        from collections import deque

        dq, ci = deque(), 0  # 2 chunks decoding ahead of the device
        while ci < len(starts) or dq:
            while ci < len(starts) and len(dq) < 2:
                dq.append((pool.map_async(decode, chunk_pairs(starts[ci])),
                           starts[ci]))
                ci += 1
            fut, i = dq.popleft()
            yield assemble(fut.get(), i)

    # 1-deep pipeline over jax's async dispatch: batch i is decoded and
    # dispatched BEFORE batch i-1's result is pulled, so host PNG decode +
    # uint16 writes overlap the device forward of the in-flight batch
    pending = None
    for batch, pad_infos, stems in decoded_chunks():
        preds = run(batch)
        if pending is not None:
            write_preds(np.asarray(pending[0]), pending[1], pending[2])
        pending = (preds, pad_infos, stems)
    if pending is not None:
        write_preds(np.asarray(pending[0]), pending[1], pending[2])
    for w in writes:
        w.get()  # surface any worker-side encode error
    if pool is not None:
        pool.close()
        pool.join()
    print(f"wrote {n_done} predictions to {args.output}")


if __name__ == "__main__":
    main()
