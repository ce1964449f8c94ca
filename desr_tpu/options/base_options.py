"""Options system: the reference's CLI flag surface, preserved.

The README commands of the reference are its de-facto public API; this parser
accepts the same flags with the same defaults (reference: options/base_options.py
:22-59 and options/train_options.py:13-164), plus TPU-specific extensions
(``--compute_dtype``, ``--seed``, ``--i2d_train_features``, ``--num_devices``).

Dynamic per-model flag injection (base_options.py:63-90) is reproduced via
``modify_commandline_options`` hooks on the model registry.
"""

from __future__ import annotations

import argparse
import os


class BaseOptions:
    def __init__(self):
        self.initialized = False
        self.isTrain = False

    def initialize(self, parser):
        # basic parameters (reference base_options.py:22-59)
        parser.add_argument("--dataroot", default="./")
        parser.add_argument("--name", type=str, default="experiment_name")
        parser.add_argument("--gpu_ids", type=str, default="0",
                            help="kept for CLI compat; device selection is via jax")
        parser.add_argument("--model_type", type=str, default="I2D",
                            help="[I2D | main | translation]")
        parser.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
        parser.add_argument("--model", type=str, default="cycle_gan",
                            help="decorative in the reference too (SURVEY §2.12)")
        parser.add_argument("--input_nc", type=int, default=3)
        parser.add_argument("--output_nc", type=int, default=3)
        parser.add_argument("--ngf", type=int, default=64)
        parser.add_argument("--ndf", type=int, default=64)
        parser.add_argument("--netD", type=str, default="basic")
        parser.add_argument("--netG", type=str, default="resnet_9blocks")
        parser.add_argument("--n_layers_D", type=int, default=3)
        parser.add_argument("--norm", type=str, default="instance")
        parser.add_argument("--use_spnorm", action="store_true", default=False)
        parser.add_argument("--init_type", type=str, default="normal")
        parser.add_argument("--init_gain", type=float, default=0.02)
        parser.add_argument("--no_dropout", action="store_true")
        # dataset parameters
        parser.add_argument("--dataset_mode", type=str, default="unaligned")
        parser.add_argument("--direction", type=str, default="AtoB")
        parser.add_argument("--serial_batches", action="store_true")
        parser.add_argument("--num_threads", default=4, type=int)
        parser.add_argument("--batch_size", type=int, default=1)
        parser.add_argument("--batch_size_val", type=int, default=1)
        parser.add_argument("--load_size", type=int, default=286)
        parser.add_argument("--crop_size", type=int, default=256)
        parser.add_argument("--max_dataset_size", type=int, default=2 ** 31)
        parser.add_argument("--preprocess", type=str, default="resize_and_crop")
        parser.add_argument("--no_flip", action="store_true")
        parser.add_argument("--display_winsize", type=int, default=256)
        # additional parameters
        parser.add_argument("--epoch", type=str, default="latest")
        parser.add_argument("--load_iter", type=int, default=0)
        parser.add_argument("--verbose", action="store_true")
        parser.add_argument("--suffix", default="", type=str)
        # TPU-native extensions
        parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                            help="bfloat16 | float32 compute precision")
        parser.add_argument("--seed", type=int, default=0)
        parser.add_argument("--i2d_train_features", action="store_true",
                            help="also optimize Image_f in stage 1 (the reference "
                                 "as-shipped trains only Task, I2D_model.py:143)")
        parser.add_argument("--spatial_devices", type=int, default=1,
                            help="shard the image H axis over this many mesh "
                                 "columns (2-D data x spatial mesh); chips "
                                 "cooperate on single large frames")
        parser.add_argument("--num_devices", type=int, default=0,
                            help="limit the data mesh to the first N devices (0=all)")
        parser.add_argument("--steps_per_call", type=int, default=1,
                            help="optimizer steps per device dispatch: the "
                                 "train step runs as a lax.scan over N stacked "
                                 "batches, amortizing host dispatch latency "
                                 "(trajectory identical to N single steps)")
        parser.add_argument("--compiler_option", action="append", default=None,
                            metavar="KEY=VALUE",
                            help="per-program XLA compiler option for the train "
                                 "steps (repeatable), e.g. "
                                 "xla_tpu_scoped_vmem_limit_kib=65536")
        parser.add_argument("--fused_iter", action="store_true",
                            help="translation stage: run the whole "
                                 "num_iter_gen x G + num_iter_dis x D "
                                 "iteration as ONE jitted dispatch")
        parser.add_argument("--no_donate", action="store_true",
                            help="disable buffer donation in train steps "
                                 "(diagnostic; costs duplicate param buffers)")
        parser.add_argument("--profile_dir", type=str, default="",
                            help="write a jax.profiler trace of the run to this dir")
        parser.add_argument("--pallas_losses", action="store_true",
                            help="compute the (task, holes, holes_l2) loss "
                                 "triplets with the fused one-pass pallas "
                                 "kernel (ops/pallas_kernels.py)")
        parser.add_argument("--remat", action="store_true",
                            help="jax.checkpoint the heavy nets in the train step "
                                 "(trade ~30%% recompute for activation HBM; needed "
                                 "for full-resolution SR fine-tune batches)")
        parser.add_argument("--remat_tails", dest="remat_tails",
                            action="store_true", default=None,
                            help="scoped remat: save only conv outputs, recompute "
                                 "norm/activation tails in the backward pass "
                                 "(identical math - jax.checkpoint). Default is "
                                 "per-stage from hardware A/B: ON for SR (+10%%), "
                                 "I2D (+4%%) and translation (+4%%), OFF for the "
                                 "main stage (-7%% there)")
        parser.add_argument("--no_remat_tails", dest="remat_tails",
                            action="store_false",
                            help="disable the scoped tail remat (A/B switch)")
        parser.add_argument("--device_aug", action="store_true",
                            help="run the augmentation (ColorJitter + rotate/"
                                 "crop/flip) ON DEVICE; the host keeps decode "
                                 "+ resize. Same parameter stream as the host "
                                 "chain; crop/flip bit-exact, jitter within 1 "
                                 "uint8 LSB, rotation via the gather-free "
                                 "Paeth three-shear resampler (same map, "
                                 "different kernel than cv2 — PERF.md). "
                                 "Doubles the per-core host feed capacity. "
                                 "SR: the host ships decoded native-size "
                                 "frames and the full-canvas INTER_AREA "
                                 "resize+pad+crop runs on device (cv2-exact "
                                 "matmul resize); requires per-folder "
                                 "homogeneous source geometry (one compiled "
                                 "variant per distinct size)")
        parser.add_argument("--remat_blocks", action="store_true",
                            help="block-scoped remat: checkpoint each run of "
                                 "conv/norm/act layers so only run INPUTS "
                                 "survive to the backward pass (the convs are "
                                 "recomputed; strictly fewer residual bytes "
                                 "than --remat_tails at one extra forward conv "
                                 "pass). U-Net levels checkpoint their pre/"
                                 "post-submodule spans independently "
                                 "(A/B switch; takes precedence over "
                                 "--remat_tails)")
        parser.add_argument("--pallas_conv", dest="pallas_conv",
                            action="store_true", default=None,
                            help="route the 3x3 ring-base convs through the "
                                 "hand-tiled pallas im2col kernel "
                                 "(ops/pallas_conv.py). Microbenched 1.1-1.3x "
                                 "vs XLA's lowering on the 128/256-ch resnet "
                                 "block shapes on v5e; single-device meshes "
                                 "only (no SPMD partitioning rule). Default "
                                 "per-stage from hardware A/B")
        parser.add_argument("--no_pallas_conv", dest="pallas_conv",
                            action="store_false",
                            help="disable the pallas conv routing (A/B switch)")
        parser.add_argument("--pallas_fuse", dest="pallas_fuse",
                            action="store_true", default=None,
                            help="fuse [conv -> InstanceNorm/GroupNorm -> "
                                 "ReLU -> conv ...] chains through the pallas "
                                 "kernel: norm moments come out of the conv's "
                                 "MXU epilogue and the normalize(+ReLU) is "
                                 "applied during the next conv's band DMA, so "
                                 "neither the stats read nor the normalized "
                                 "activation ever touches HBM. Single-device "
                                 "meshes only. Default per-stage from "
                                 "hardware A/B")
        parser.add_argument("--no_pallas_fuse", dest="pallas_fuse",
                            action="store_false",
                            help="disable the pallas chain fusion (A/B switch)")
        parser.add_argument("--pallas_fuse_frozen", dest="pallas_fuse",
                            action="store_const", const="frozen",
                            help="fuse chains only in FROZEN nets (forward-"
                                 "only: the stage-2 translator and stage-1 "
                                 "guidance nets in main/SR). Trained nets "
                                 "keep the XLA path — their backward convs "
                                 "otherwise inherit pallas-forced layouts "
                                 "(profiled: doubled async-copy traffic)")
        parser.add_argument("--fused_pad", action="store_true",
                            help="enable the border-strip pad+conv fusion "
                                 "(measured 9%% slower than XLA's pad lowering "
                                 "at SR shape on v5e; kept as an A/B switch)")
        parser.add_argument("--no_batched_branches", action="store_true",
                            help="run the real/syn branches as separate net "
                                 "calls instead of one batch-2B call "
                                 "(A/B switch; identical math either way)")
        parser.add_argument("--no_split_conv", action="store_true",
                            help="disable the channel-split Task input conv and "
                                 "materialize the input concatenate (A/B switch)")
        parser.add_argument("--row_tap", action="store_true",
                            help="decompose large-kernel big-channel convs "
                                 "into k row convs (measured 0.468 vs 0.407 "
                                 "s/step on v5e even with dtype accumulation; "
                                 "A/B switch)")
        parser.add_argument("--phase_convt", action="store_true",
                            help="subpixel phase decomposition of stride-2 "
                                 "transposed convs (measured 7%% slower than "
                                 "XLA's lhs-dilation on v5e; A/B switch)")
        parser.add_argument("--no_ring_pad", action="store_true",
                            help="disable the additive ring-correction "
                                 "formulation of reflect/replicate-pad(1) + "
                                 "3x3 convs (A/B switch)")
        parser.add_argument("--no_tap_conv", action="store_true",
                            help="disable the tap-decomposed formulation of "
                                 "large-kernel small-channel convs (7x7 heads/"
                                 "stems) that keeps the MXU lanes busy "
                                 "(A/B switch)")
        parser.add_argument("--fold_norm", action="store_true",
                            help="normalize as one FMA x*scale+shift with f32 "
                                 "per-(batch,channel) vectors (Instance/Group"
                                 "Norm) so the backward keeps only x as the "
                                 "full-tensor residual, not x AND (x-mean) "
                                 "(A/B switch)")
        parser.add_argument("--bf16_tail", action="store_true",
                            help="keep net outputs feeding the loss tail in "
                                 "bf16 instead of fp32 copies (A/B switch; "
                                 "loss math still promotes to fp32 against "
                                 "the fp32 targets — halves the VJP "
                                 "residuals at the net/loss boundary)")
        parser.add_argument("--bf16_normals", action="store_true",
                            help="run the K-based surface-normal chain in "
                                 "bf16 (A/B switch; default fp32 is "
                                 "validated < 2e-3 vs the fp64 oracle)")
        parser.add_argument("--no_onepass_stats", action="store_true",
                            help="use two-pass mean/mean-sq InstanceNorm stats "
                                 "instead of the one-pass variadic reduce (A/B switch)")
        parser.add_argument("--compile_cache_dir", type=str,
                            default=os.path.join(
                                os.path.expanduser("~"), ".cache", "desr_tpu",
                                "xla"),
                            help="persistent XLA compilation cache directory; "
                                 "compiled train/eval executables are stored "
                                 "and replayed across process restarts "
                                 "(measured: works through the tunneled axon "
                                 "backend, turning 5-20 min recompiles into "
                                 "sub-second cache reads). Pass '' to disable")
        self.initialized = True
        return parser

    def gather_options(self, argv=None):
        if not self.initialized:
            parser = argparse.ArgumentParser(
                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
            parser = self.initialize(parser)
        opt, _ = parser.parse_known_args(argv)
        from desr_tpu.models import get_option_setter

        model_option_setter = get_option_setter(opt.model_type)
        parser = model_option_setter(parser, self.isTrain)
        opt, _ = parser.parse_known_args(argv)

        # dataset-level flag injection keyed on --dataset_mode (reference
        # base_options.py:82-85). With the default 'unaligned' this is a
        # no-op — which is why translation_dataset's max_distance=5100
        # never reaches the model there either (translation_model.py note).
        from desr_tpu.data import get_option_setter as data_option_setter

        parser = data_option_setter(opt.dataset_mode)(parser, self.isTrain)
        self.parser = parser
        return parser.parse_args(argv)

    def print_options(self, opt):
        message = "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = f"\t[default: {default}]"
            message += "{:>25}: {:<30}{}\n".format(str(k), str(v), comment)
        message += "----------------- End -------------------"
        print(message)
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(expr_dir, exist_ok=True)
        phase = getattr(opt, "phase", "test")
        with open(os.path.join(expr_dir, f"{phase}_opt.txt"), "wt") as f:
            f.write(message + "\n")

    @staticmethod
    def _host_cpu_tag():
        """Short fingerprint of THIS host's CPU feature set.

        XLA:CPU's cache key does NOT include the compile machine's features,
        so a persistent-cache entry AOT-compiled on one host can be replayed
        on a host lacking those ISA extensions and SIGILL (observed as
        wall-to-wall 'Compile machine features ... doesn't match' warnings in
        the 8-device dryrun artifact). Namespacing the CPU-backend cache by
        host features makes cross-machine replay structurally impossible.
        """
        import hashlib
        import platform

        feats = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:  # x86 'flags' / arm64 'Features' of cpu 0
                    if line.startswith(("flags", "Features")):
                        feats = line
                        break
        except OSError:
            pass
        return hashlib.sha1((platform.machine() + feats).encode()).hexdigest()[:12]

    @classmethod
    def apply_compile_cache(cls, cache_dir):
        """Point JAX's persistent compilation cache at ``cache_dir``.

        Process-global, so applied once at option-parse time. The PJRT-level
        cache stores the serialized executable keyed by (program, backend,
        compile options); on the tunneled axon TPU it replays the remotely
        compiled train steps across restarts (tools/probe_compile_cache.py:
        compile 1.01 s -> 0.16 s, process total 132.6 s -> 6.5 s).

        When the effective backend is XLA:CPU (tests, dryruns, quality_eval),
        the cache lives under a per-host ``cpu-<feature-hash>/`` subdirectory
        — see _host_cpu_tag for why (machine-feature SIGILL hazard).
        """
        cache_dir = os.environ.get("DESR_COMPILE_CACHE_DIR", cache_dir)
        if not cache_dir:
            return
        import jax

        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS") or "")
        if "cpu" in platforms.lower():
            cache_dir = os.path.join(cache_dir, "cpu-" + cls._host_cpu_tag())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    def parse(self, argv=None):
        opt = self.gather_options(argv)
        opt.isTrain = self.isTrain
        self.apply_compile_cache(getattr(opt, "compile_cache_dir", ""))
        if opt.suffix:
            opt.name = opt.name + "_" + opt.suffix.format(**vars(opt))
        self.print_options(opt)
        opt.gpu_ids = [int(s) for s in str(opt.gpu_ids).split(",") if int(s) >= 0] \
            if isinstance(opt.gpu_ids, str) else opt.gpu_ids
        self.opt = opt
        return opt
