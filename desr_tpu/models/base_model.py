"""BaseModel: the trainer-facing contract shared by all four stage models.

Mirrors the reference's BaseModel surface (models/base_model.py:8-268):
``set_input`` / ``optimize_parameters`` / ``calculate`` / ``setup`` /
``save_networks`` / ``load_networks`` / ``get_current_losses`` /
``get_current_visuals`` / ``update_learning_rate`` / ``print_networks`` /
``eval`` / ``_train`` — but the implementation is functional JAX: each model
compiles ONE jitted, data-parallel train step (and one eval step) over a
``jax.sharding.Mesh``; parameters are flat torch-keyed dicts per net; there is
no reflection over ``loss_<name>`` attributes — steps return a metrics dict.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from desr_tpu import checkpoints as ckpt
from desr_tpu.ops.optim import lr_schedule
from desr_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                    shard_batch_steps)

NON_TRAINABLE_MARKERS = ("running_mean", "running_var", "num_batches_tracked",
                         "weight_u", "weight_v")


def split_trainable(params: Dict[str, jnp.ndarray]):
    """Split a flat net-param dict into (trainable, aux/non-trainable)."""
    train, aux = {}, {}
    for k, v in params.items():
        (aux if k.endswith(NON_TRAINABLE_MARKERS) else train)[k] = v
    return train, aux


class _CompileWithOptions:
    """Defer to lowered.compile(compiler_options=...) on first call.

    jax.jit has no compiler-options argument; explicit lower+compile is the
    PJRT path that carries per-program XLA options (e.g.
    xla_tpu_scoped_vmem_limit_kib) to the backend compiler.
    """

    def __init__(self, jitted, options):
        self._jit = jitted
        self._options = options
        self._exe = None

    def lower(self, *args, **kw):
        return self._jit.lower(*args, **kw)

    def __call__(self, *args):
        if self._exe is None:
            self._exe = self._jit.lower(*args).compile(
                compiler_options=self._options)
        return self._exe(*args)


class BaseModel:
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", True)
        self.model_names = []
        self.loss_names = []
        self.visual_names = []
        self.nets = {}
        self.params = {}
        self.metrics = {}
        self.visuals = {}
        n_dev = getattr(opt, "num_devices", 0)
        devices = jax.devices()[:n_dev] if n_dev and n_dev > 0 else None
        self.mesh = make_mesh(devices, spatial=getattr(opt, "spatial_devices", 1))
        dt = getattr(opt, "compute_dtype", "bfloat16")
        self.compute_dtype = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                              "float32": jnp.float32, "f32": jnp.float32}[dt]
        self.lr = getattr(opt, "lr", 2e-4)
        self._batch = None
        self._rng = jax.random.PRNGKey(getattr(opt, "seed", 0))
        if getattr(opt, "remat_tails", None) is None:
            # per-stage hardware A/B default (see --remat_tails help);
            # models override _default_remat_tails
            opt.remat_tails = self._default_remat_tails
        if getattr(opt, "pallas_conv", None) is None:
            # per-stage hardware A/B default (see --pallas_conv help);
            # models override _default_pallas_conv
            opt.pallas_conv = (self._default_pallas_conv
                               and self.mesh.size == 1)
        if getattr(opt, "pallas_fuse", None) is None:
            opt.pallas_fuse = (self._default_pallas_fuse
                               if self.mesh.size == 1 else False)

    _default_remat_tails = True
    _default_pallas_conv = False
    _default_pallas_fuse = False

    # -- lifecycle ---------------------------------------------------------

    def init_params(self, seed=0):
        key = jax.random.PRNGKey(seed)
        for i, name in enumerate(self.model_names):
            self.params[name] = self.nets[name].init(jax.random.fold_in(key, i))

    def setup(self, opt=None):
        """Init + (maybe) restore, mirroring base_model.py:78-89."""
        opt = opt or self.opt
        self.init_params(getattr(opt, "seed", 0))
        if not self.isTrain or getattr(opt, "continue_train", False):
            load_iter = getattr(opt, "load_iter", 0)
            suffix = f"iter_{load_iter}" if load_iter > 0 else getattr(opt, "epoch", "latest")
            self.load_networks(suffix)
        self.params = {k: replicate(v, self.mesh) for k, v in self.params.items()}
        self._post_setup()
        self.print_networks(getattr(opt, "verbose", False))

    def _post_setup(self):
        """Hook for models to build optimizer state after params exist."""

    def jit_train(self, fn, donate=(0, 1)):
        """jit a train step, donating (params, opt_state) unless --no_donate.

        With ``--compiler_option key=value`` (repeatable), the program is
        lowered and compiled with those XLA options on first call — the only
        channel that reaches a remote (tunneled) TPU compiler; XLA_FLAGS env
        vars do not (PERF.md).
        """
        donate = () if getattr(self.opt, "no_donate", False) else donate
        jitted = jax.jit(fn, donate_argnums=donate)
        opts = getattr(self.opt, "compiler_option", None)
        if opts:
            kv = dict(o.split("=", 1) for o in opts)
            return _CompileWithOptions(jitted, kv)
        return jitted

    def jit_train_scan(self, train_step):
        """Multi-step train program: ``lax.scan`` of the single step.

        One dispatch drives N optimizer steps entirely on device — the
        host-side per-call dispatch latency (~32 ms on tunneled runtimes,
        PERF.md) is paid once per N steps instead of once per step. The RNG
        key threads through the scan carry exactly as through N sequential
        calls, so the parameter trajectory is bit-identical to N single-step
        calls (tests/test_multi_step.py). Returns the LAST step's metrics
        (selected inside jit; per-step metric stacks would cost N eager
        device reads per log line).
        """
        def train_scan(params, opt_state, batches, rng, lr):
            def body(carry, batch):
                p, o, r = carry
                p, o, m, r = train_step(p, o, batch, r, lr)
                return (p, o, r), m
            (params, opt_state, rng), ms = jax.lax.scan(
                body, (params, opt_state, rng), batches)
            last = jax.tree_util.tree_map(lambda v: v[-1], ms)
            return params, opt_state, last, rng

        return self.jit_train(train_scan)

    # --direction BtoA swaps the syn<->real domains at set_input: the
    # reference binds syn_* to A_* keys iff direction == 'AtoB'
    # (I2D_model.py:152-159, main_model.py:187-194, main_sr_model.py:210-217).
    # ONLY the image/depth tensors swap — K_A/K_B/crop_*/A_paths/B_paths stay
    # bound to their literal keys in all three models (main_model.py:196-199),
    # and the translation model ignores the flag entirely.
    _DIRECTION_SWAP = {"A_i": "B_i", "B_i": "A_i", "A_d": "B_d", "B_d": "A_d"}

    def apply_direction(self, batch):
        if getattr(self.opt, "direction", "AtoB") == "AtoB":
            return batch
        out = dict(batch)
        for dst, src in self._DIRECTION_SWAP.items():
            if src in batch:
                out[dst] = batch[src]
        return out

    def supports_multi_step(self):
        """Whether optimize_parameters_multi may be used (see trainer loop)."""
        return getattr(self, "_train_scan", None) is not None

    def optimize_parameters_multi(self, batches, iters):
        """Run len(batches) optimizer steps in ONE device dispatch.

        ``batches`` is a list of host batch dicts (as fed to set_input);
        ``iters`` is the iteration counter AFTER this group. Semantically
        identical to calling set_input+optimize_parameters per batch.
        """
        keys = getattr(self, "_input_keys", None)
        if keys:
            batches = [{k: b[k] for k in keys}
                       for b in map(self.apply_direction, batches)]
        stacked = shard_batch_steps(batches, self.mesh)
        self.params, self.opt_state_G, m, new_rng = self._train_scan(
            self.params, self.opt_state_G, stacked, self.step_rng(), self.lr_scalar())
        self.set_step_rng(new_rng)
        self.metrics = m

    def lower_train_step(self):
        """Lower (without executing) the jitted train step on the current batch.

        Diagnostics hook: tools/hlo_bytes.py ranks the compiled HLO's
        instructions by HBM-byte estimates. Requires setup() + set_input().
        """
        return self._train_step.lower(self.params, self.opt_state_G, self._batch,
                                      self.step_rng(), self.lr_scalar())

    # -- checkpoints ---------------------------------------------------------

    def save_dir(self):
        return os.path.join(self.opt.checkpoints_dir, self.opt.name)

    def save_networks(self, epoch):
        ckpt.save_networks(self.params, self.opt.checkpoints_dir, self.opt.name, epoch)

    def load_networks(self, epoch):
        self.params = ckpt.load_networks(self.params, self.opt.checkpoints_dir,
                                         self.opt.name, epoch)

    # -- train/eval mode (API parity; our eval steps are separate functions) --

    def eval(self):
        self._train_mode = False

    def _train(self):
        self._train_mode = True

    def test(self):
        """Forward without gradients (reference base_model.py:105-113);
        functionally identical to calculate(stage='test') here."""
        self.calculate(stage="test")

    # -- metrics -------------------------------------------------------------

    def next_rng(self):
        """Eager key split — AVOID in hot loops (each eager op is a remote
        round trip on tunneled backends); hot steps thread the key through the
        jitted program instead (see step_rng/lr_scalar)."""
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def step_rng(self):
        """Device-resident key for jitted steps that RETURN the next key."""
        return self._rng

    def set_step_rng(self, new_rng):
        self._rng = new_rng

    def lr_scalar(self):
        """Cached device scalar for the current lr (no per-step device_put)."""
        if getattr(self, "_lr_dev_val", None) != self.lr:
            self._lr_dev = jnp.float32(self.lr)
            self._lr_dev_val = self.lr
        return self._lr_dev

    def get_current_losses(self):
        return {k: float(v) for k, v in self.metrics.items() if k in self.loss_names}

    def get_all_metrics(self):
        return {k: float(v) for k, v in self.metrics.items()}

    def get_current_visuals(self):
        return {k: np.asarray(v) for k, v in self.visuals.items()}

    def compute_visuals(self):
        pass

    def update_learning_rate(self, epoch=None, metric=None):
        opt = self.opt
        epoch = epoch if epoch is not None else getattr(self, "_epoch", 1)
        policy = getattr(opt, "lr_policy", "linear")
        if policy == "plateau":
            # handled host-side: x0.2 when metric stalls; trainer feeds metric
            if metric is not None:
                self._plateau_history = getattr(self, "_plateau_history", [])
                self._plateau_history.append(metric)
                h = self._plateau_history
                if len(h) > 6 and min(h[-6:]) > min(h[:-6]) * 0.99:
                    self.lr *= 0.2
                    self._plateau_history = []
            return self.lr
        self.lr = lr_schedule(policy, epoch, opt.lr, opt.n_epochs, opt.n_epochs_decay,
                              epoch_count=getattr(opt, "epoch_count", 1),
                              lr_decay_iters=getattr(opt, "lr_decay_iters", 50))
        return self.lr

    def print_networks(self, verbose=False):
        print("---------- Networks initialized -------------")
        for name in self.model_names:
            n = sum(int(v.size) for v in self.params.get(name, {}).values())
            if verbose:
                for k, v in self.params[name].items():
                    print(f"  {k}: {tuple(v.shape)}")
            print(f"[Network {name}] Total number of parameters : {n / 1e6:.3f} M")
        print("-----------------------------------------------")

    # -- batch plumbing --------------------------------------------------------

    def shard(self, batch):
        return shard_batch(batch, self.mesh)

    def set_input(self, batch):
        raise NotImplementedError

    def optimize_parameters(self, iters, fr=1):
        raise NotImplementedError

    def calculate(self, stage="test"):
        raise NotImplementedError
