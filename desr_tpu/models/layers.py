"""TPU-native NN layer system.

Design (deliberately NOT a port of torch.nn):

- A network is a static Python object built once at configuration time; it has
  two pure functions: ``init(key) -> params`` and ``apply(params, x, ctx)``.
- ``params`` is a FLAT dict mapping PyTorch ``state_dict`` key strings (e.g.
  ``"model.1.weight"``) to jnp arrays **stored in torch layouts** (conv:
  OIHW, conv-transpose: IOHW). This single decision makes the reference's
  checkpoint contract (``<epoch>_net_<Name>.pth`` files, tolerant
  shape-filtered partial merge, cross-stage weight handoff — see
  models/base_model.py:150-237 in the reference) trivial: the param tree *is*
  the state_dict. XLA folds the layout transposes into the convolutions.
- Activations are NHWC (TPU-native). ``Ctx`` threads train-mode, dropout rng
  and the compute dtype; params stay float32, compute can run in bfloat16 with
  float32 accumulation on the MXU.

Layer semantics match torch.nn modules exactly (validated in
tests/test_networks_parity.py by loading our params into the reference's torch
modules and comparing outputs).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Ctx:
    """Per-call context threaded through apply().

    ``stats``: optional mutable sink for BatchNorm running-stat updates.
    A train step that wants torch-faithful running statistics passes a fresh
    dict PER NET apply (key namespaces repeat across nets); BatchNorm layers
    write momentum-updated ``running_mean``/``running_var``/
    ``num_batches_tracked`` values into it (chained across repeated forwards
    of the same net, like torch's sequential in-place updates). The dict must
    be created INSIDE the differentiated function and returned as grad aux —
    never hoisted across a jit/grad boundary (tracer leak).
    """

    train: bool = False
    rng: Optional[jax.Array] = None
    dtype: Any = jnp.float32  # compute dtype for convs / activations
    stats: Optional[Dict[str, Any]] = None
    mesh: Any = None  # jax.sharding.Mesh for explicit layout anchors
    remat_tails: bool = False  # recompute norm/act tails in backward (see Sequential)
    remat_blocks: bool = False  # recompute whole conv runs in backward (see run_block_remat)
    fused_pad: bool = False  # border-strip pad+conv fusion (see Conv2d.apply_pad_fused)
    split_conv: bool = True  # channel-split first conv (see Conv2d.apply_split)
    tap_conv: bool = True  # tap-decomposed large-k small-C convs (see Conv2d._conv_taps)
    ring_pad: bool = True  # additive ring corrections for pad(1)+3x3 conv (see Conv2d.apply_ring)
    phase_convt: bool = False  # subpixel phase decomposition of stride-2 convT (see ConvTranspose2d)
    row_tap: bool = False  # k-row 1xk decomposition of large-k big-C convs (see _conv_row_taps)
    onepass_stats: bool = True  # one-pass InstanceNorm stats (see _sum_and_sumsq_hw)
    fold_norm: bool = False  # single-FMA normalize x*scale+shift (see InstanceNorm2d)
    pallas_conv: bool = False  # hand-tiled pallas 3x3 ring-base conv kernel
    pallas_fuse: bool = False  # fused conv->norm->relu chains (see Sequential._run_fused_chain)


def ctx_flags(opt):
    """Ctx kwargs for the opt-gated compute-path choices.

    Real-TPU A/B isolation at the SR shape (PERF.md round 2): split_conv and
    onepass_stats are each ~+1% and default ON; fused_pad measured 9% SLOWER
    than XLA's own pad lowering (the border-strip .at[].set patches cost more
    than the avoided pad materialization) and is opt-in via --fused_pad.
    """
    return dict(
        remat_tails=getattr(opt, "remat_tails", False),
        remat_blocks=getattr(opt, "remat_blocks", False),
        fused_pad=getattr(opt, "fused_pad", False),
        split_conv=not getattr(opt, "no_split_conv", False),
        onepass_stats=not getattr(opt, "no_onepass_stats", False),
        fold_norm=getattr(opt, "fold_norm", False),
        tap_conv=not getattr(opt, "no_tap_conv", False),
        ring_pad=not getattr(opt, "no_ring_pad", False),
        phase_convt=getattr(opt, "phase_convt", False),
        row_tap=getattr(opt, "row_tap", False),
        pallas_conv=bool(getattr(opt, "pallas_conv", False)),
        # "frozen" enables fusion only for the frozen-net ctx the models
        # build themselves (dataclasses.replace) — trained nets stay unfused
        pallas_fuse=getattr(opt, "pallas_fuse", False) is True,
    )


def _spatial_mesh(ctx):
    """True when the Ctx mesh shards the image H axis ('spatial' axis > 1)."""
    mesh = getattr(ctx, "mesh", None)
    return (mesh is not None and "spatial" in getattr(mesh, "axis_names", ())
            and mesh.shape["spatial"] > 1)


def spatial_anchor(x, ctx, min_rows_per_shard=16):
    """Anchor an NHWC activation's layout on a ('data', 'spatial') mesh.

    GSPMD propagates the input batch's H-sharding all the way down U-Net
    pyramids; once H collapses to a few rows the spatial layout is degenerate
    and the partitioner oscillates between data- and spatial-sharded layouts,
    falling back to 'Involuntary full rematerialization' (replicate + reshard)
    on the deep levels. Explicit constraints pin big levels to
    ('data','spatial') and small levels to ('data',), removing the ambiguity.
    No-op on 1-D meshes or off-mesh tracing.
    """
    mesh = ctx.mesh
    if mesh is None or "spatial" not in getattr(mesh, "axis_names", ()):
        return x
    if x.ndim != 4:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_sp = mesh.shape["spatial"]
    n_data = mesh.shape["data"]
    if n_sp <= 1:
        return x
    batch = "data" if x.shape[0] % n_data == 0 else None
    if x.shape[1] % n_sp == 0 and x.shape[1] >= min_rows_per_shard * n_sp:
        spec = P(batch, "spatial", None, None)
    else:
        spec = P(batch, None, None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


@dataclasses.dataclass(frozen=True)
class InitCfg:
    """Weight init configuration.

    The reference has two init conventions:
    - pix2pix lineage (models/networks.py:69-100): gain is a float
      (``init_gain``, default 0.02) used directly for xavier/orthogonal.
    - translation lineage (models/translation_network.py:85-116): gain is
      computed via ``init.calculate_gain(nonlinearity, param)``.
    Setting ``gain_from_nonlinearity=True`` selects the latter.
    """

    init_type: str = "normal"
    init_gain: float = 0.02
    gain_from_nonlinearity: bool = False
    nonlinearity: str = "relu"
    neg_slope: Optional[float] = None


def calculate_gain(nonlinearity, param=None):
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        neg = 0.01 if param is None else param
        return math.sqrt(2.0 / (1 + neg ** 2))
    if nonlinearity in ("linear", "conv2d", "sigmoid"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    raise ValueError(nonlinearity)


def _fans(shape):
    # torch convention: fan_in = in_ch * prod(kernel), fan_out = out_ch * prod(kernel)
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def init_weight(key, shape, cfg: InitCfg):
    """Conv/linear weight init matching the reference's init_weights."""
    if cfg.gain_from_nonlinearity:
        gain = calculate_gain(cfg.nonlinearity, cfg.neg_slope)
    else:
        gain = cfg.init_gain
    if cfg.init_type == "normal":
        std = 0.02 if cfg.gain_from_nonlinearity else cfg.init_gain
        return std * jax.random.normal(key, shape, jnp.float32)
    if cfg.init_type == "xavier":
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, jnp.float32)
    if cfg.init_type == "kaiming":
        fan_in, _ = _fans(shape)
        std = math.sqrt(2.0) / math.sqrt(fan_in)  # a=0, fan_in, leaky_relu gain
        return std * jax.random.normal(key, shape, jnp.float32)
    if cfg.init_type == "orthogonal":
        rows = shape[0]
        cols = int(np.prod(shape[1:]))
        flat = jax.random.normal(key, (max(rows, cols), min(rows, cols)), jnp.float32)
        q, r = jnp.linalg.qr(flat)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        if rows < cols:
            q = q.T
        return (gain * q[:rows, :cols]).reshape(shape)
    raise NotImplementedError(f"init {cfg.init_type}")


# ---------------------------------------------------------------------------
# Layer base
# ---------------------------------------------------------------------------


class Layer:
    def init(self, key, prefix: str, cfg: InitCfg) -> Dict[str, jax.Array]:
        return {}

    def apply(self, params, x, prefix: str, ctx: Ctx):
        raise NotImplementedError


class Identity(Layer):
    def apply(self, params, x, prefix, ctx):
        return x


class Sequential(Layer):
    """Children keyed by their torch Sequential index: ``<prefix><i>.<param>``."""

    def __init__(self, layers: Sequence[Layer]):
        self.layers = list(layers)

    def init(self, key, prefix, cfg):
        params = {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, (lyr, k) in enumerate(zip(self.layers, keys)):
            params.update(lyr.init(k, f"{prefix}{i}.", cfg))
        return params

    def apply(self, params, x, prefix, ctx, start=0):
        if ctx.remat_blocks:
            return run_block_remat(self, params, x, prefix, ctx, start,
                                   len(self.layers))
        if ctx.remat_tails:
            return self._apply_remat_tails(params, x, prefix, ctx, start)
        return self._run(params, x, prefix, ctx, start, len(self.layers))

    def _fused_link(self, x, ctx, i, hi):
        """Parse a pallas-fusable ring-conv link at layer index i.

        Two forms cover both net lineages: [ReflectionPad2d/
        ReplicationPad2d(1), Conv2d(k=3, pad=0)] (pix2pix, networks.py) and
        [Conv2d(k=3, pad=1, padding_mode=reflect/replicate)] (translation
        lineage). Returns (pad_mode, conv, conv_idx, next_idx) or None.
        """
        if i >= hi:
            return None
        lyr = self.layers[i]
        if isinstance(lyr, (ReflectionPad2d, ReplicationPad2d)):
            if i + 1 >= hi or not isinstance(self.layers[i + 1], Conv2d):
                return None
            conv = self.layers[i + 1]
            if lyr.pad != 1 or conv.padding != 0:
                return None
            mode = "reflect" if isinstance(lyr, ReflectionPad2d) else "edge"
            ci, nxt = i + 1, i + 2
        elif isinstance(lyr, Conv2d):
            conv = lyr
            if conv.padding != 1 or conv.padding_mode not in ("reflect", "replicate"):
                return None
            mode = _PAD_MODE[conv.padding_mode]
            ci, nxt = i, i + 1
        else:
            return None
        if not (ctx.ring_pad and conv.ring_pad_ok(x, 1)):
            return None
        if not conv.pallas_ok(x, ctx, 1, flag=ctx.pallas_fuse, fused=True):
            return None
        return mode, conv, ci, nxt

    def _run_fused_chain(self, params, x, prefix, ctx, i, hi):
        """Run a fused [conv -> norm -> relu -> conv ...] chain from layer i.

        The pallas kernel emits each conv's InstanceNorm/GroupNorm moments
        with the conv itself (no stats re-read) and applies the previous
        norm's normalize(+ReLU) during its band DMA (the normalized
        activation never materializes; conv biases feeding a norm fold into
        the norm's scale/shift vectors exactly — see _norm_vectors). Each
        fused conv's custom VJP stores only its raw input, i.e. the same
        conv-outputs-only save set the scoped tail remat keeps, so chains
        bypass jax.checkpoint grouping (_apply_remat_tails).

        Entry points: a link whose conv feeds a norm, or a bare norm whose
        (optional-ReLU) consumer is a fusable link — the latter picks up
        stats with the one-pass XLA reduction (e.g. after a stride-2 conv).
        Returns (x, next_index) or None if nothing fuses at i.
        """
        layers = self.layers
        norm_types = (InstanceNorm2d, GroupNorm)

        link = self._fused_link(x, ctx, i, hi)
        if link is not None:
            mode, conv, ci, nxt = link
            if nxt >= hi or not isinstance(layers[nxt], norm_types):
                return None
            x, s, s2 = conv.apply_ring(params, x, f"{prefix}{ci}.", ctx, mode,
                                       want_stats=True, add_bias=False)
            bias = params.get(f"{prefix}{ci}.bias") if conv.bias else None
            i = nxt
        elif isinstance(layers[i], norm_types):
            peek = i + 1
            if peek < hi and isinstance(layers[peek], ReLU):
                peek += 1
            if self._fused_link(x, ctx, peek, hi) is None:
                return None
            s, s2 = _sum_and_sumsq_hw(x)
            bias = None
        else:
            return None

        n = x.shape[1] * x.shape[2]
        while True:
            scale, shift = _norm_vectors(layers[i], params, f"{prefix}{i}.",
                                         s, s2, n, bias)
            i += 1
            relu = i < hi and isinstance(layers[i], ReLU)
            if relu:
                i += 1
            link = self._fused_link(x, ctx, i, hi)
            if link is not None:
                mode, conv, ci, nxt = link
                want = nxt < hi and isinstance(layers[nxt], norm_types)
                res = conv.apply_ring(params, x, f"{prefix}{ci}.", ctx, mode,
                                      prologue=(scale, shift, relu),
                                      want_stats=want, add_bias=not want)
                if not want:
                    return res, nxt
                x, s, s2 = res
                bias = params.get(f"{prefix}{ci}.bias") if conv.bias else None
                i = nxt
                continue
            # terminal: one fused multiply-add materializes the normalize(+ReLU)
            y = x.astype(jnp.float32) * scale[:, None, None, :] \
                + shift[:, None, None, :]
            if relu:
                y = jnp.maximum(y, 0.0)
            return y.astype(ctx.dtype), i

    def _run(self, params, x, prefix, ctx, lo, hi):
        """Run layers [lo, hi) with the pad+conv fusion peephole.

        A [ReflectionPad2d/ReplicationPad2d(p), Conv2d(k=2p+1, pad=0,
        stride=1)] pair — the only way these nets use explicit pads — is
        routed to Conv2d.apply_pad_fused, which never materializes the padded
        tensor (the HLO concat lowering of jnp.pad was 13% of the SR step's
        compiler-estimated cycles). Param keys are untouched: the conv keeps
        its original Sequential index.
        """
        i = lo
        while i < hi:
            if ctx.pallas_fuse:
                fused = self._run_fused_chain(params, x, prefix, ctx, i, hi)
                if fused is not None:
                    x, i = fused
                    continue
            lyr = self.layers[i]
            nxt = self.layers[i + 1] if i + 1 < hi else None
            if (isinstance(lyr, (ReflectionPad2d, ReplicationPad2d))
                    and isinstance(nxt, Conv2d) and nxt.padding == 0):
                mode = "reflect" if isinstance(lyr, ReflectionPad2d) else "edge"
                if ctx.ring_pad and nxt.ring_pad_ok(x, lyr.pad):
                    x = nxt.apply_ring(params, x, f"{prefix}{i + 1}.", ctx, mode)
                    i += 2
                    continue
                if ctx.fused_pad and nxt.fused_pad_ok(x, lyr.pad):
                    x = nxt.apply_pad_fused(params, x, f"{prefix}{i + 1}.", ctx,
                                            lyr.pad, mode)
                    i += 2
                    continue
            x = lyr.apply(params, x, f"{prefix}{i}.", ctx)
            i += 1
        return x

    def _apply_remat_tails(self, params, x, prefix, ctx, start=0):
        """Save conv outputs only; recompute norm/activation tails in backward.

        The VJP of a conv -> norm -> act chain ordinarily stores every
        intermediate (conv out for the norm grad, normalized out for the act
        grad, act out for the next conv's weight grad) — at HR resolutions
        those saves dominate the HBM bytes/step. Grouping each
        [cheap-elementwise..., conv] segment under jax.checkpoint keeps only
        the segment INPUTS (= the previous conv's output): the norms and
        activations are recomputed during the backward pass, trading a small
        amount of VPU recompute for large HBM savings (PERF.md round-2 #1).
        Composite layers recurse and group internally; BatchNorm2d is a
        barrier (its running-stat sink must not execute in the rematerialized
        trace).
        """
        cheap = (InstanceNorm2d, GroupNorm, ReLU, LeakyReLU, Tanh,
                 ReflectionPad2d, ReplicationPad2d, Dropout)
        closer = (Conv2d, ConvTranspose2d)
        layers, n = self.layers, len(self.layers)
        i = start
        while i < n:
            if ctx.pallas_fuse:
                # fused chains keep the same conv-outputs-only save set via
                # their custom VJPs — no checkpoint grouping needed (or
                # wanted: it would recompute the convs themselves)
                fused = self._run_fused_chain(params, x, prefix, ctx, i, n)
                if fused is not None:
                    x, i = fused
                    continue
            if not isinstance(layers[i], cheap):
                # conv with no cheap prefix, or a composite/barrier layer
                x = self._run(params, x, prefix, ctx, i, i + 1)
                i += 1
                continue
            j = i
            while j < n and isinstance(layers[j], cheap):
                j += 1
            if j < n and isinstance(layers[j], closer):
                j += 1  # include the closing conv so its input is recomputed

            def seg(p, y, lo=i, hi=j):
                return self._run(p, y, prefix, ctx, lo, hi)

            x = jax.checkpoint(seg)(params, x)
            i = j
        return x


def run_block_remat(seq, params, x, prefix, ctx, lo=0, hi=None):
    """Run ``seq.layers[lo:hi)`` with each maximal run of primitive layers
    under one ``jax.checkpoint``.

    Stronger than the tail remat (`Sequential._apply_remat_tails`, which keeps
    every conv OUTPUT): here only each run's INPUT survives to the backward
    pass — the convs themselves are recomputed. At HR resolutions the conv
    outputs are the dominant HBM residuals, so this trades one extra forward
    conv pass for the largest possible activation-byte reduction
    (PERF.md round-2 plan #1b). Composite layers (ResnetBlock, U-Net levels)
    run OUTSIDE the checkpoint and self-handle via `Sequential.apply` with
    `ctx.remat_blocks` still set, so U-Net levels checkpoint their pre-/post-
    submodule spans independently (no nested whole-net recompute). BatchNorm2d
    is a barrier: its `ctx.stats` writes must not trace inside a
    rematerialized region (same rule as the tail remat).
    """
    import dataclasses

    if hi is None:
        hi = len(seq.layers)
    # inside a checkpointed segment both remat modes are already satisfied;
    # stripping them keeps nested composites (SR-head ResnetBlocks reached
    # through an outer segment) from double-checkpointing
    inner = dataclasses.replace(ctx, remat_blocks=False, remat_tails=False)
    i = lo
    while i < hi:
        if not isinstance(seq.layers[i], _REMAT_PRIMS):
            # composite (self-handles) or BatchNorm barrier
            x = seq._run(params, x, prefix, ctx, i, i + 1)
            i += 1
            continue
        j = i
        while j < hi and isinstance(seq.layers[j], _REMAT_PRIMS):
            j += 1

        def seg(p, y, lo_=i, hi_=j):
            return seq._run(p, y, prefix, inner, lo_, hi_)

        x = jax.checkpoint(seg)(params, x)
        i = j
    return x


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

_PAD_MODE = {"zeros": None, "reflect": "reflect", "replicate": "edge"}


class Conv2d(Layer):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0, bias=True,
                 padding_mode="zeros", dilation=1):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k = kernel_size
        self.stride = stride
        self.padding = padding
        self.bias = bias
        self.padding_mode = padding_mode
        self.dilation = dilation

    def init(self, key, prefix, cfg):
        kw, kb = jax.random.split(key)
        p = {prefix + "weight": init_weight(kw, (self.out_ch, self.in_ch, self.k, self.k), cfg)}
        if self.bias:
            p[prefix + "bias"] = jnp.zeros((self.out_ch,), jnp.float32)
        return p

    def _conv(self, x, w, pad_h, pad_w):
        # note: no preferred_element_type — TPU MXU accumulates bf16 convs in
        # f32 natively, and an explicit f32 accumulation dtype breaks the VJP
        # (f32 cotangent vs bf16 weight dtype mismatch)
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=(self.stride, self.stride),
            padding=(pad_h, pad_w),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        )

    def fused_pad_ok(self, x, p):
        """apply_pad_fused preconditions: stride-1 'same' conv on a tensor
        big enough that the four border strips don't overlap."""
        return (self.stride == 1 and self.dilation == 1 and self.k == 2 * p + 1
                and p > 0 and x.ndim == 4
                and x.shape[1] >= self.k + p and x.shape[2] >= self.k + p)

    def tap_conv_ok(self, x, ctx):
        """Tap-decomposition preconditions (see _conv_taps).

        Worth it only for the MXU-pathological cases the hardware profile
        exposed (PERF.md round 2): large-k stride-1 convs whose output or
        input channel count leaves >=75% of the MXU's 128 lanes idle — the
        7x7 stems (C_in 1-4) and 7x7 heads (C_out 1) ran at 0.8-2.4 TFLOP/s.
        Skip small images: the win is at HR, and 49 extra ops per conv would
        just bloat small programs."""
        if _spatial_mesh(ctx):
            # under H-axis spatial sharding, GSPMD partitions each of the
            # k*k shifted tap windows with its own halo exchange — compile
            # time explodes (the 8-device virtual-CPU dryrun went from ~4 min
            # to >30 min) and the partitioned code is shift-bound anyway
            return False
        return (ctx.tap_conv and self.stride == 1 and self.dilation == 1
                and self.k >= 5 and self.out_ch <= 8
                and x.ndim == 4 and x.shape[1] * x.shape[2] >= 1 << 16)

    def _conv_taps(self, x, w, bias, pad=0):
        """k*k stride-1 conv as 1x1 convs over tap-expanded channels.

        A conv with C_out=1 (resnet/translation-decoder heads) maps to the
        MXU with 1 of 128 output lanes busy; C_in<=4 stems waste the
        contraction dim the same way. Decompose over the k*k taps:

        - C_out small: y = 1x1 conv with weights [kk*O, I] (taps-major), then
          out[...,o] = sum_t y[:, dy:dy+H, dx:dx+W, t*O+o] — the 1x1 conv is
          a clean [M=BHW, K=I, N=kk*O] matmul (49x more lanes busy) and the
          shift-sum is one loop fusion. f32 tap accumulation.
        - C_in small: x1 = concat of the kk shifted input windows (channels
          [t*I:(t+1)*I]), then ONE 1x1 conv [M=BHW, K=kk*I, N=O] — K grows
          from 1-4 to 49-196.

        With ``pad`` == 0, x arrives already padded (reflect/edge/zero) and
        output spatial is H-k+1 x W-k+1. With ``pad`` == p > 0, x is
        UNPADDED and the zero padding is virtual: out-of-range tap windows
        become lazy zero-pads of y's slices, which fuse into the same
        accumulation pass — nothing materializes (this is how apply_ring
        composes the ring corrections with tap-decomposed heads). Same math
        as the direct conv up to tap summation order. Measured: the 64->1
        head dropped from 10.9 ms to sub-ms class.
        """
        k = self.k
        O, I = self.out_ch, self.in_ch
        Hi, Wi = x.shape[1], x.shape[2]
        H, W = Hi - k + 1 + 2 * pad, Wi - k + 1 + 2 * pad
        # [O, I, ky, kx] -> [ky*kx*O, I, 1, 1], taps-major
        w1 = jnp.transpose(w, (2, 3, 0, 1)).reshape(k * k * O, I, 1, 1)
        y = self._conv_1x1(x, w1)
        acc = None
        for t in range(k * k):
            dy, dx = divmod(t, k)
            if pad == 0 and O == 1:
                # planar accumulation: C=1 NHWC intermediates at HR pay a
                # 128x lane-padding tax in TPU tiles; summing [B, H, W]
                # slices keeps the whole chain unpadded
                part = y[:, dy:dy + H, dx:dx + W, t].astype(jnp.float32)
            elif pad == 0:
                part = y[:, dy:dy + H, dx:dx + W, t * O:(t + 1) * O].astype(jnp.float32)
            else:
                # out[i, j] += y[i + dy - pad, j + dx - pad]; clamp to y's
                # extent and zero-fill the rest (lazy pad, fuses into the sum)
                sh0, sh1 = max(0, dy - pad), min(Hi, H + dy - pad)
                sw0, sw1 = max(0, dx - pad), min(Wi, W + dx - pad)
                dh0, dw0 = sh0 - (dy - pad), sw0 - (dx - pad)
                part = y[:, sh0:sh1, sw0:sw1, t * O:(t + 1) * O].astype(jnp.float32)
                part = jnp.pad(part, ((0, 0),
                                      (dh0, H - dh0 - (sh1 - sh0)),
                                      (dw0, W - dw0 - (sw1 - sw0)), (0, 0)))
            acc = part if acc is None else acc + part
        out = acc[..., None] if (pad == 0 and O == 1) else acc
        # Two generalizations were tried on hardware and REVERTED (PERF.md):
        # tap-expanded channel concat for C_in<=4 stems (k*k C-minor slices
        # materialize with 128/C lane padding - 42x memory, OOM at I2D batch
        # 12) and k-row 1xk decomposition for large-C heads (the k
        # materialized per-tap accumulation terms cost 133 ms/step vs the
        # 33 ms direct conv they replaced).
        out = out.astype(x.dtype)
        if bias is not None:
            out = out + bias
        return out

    def row_tap_ok(self, x, ctx):
        """k H-shifted 1xk convs for large-k big-channel convs (the 7x7
        32->128 Depth_f head measured 69 TFLOP/s as one spatial conv); each
        row tap is a clean [K=k*I, N=O] contraction. Accumulation stays in
        the compute dtype — the f32 variant materialized 7 f32 HR parts and
        measured 133 ms/step (PERF.md). Opt-in (--row_tap) pending a
        hardware win."""
        return (ctx.row_tap and self.stride == 1 and self.dilation == 1
                and self.k >= 5 and self.out_ch > 8 and self.in_ch > 4
                and x.ndim == 4 and x.shape[1] * x.shape[2] >= 1 << 16)

    def _conv_row_taps(self, x, w, bias, pad=0):
        k = self.k
        Hi = x.shape[1]
        H = Hi - k + 1 + 2 * pad
        acc = None
        for dy in range(k):
            wrow = w[:, :, dy:dy + 1, :]
            if pad == 0:
                part = jax.lax.conv_general_dilated(
                    x[:, dy:dy + H], wrow, window_strides=(1, 1),
                    padding=((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"))
            else:
                sh0, sh1 = max(0, dy - pad), min(Hi, H + dy - pad)
                part = jax.lax.conv_general_dilated(
                    x[:, sh0:sh1], wrow, window_strides=(1, 1),
                    padding=((0, 0), (pad, pad)),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"))
                dh0 = sh0 - (dy - pad)
                part = jnp.pad(part, ((0, 0), (dh0, H - dh0 - part.shape[1]),
                                      (0, 0), (0, 0)))
            acc = part if acc is None else acc + part
        out = acc.astype(x.dtype)
        if bias is not None:
            out = out + bias
        return out

    def _conv_1x1(self, x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"))

    def apply(self, params, x, prefix, ctx):
        w = params[prefix + "weight"].astype(ctx.dtype)
        x = x.astype(ctx.dtype)
        pad = self.padding
        if pad and self.padding_mode != "zeros":
            if ctx.ring_pad and self.ring_pad_ok(x, pad):
                return self.apply_ring(params, x, prefix, ctx,
                                       _PAD_MODE[self.padding_mode])
            if ctx.fused_pad and self.fused_pad_ok(x, pad):
                return self._pad_fused(params, x, prefix, ctx, w, pad,
                                       _PAD_MODE[self.padding_mode])
            mode = _PAD_MODE[self.padding_mode]
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
            conv_pad = ((0, 0), (0, 0))
        else:
            conv_pad = ((pad, pad), (pad, pad))
        bias = params[prefix + "bias"].astype(ctx.dtype) if self.bias else None
        if self.tap_conv_ok(x, ctx):
            assert conv_pad[0] == conv_pad[1] and conv_pad[0][0] == conv_pad[0][1]
            return self._conv_taps(x, w, bias, pad=conv_pad[0][0])
        if self.row_tap_ok(x, ctx):
            assert conv_pad[0] == conv_pad[1] and conv_pad[0][0] == conv_pad[0][1]
            return self._conv_row_taps(x, w, bias, pad=conv_pad[0][0])
        out = self._conv(x, w, conv_pad[0], conv_pad[1]).astype(ctx.dtype)
        if bias is not None:
            out = out + bias
        return out

    def pallas_ok(self, x, ctx, pad, flag=None, fused=False):
        """Route this conv through the pallas im2col kernel?

        Only when the flag is on (``ctx.pallas_conv``, or an explicit
        override — the fused-chain peephole gates on ``ctx.pallas_fuse``),
        the mesh is single-device (pallas_call has no GSPMD partitioning
        rule, so under a >1-device mesh it would force replication), and the
        kernel has a VMEM tiling for the shape.
        """
        if not (ctx.pallas_conv if flag is None else flag):
            return False
        if self.stride != 1 or self.dilation != 1:
            return False
        mesh = getattr(ctx, "mesh", None)
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            return False
        from desr_tpu.ops.pallas_conv import conv2d_pallas_supported

        return conv2d_pallas_supported(tuple(x.shape), self.k, self.out_ch,
                                       pad=pad, dtype_bytes=x.dtype.itemsize,
                                       fused=fused)

    def ring_pad_ok(self, x, p):
        """apply_ring preconditions: the 3x3/pad-1 stride-1 'same' conv —
        the resnet-block shape that accounts for most pad traffic.

        apply_ring itself handles any p in 1..3 (k = 2p+1) and is
        parity-tested at all three, but hardware A/B pinned the ROUTING to
        p == 1: routing the 7x7 stems (p=3) through the ring measured
        0.461 vs 0.410 s/step on the SR step — XLA lowers the
        explicitly-reflect-padded stem convs better than the virtually
        zero-padded ones, outweighing the saved pad pass. Heads with
        C_out <= 8 keep the materialized-pad + tap path for the same
        measured reason (see PERF.md round 2)."""
        return (self.k == 3 and p == 1 and self.stride == 1
                and self.dilation == 1 and self.out_ch > 8 and x.ndim == 4
                and x.shape[1] >= 4 and x.shape[2] >= 4
                and x.shape[1] * x.shape[2] >= 1 << 14)

    def apply_ring(self, params, x, prefix, ctx, mode, prologue=None,
                   want_stats=False, add_bias=True):
        """[Reflect/ReplicationPad(1), 3x3 conv] with NO pad materialization.

        The zero-padded conv differs from the true reflect/edge-padded conv
        only in the contributions of the padding ring, and those are EXACT
        additive terms: the left padding column's contribution to output
        column 0 is a 1-D correlation of the reflected column x[:, :, r]
        with kernel column 0 — a tiny [B*H, 3C] x [3C, O] matmul. So: run
        the conv with (virtual, free) zero padding, compute four line
        corrections + four corner de-duplications as small matmuls, and add
        them through lazy zero-pads that fuse into one output pass. Unlike
        the border-strip variant (opt-in --fused_pad, measured 9% slower:
        thin strip convs are themselves MXU-pathological) there are no extra
        conv ops and nothing materializes.

        Generalized to pad p in 1..3 (k = 2p+1): each side's correction is
        ONE [B*L, k*p*C] x [k*p*C, p*O] matmul (weights arranged with a
        single static gather on the tiny kernel tensor), and each corner's
        double-count removal is one einsum over a p x p block — a handful of
        ops total, no pad materialization, no pathological strip convs.

        mode: 'reflect' uses ring value index r=1..p, 'edge' repeats the
        edge line (torch ReflectionPad2d / ReplicationPad2d semantics).

        Fused-chain extensions (see Sequential._run_fused_chain):
        ``prologue=(scale, shift, relu)`` — the conv's true input is
        ``[relu](x * scale + shift)`` with per-(batch, channel) vectors;
        applied inside the pallas kernel's band DMA for the base conv and
        elementwise on the thin border slices for the corrections, so the
        normalized activation never materializes. ``want_stats`` returns
        ``(out, s, s2)`` — per-(batch, channel) f32 sum/sumsq of the
        (pre-cast, correction-included, bias-less) output, i.e. the one-pass
        InstanceNorm moments without re-reading the tensor. ``add_bias=False``
        elides the bias (the chain folds it into the next norm's vectors).
        """
        w = params[prefix + "weight"].astype(ctx.dtype)
        x = x.astype(ctx.dtype)
        B, H, W, C = x.shape
        O = self.out_ch
        k = self.k
        p = k // 2
        reflect = mode == "reflect"

        if prologue is None:
            def fx(v):
                return v
        else:
            _sc, _sh, _relu = prologue

            def fx(v):
                r = v.astype(jnp.float32) * _sc[:, None, None, :] \
                    + _sh[:, None, None, :]
                if _relu:
                    r = jnp.maximum(r, 0.0)
                return r.astype(ctx.dtype)

        # base: virtually-zero-padded conv; small-C_out heads compose with
        # the tap decomposition (their direct conv runs at 1/128 MXU lanes)
        s0 = s20 = None
        if prologue is not None or want_stats:
            from desr_tpu.ops.pallas_conv import conv2d_pallas_fused

            sc = None if prologue is None else _sc
            sh = None if prologue is None else _sh
            relu_p = False if prologue is None else _relu
            res = conv2d_pallas_fused(x, w, sc, sh, p, relu_p, want_stats)
            if want_stats:
                base_cast, s0, s20 = res
            else:
                base_cast = res
            out = base_cast.astype(jnp.float32)
        elif self.tap_conv_ok(x, ctx):
            out = self._conv_taps(x, w, None, pad=p).astype(jnp.float32)
        elif self.pallas_ok(x, ctx, p):
            from desr_tpu.ops.pallas_conv import conv2d_pallas

            out = conv2d_pallas(x, w, p).astype(jnp.float32)
        else:
            out = self._conv(x, w, (p, p), (p, p)).astype(jnp.float32)

        # index k in the padded kernel = zero block (invalid (c, j) pairs)
        wpad_kx = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 1)))
        wpad_ky = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 0)))
        idx_near = np.full((p, p), k, np.int32)   # [c, j0] -> p-c-j0-1
        idx_far = np.full((p, p), k, np.int32)    # [d, j0] -> p+j0+1+d
        for a in range(p):
            for j0 in range(p):
                if p - a - j0 - 1 >= 0:
                    idx_near[a, j0] = p - a - j0 - 1
                if p + j0 + 1 + a <= 2 * p:
                    idx_far[a, j0] = p + j0 + 1 + a

        def side_weight(wpad, axis, idx):
            # -> [k(shift), p(j0), C, p(c), O] flattened to [k*p*C, p*O]
            ws = jnp.take(wpad, jnp.asarray(idx), axis=axis)
            # take on axis 2 (ky): [O, C, p_c, p_j, k]; axis 3 (kx): [O, C, k, p_c, p_j]
            perm = (4, 3, 1, 2, 0) if axis == 2 else (2, 4, 1, 3, 0)
            ws = jnp.transpose(ws, perm)
            return ws.reshape(k * p * C, p * O)

        def line_mat(stack, L):
            # stack: [B, L, p, C] padded-line values (j0 minor); extend along
            # the line with the lines' own ring values, then k shifted views
            if reflect:
                lo = stack[:, p:0:-1]
                hi = stack[:, L - 2:L - 2 - p:-1]
            else:
                lo = jnp.repeat(stack[:, :1], p, axis=1)
                hi = jnp.repeat(stack[:, L - 1:], p, axis=1)
            ext = jnp.concatenate([lo, stack, hi], axis=1)
            views = jnp.stack([ext[:, s:s + L] for s in range(k)], axis=2)
            return views.reshape(B, L, k * p * C)  # [shift, j0, C] minor order

        def corr(stack, L, wpad, axis, idx):
            m = line_mat(stack, L)
            cw = side_weight(wpad, axis, idx)
            return jnp.einsum("blk,kc->blc", m, cw).reshape(B, L, p, O)

        if reflect:
            ls = fx(x[:, :, 1:p + 1, :])                       # [B, H, p, C]
            rs = fx(x[:, :, W - 2:W - 2 - p:-1, :])
            ts = jnp.moveaxis(fx(x[:, 1:p + 1, :, :]), 1, 2)   # [B, W, p, C]
            bs = jnp.moveaxis(fx(x[:, H - 2:H - 2 - p:-1, :, :]), 1, 2)
        else:
            ls = jnp.repeat(fx(x[:, :, :1, :]), p, axis=2)
            rs = jnp.repeat(fx(x[:, :, W - 1:, :]), p, axis=2)
            ts = jnp.moveaxis(jnp.repeat(fx(x[:, :1, :, :]), p, axis=1), 1, 2)
            bs = jnp.moveaxis(jnp.repeat(fx(x[:, H - 1:, :, :]), p, axis=1), 1, 2)

        corr_l = corr(ls, H, wpad_kx, 3, idx_near)          # [B, H, p, O] cols 0..p-1
        corr_r = corr(rs, H, wpad_kx, 3, idx_far)           # cols W-1-d
        corr_t = corr(ts, W, wpad_ky, 2, idx_near)          # rows 0..p-1
        corr_b = corr(bs, W, wpad_ky, 2, idx_far)           # rows H-1-d

        out = out + jnp.pad(corr_l, ((0, 0), (0, 0), (0, W - p), (0, 0)))
        out = out + jnp.pad(corr_r[:, :, ::-1], ((0, 0), (0, 0), (W - p, 0), (0, 0)))
        out = out + jnp.pad(jnp.moveaxis(corr_t, 1, 2), ((0, 0), (0, H - p), (0, 0), (0, 0)))
        out = out + jnp.pad(jnp.moveaxis(corr_b, 1, 2)[:, ::-1], ((0, 0), (H - p, 0), (0, 0), (0, 0)))

        # diagonal padding blocks were counted by BOTH their row and column
        # corrections — subtract one copy per corner (p x p output patches)
        wpad_hw = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 1)))

        def corner(xc, idx_h, idx_w):
            # xc: [B, p, p, C] padded-corner values (j1, j2)
            ws = jnp.take(wpad_hw, jnp.asarray(idx_h), axis=2)   # [O,C,pc1,pj1,k+1]
            ws = jnp.take(ws, jnp.asarray(idx_w), axis=4)        # [O,C,pc1,pj1,pc2,pj2]
            return jnp.einsum("bjJc,ocxjyJ->bxyo", xc, ws).astype(jnp.float32)

        if reflect:
            tl = fx(x[:, 1:p + 1, 1:p + 1, :])
            tr = fx(x[:, 1:p + 1, W - 2:W - 2 - p:-1, :])
            bl = fx(x[:, H - 2:H - 2 - p:-1, 1:p + 1, :])
            br = fx(x[:, H - 2:H - 2 - p:-1, W - 2:W - 2 - p:-1, :])
        else:
            def rep(v):
                return jnp.broadcast_to(v[:, None, None, :], (B, p, p, C))
            tl, tr = rep(fx(x[:, :1, :1, :])[:, 0, 0]), rep(fx(x[:, :1, W - 1:, :])[:, 0, 0])
            bl = rep(fx(x[:, H - 1:, :1, :])[:, 0, 0])
            br = rep(fx(x[:, H - 1:, W - 1:, :])[:, 0, 0])

        c_tl = corner(tl, idx_near, idx_near)
        c_tr = corner(tr, idx_near, idx_far)[:, :, ::-1]
        c_bl = corner(bl, idx_far, idx_near)[:, ::-1]
        c_br = corner(br, idx_far, idx_far)[:, ::-1, ::-1]
        out = out - jnp.pad(c_tl, ((0, 0), (0, H - p), (0, W - p), (0, 0)))
        out = out - jnp.pad(c_tr, ((0, 0), (0, H - p), (W - p, 0), (0, 0)))
        out = out - jnp.pad(c_bl, ((0, 0), (H - p, 0), (0, W - p), (0, 0)))
        out = out - jnp.pad(c_br, ((0, 0), (H - p, 0), (W - p, 0), (0, 0)))

        out = out.astype(ctx.dtype)
        if want_stats:
            # kernel stats cover the base (zero-pad) conv only; fix up the
            # p-wide ring the corrections touched with disjoint thin slices.
            # Both operands are ALREADY-materialized compute-dtype tensors
            # (the kernel output and the layer output) — adjusting from the
            # f32 accumulator instead gave it multiple consumers and XLA
            # materialized full f32 HR copies (profiled: (bf16, f32) dual
            # fusion outputs across every chain conv).
            def ring_sums(t, sq):
                def part(v):
                    v = v.astype(jnp.float32)
                    return jnp.sum(jnp.square(v) if sq else v, axis=(1, 2))

                return (part(t[:, :p]) + part(t[:, H - p:])
                        + part(t[:, p:H - p, :p]) + part(t[:, p:H - p, W - p:]))

            s = s0 + ring_sums(out, False) - ring_sums(base_cast, False)
            s2 = s20 + ring_sums(out, True) - ring_sums(base_cast, True)

        if add_bias and self.bias:
            out = out + params[prefix + "bias"].astype(ctx.dtype)
        if want_stats:
            return out, s, s2
        return out

    def apply_pad_fused(self, params, x, prefix, ctx, p, mode):
        """[ReflectionPad2d/ReplicationPad2d(p), this conv(pad=0)] as one op."""
        w = params[prefix + "weight"].astype(ctx.dtype)
        return self._pad_fused(params, x.astype(ctx.dtype), prefix, ctx, w, p, mode)

    def _pad_fused(self, params, x, prefix, ctx, w, p, mode):
        """Zero-padded conv + exact thin border strips.

        jnp.pad(reflect/edge) lowers to reverse+concatenate chains that copy
        the full tensor twice (and its VJP to dynamic-update-slice chains) —
        measured 13% of the SR step's compiler-estimated cycles. A zero-padded
        conv is already correct for every output pixel whose window stays
        inside the image; only a p-wide output ring sees the padding. So: run
        the conv with zero padding (fused, no materialization), then compute
        the ring exactly with four thin strip convs on (k-1+p)-wide slices
        padded with the true reflect/edge values, and patch them in. Left and
        right strips span the full height and own the corners; top and bottom
        strips cover the interior columns.
        """
        k, H, W = self.k, x.shape[1], x.shape[2]

        def rows_lo(t):  # p padding rows above t's first row
            return t[:, p:0:-1] if mode == "reflect" else jnp.repeat(t[:, :1], p, axis=1)

        def rows_hi(t):  # p padding rows below t's last row
            n = t.shape[1]
            return (t[:, n - 2:n - 2 - p:-1] if mode == "reflect"
                    else jnp.repeat(t[:, n - 1:n], p, axis=1))

        out = self._conv(x, w, (p, p), (p, p))

        # left/right: full height, p columns, exact corners
        if mode == "reflect":
            l_pad, r_pad = x[:, :, p:0:-1], x[:, :, W - 2:W - 2 - p:-1]
        else:
            l_pad = jnp.repeat(x[:, :, :1], p, axis=2)
            r_pad = jnp.repeat(x[:, :, W - 1:W], p, axis=2)

        xl = jnp.concatenate([l_pad, x[:, :, :k - 1]], axis=2)
        xl = jnp.concatenate([rows_lo(xl), xl, rows_hi(xl)], axis=1)
        left = self._conv(xl, w, (0, 0), (0, 0))  # (B, H, p, O)

        xr = jnp.concatenate([x[:, :, W - (k - 1):], r_pad], axis=2)
        xr = jnp.concatenate([rows_lo(xr), xr, rows_hi(xr)], axis=1)
        right = self._conv(xr, w, (0, 0), (0, 0))

        # top/bottom: p rows, interior columns (zero col-pad is exact there)
        xt = jnp.concatenate([rows_lo(x), x[:, :k - 1]], axis=1)
        top = self._conv(xt, w, (0, 0), (p, p))[:, :, p:W - p]
        xb = jnp.concatenate([x[:, H - (k - 1):], rows_hi(x)], axis=1)
        bottom = self._conv(xb, w, (0, 0), (p, p))[:, :, p:W - p]

        # patch the ring in with lazy zero-pads + selects — these fuse into
        # ONE pass over the output, unlike .at[].set whose dynamic-update-
        # slice chains materialized intermediate copies (the first fused_pad
        # attempt measured 9% slower than jnp.pad for exactly that reason)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 1)
        lpad = jnp.pad(left, ((0, 0), (0, 0), (0, W - p), (0, 0)))
        rpad = jnp.pad(right, ((0, 0), (0, 0), (W - p, 0), (0, 0)))
        tpad = jnp.pad(top, ((0, 0), (0, H - p), (p, p), (0, 0)))
        bpad = jnp.pad(bottom, ((0, 0), (H - p, 0), (p, p), (0, 0)))
        inner_col = (col >= p) & (col < W - p)
        out = jnp.where(col < p, lpad, out)
        out = jnp.where(col >= W - p, rpad, out)
        out = jnp.where((row < p) & inner_col, tpad, out)
        out = jnp.where((row >= H - p) & inner_col, bpad, out)
        out = out.astype(ctx.dtype)
        if self.bias:
            out = out + params[prefix + "bias"].astype(ctx.dtype)
        return out

    def apply_split(self, params, parts, prefix, ctx):
        """conv(concat(parts, axis=-1)) as a sum of channel-sliced convs.

        The SR/main Task input is a 133-channel HR concatenate whose HLO
        materialization cost two ~35 ms layout copies per step; splitting the
        first conv over the operands reads each input exactly once and never
        builds the concatenated tensor. Zero padding commutes with the
        channel split, so this is the same math in a different summation
        order.
        """
        w = params[prefix + "weight"].astype(ctx.dtype)
        pad = self.padding
        acc = None
        lo = 0
        for part in parts:
            c = part.shape[-1]
            y = self._conv(part.astype(ctx.dtype), w[:, lo:lo + c],
                           (pad, pad), (pad, pad))
            acc = y if acc is None else acc + y
            lo += c
        assert lo == self.in_ch, f"split channels {lo} != in_ch {self.in_ch}"
        acc = acc.astype(ctx.dtype)
        if self.bias:
            acc = acc + params[prefix + "bias"].astype(ctx.dtype)
        return acc


class ConvTranspose2d(Layer):
    """torch ConvTranspose2d via lhs-dilated convolution (weight IOHW)."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=2, padding=1,
                 output_padding=0, bias=True):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k = kernel_size
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.bias = bias

    def init(self, key, prefix, cfg):
        kw, kb = jax.random.split(key)
        p = {prefix + "weight": init_weight(kw, (self.in_ch, self.out_ch, self.k, self.k), cfg)}
        if self.bias:
            p[prefix + "bias"] = jnp.zeros((self.out_ch,), jnp.float32)
        return p

    def _phase_geometry(self, m):
        """Per-phase (sub-kernel parity, negative-allowed padding) for s=2.

        From the lhs-dilated formulation out[n] = sum_j wf[j] * xd[n+j-lo]
        with xd[2m]=x[m]: only taps j with parity (lo - n) mod 2 hit real
        inputs, so each output phase a = n mod 2 is a STRIDE-1 conv of x with
        the parity-a sub-kernel — no dilated zeros, clean MXU shapes.
        Returns None when the two phases disagree in length (odd output).
        """
        k, p, op = self.k, self.padding, self.output_padding
        lo = k - 1 - p
        n_out = (m - 1) * 2 + k - 2 * p + op
        if n_out % 2:
            return None
        phases = []
        for a in (0, 1):
            ra = (lo - a) % 2
            ka = len(range(ra, k, 2))
            s_a = (a + ra - lo) // 2
            qa = (n_out - a + 1) // 2
            pl = -s_a
            ph = qa + ka - 1 - m + s_a
            phases.append((ra, pl, ph, qa))
        if phases[0][3] != phases[1][3]:
            return None
        return phases

    def phase_ok(self, x, ctx):
        return (ctx.phase_convt and self.stride == 2 and x.ndim == 4
                and x.shape[1] * x.shape[2] >= 1 << 12
                and self._phase_geometry(x.shape[1]) is not None
                and self._phase_geometry(x.shape[2]) is not None)

    def _apply_phases(self, x, wf):
        """Subpixel decomposition: out[2q+a, 2r+b] = phase_ab conv."""
        gh = self._phase_geometry(x.shape[1])
        gw = self._phase_geometry(x.shape[2])
        rows = []
        for ra, plh, phh, qh in gh:
            cols = []
            for rb, plw, phw, qw in gw:
                cols.append(jax.lax.conv_general_dilated(
                    x, wf[:, :, ra::2, rb::2],
                    window_strides=(1, 1),
                    padding=((plh, phh), (plw, phw)),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"),
                ))
            rows.append(jnp.stack(cols, axis=3))  # [B, Qh, Qw, 2, O]
        z = jnp.stack(rows, axis=2)               # [B, Qh, 2, Qw, 2, O]
        b, qh, _, qw, _, o = z.shape
        return z.reshape(b, 2 * qh, 2 * qw, o)

    def apply(self, params, x, prefix, ctx):
        w = params[prefix + "weight"].astype(ctx.dtype)
        # (I, O, kh, kw) -> flipped (O, I, kh, kw): transposed conv is the
        # gradient of conv == conv with spatially-flipped, channel-swapped kernel.
        w = jnp.flip(jnp.swapaxes(w, 0, 1), axis=(2, 3))
        x = x.astype(ctx.dtype)
        if self.phase_ok(x, ctx):
            # lhs-dilation measured at 244 GB/s effective on the profile —
            # the 4 parity sub-convs + one interleave reshape beat it by
            # never touching dilated zeros
            out = self._apply_phases(x, w).astype(ctx.dtype)
        else:
            lo = self.k - 1 - self.padding
            hi = self.k - 1 - self.padding + self.output_padding
            out = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            ).astype(ctx.dtype)
        if self.bias:
            out = out + params[prefix + "bias"].astype(ctx.dtype)
        return out


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _sum_and_sumsq_hw(x):
    """One-pass (sum, sum of squares) over the H, W axes of an NHWC tensor.

    Two separate jnp.mean reductions read the full activation twice; the HLO
    profile (tools/hlo_bytes.py) showed them unfused at ~6.5% of the SR
    step's estimated cycles. A single variadic lax.reduce makes one pass; the
    custom VJP (lax.reduce with a non-monoid tuple computation has no
    autodiff rule) is the same single-pass expression the E[x^2]-E[x]^2
    gradient had: g_sum + 2 x g_sumsq, broadcast back.
    """
    x32 = x.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    return jax.lax.reduce((x32, jnp.square(x32)), (zero, zero),
                          lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2))


def _sum_and_sumsq_hw_fwd(x):
    return _sum_and_sumsq_hw(x), x


def _sum_and_sumsq_hw_bwd(x, g):
    g_s, g_s2 = g[0][:, None, None, :], g[1][:, None, None, :]
    return ((g_s + 2.0 * x.astype(jnp.float32) * g_s2).astype(x.dtype),)


_sum_and_sumsq_hw.defvjp(_sum_and_sumsq_hw_fwd, _sum_and_sumsq_hw_bwd)


class InstanceNorm2d(Layer):
    """affine=False, track_running_stats=False (models/networks.py:30).

    Statistics accumulate in float32; the normalization itself stays in the
    compute dtype so no full-tensor f32 temporaries are materialized (HBM
    matters more than the last bf16 bit here)."""

    def __init__(self, num_features, eps=1e-5):
        self.eps = eps

    def apply(self, params, x, prefix, ctx):
        # E[x^2] - E[x]^2 form: the VJP stays in the compute dtype (the
        # centered form materializes full-tensor f32 (x - mean) residuals in
        # the backward pass — the dominant HBM cost at SR resolutions).
        if ctx.onepass_stats:
            n = x.shape[1] * x.shape[2]
            s, s2 = _sum_and_sumsq_hw(x)
            mean = (s / n)[:, None, None, :]
            meansq = (s2 / n)[:, None, None, :]
        else:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
            meansq = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True, dtype=jnp.float32)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        if ctx.fold_norm:
            # Single-FMA form: y = x*scale + shift with per-(B,C) f32
            # vectors. The product rule backward then needs only x (already
            # the stats residual) — the (x - mean) full-tensor residual the
            # two-op form saves for its mul VJP disappears from HBM.
            inv = jax.lax.rsqrt(var + self.eps)
            shift = (-mean * inv).astype(ctx.dtype)
            return x * inv.astype(ctx.dtype) + shift
        scale = jax.lax.rsqrt(var + self.eps).astype(ctx.dtype)
        return (x - mean.astype(ctx.dtype)) * scale


def _norm_vectors(norm, params, nprefix, s, s2, n, bias):
    """Per-(batch, channel) f32 (scale, shift) with norm(x + bias) ==
    x * scale + shift, from one-pass moments of the BIAS-LESS x.

    The fused conv kernel never adds its bias; folding it here is exact:
    sums of (x + b) are s + n*b and s2 + 2*b*s + n*b^2 per channel. For
    InstanceNorm the bias then cancels in the mean subtraction (var is
    unchanged); for GroupNorm the per-channel biases shift the group
    moments and survive as per-channel offsets — both fall out of the same
    formulas. Affine GroupNorm weight/bias fold into the vectors too.
    """
    s = s.astype(jnp.float32)
    s2 = s2.astype(jnp.float32)
    if bias is not None:
        b = bias.astype(jnp.float32)
        s2 = s2 + 2.0 * b * s + n * jnp.square(b)
        s = s + n * b
    else:
        b = 0.0
    if isinstance(norm, GroupNorm):
        bsz, c = s.shape
        g, cs = norm.g, c // norm.g
        mean = jnp.repeat(s.reshape(bsz, g, cs).sum(-1) / (n * cs), cs, axis=1)
        meansq = jnp.repeat(s2.reshape(bsz, g, cs).sum(-1) / (n * cs), cs, axis=1)
    else:
        mean = s / n
        meansq = s2 / n
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + norm.eps)
    scale = inv
    shift = (b - mean) * inv
    if getattr(norm, "affine", False):
        gamma = params[nprefix + "weight"].astype(jnp.float32)
        beta = params[nprefix + "bias"].astype(jnp.float32)
        scale = scale * gamma
        shift = shift * gamma + beta
    return scale, shift


class GroupNorm(Layer):
    """GroupNorm; translation lineage uses num_groups=8, affine=True
    (models/translation_network.py:46)."""

    def __init__(self, num_groups, num_channels, affine=True, eps=1e-5):
        self.g = num_groups
        self.c = num_channels
        self.affine = affine
        self.eps = eps

    def init(self, key, prefix, cfg):
        if not self.affine:
            return {}
        k1, _ = jax.random.split(key)
        # reference init_weights: norm affine weight ~ N(1, 0.02), bias 0
        # (models/translation_network.py:111-113)
        w = 1.0 + 0.02 * jax.random.normal(k1, (self.c,), jnp.float32)
        return {prefix + "weight": w, prefix + "bias": jnp.zeros((self.c,), jnp.float32)}

    def apply(self, params, x, prefix, ctx):
        b, h, w_, c = x.shape
        xg = x.reshape(b, h, w_, self.g, c // self.g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
        meansq = jnp.mean(jnp.square(xg), axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        if ctx.fold_norm:
            # Fold the affine gamma/beta into the per-(B,1,1,G,1) f32
            # normalize vectors: one FMA instead of normalize + affine
            # (two full-tensor passes and an extra mul residual).
            inv = jax.lax.rsqrt(var + self.eps)
            shift = -mean * inv
            if self.affine:
                gamma = params[prefix + "weight"].astype(jnp.float32)
                beta = params[prefix + "bias"].astype(jnp.float32)
                gg = gamma.reshape(1, 1, 1, self.g, c // self.g)
                bb = beta.reshape(1, 1, 1, self.g, c // self.g)
                inv = inv * gg
                shift = shift * gg + bb
            out = xg * inv.astype(ctx.dtype) + shift.astype(ctx.dtype)
            return out.reshape(b, h, w_, c)
        scale = jax.lax.rsqrt(var + self.eps).astype(ctx.dtype)
        out = ((xg - mean.astype(ctx.dtype)) * scale).reshape(b, h, w_, c)
        if self.affine:
            out = out * params[prefix + "weight"].astype(ctx.dtype) \
                + params[prefix + "bias"].astype(ctx.dtype)
        return out


class BatchNorm2d(Layer):
    """affine=True, track_running_stats=True (models/networks.py:28).

    Running stats live in the param dict (non-trainable keys; the trainer
    filters ``running_`` / ``num_batches`` keys out of the optimizer).
    Train-mode normalization uses batch statistics; when ``ctx.stats`` is
    provided, torch-momentum running-stat updates are written into it
    (running_var from the UNBIASED batch variance, torch BatchNorm2d docs)
    and the model's train step merges them back into the params. In practice
    this matters for the Gu discriminator (translation_network.py:779-820,
    BatchNorm by construction) and any net under ``--norm batch``.
    """

    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        self.c = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, key, prefix, cfg):
        k1, _ = jax.random.split(key)
        return {
            prefix + "weight": 1.0 + cfg.init_gain * jax.random.normal(k1, (self.c,), jnp.float32),
            prefix + "bias": jnp.zeros((self.c,), jnp.float32),
            prefix + "running_mean": jnp.zeros((self.c,), jnp.float32),
            prefix + "running_var": jnp.ones((self.c,), jnp.float32),
            prefix + "num_batches_tracked": jnp.zeros((), jnp.int32),
        }

    def apply(self, params, x, prefix, ctx):
        x32 = x.astype(jnp.float32)
        if ctx.train:
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.var(x32, axis=(0, 1, 2))
            if ctx.stats is not None:
                rm_k = prefix + "running_mean"
                rv_k = prefix + "running_var"
                nb_k = prefix + "num_batches_tracked"
                n = x32.shape[0] * x32.shape[1] * x32.shape[2]
                unbiased = var * (n / (n - 1)) if n > 1 else var
                # chain across repeated forwards of the same net in one step
                rm = ctx.stats.get(rm_k, params[rm_k])
                rv = ctx.stats.get(rv_k, params[rv_k])
                nb = ctx.stats.get(nb_k, params[nb_k])
                mom = self.momentum
                ctx.stats[rm_k] = jax.lax.stop_gradient((1 - mom) * rm + mom * mean)
                ctx.stats[rv_k] = jax.lax.stop_gradient((1 - mom) * rv + mom * unbiased)
                ctx.stats[nb_k] = nb + 1
        else:
            mean = params[prefix + "running_mean"]
            var = params[prefix + "running_var"]
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        out = out * params[prefix + "weight"] + params[prefix + "bias"]
        return out.astype(ctx.dtype)


# ---------------------------------------------------------------------------
# Activations / pads / misc
# ---------------------------------------------------------------------------


class ReLU(Layer):
    def apply(self, params, x, prefix, ctx):
        return jax.nn.relu(x)


class LeakyReLU(Layer):
    def __init__(self, negative_slope=0.2):
        self.slope = negative_slope

    def apply(self, params, x, prefix, ctx):
        return jax.nn.leaky_relu(x, self.slope)


class Tanh(Layer):
    def apply(self, params, x, prefix, ctx):
        return jnp.tanh(x)


class ReflectionPad2d(Layer):
    def __init__(self, pad):
        self.pad = pad

    def apply(self, params, x, prefix, ctx):
        p = self.pad
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ReplicationPad2d(Layer):
    def __init__(self, pad):
        self.pad = pad

    def apply(self, params, x, prefix, ctx):
        p = self.pad
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")


class Upsample(Layer):
    """nearest / bilinear upsample by integer scale factor (torch semantics)."""

    def __init__(self, scale_factor=2, mode="nearest", align_corners=False):
        self.s = int(scale_factor)
        self.mode = mode
        self.align_corners = align_corners

    def apply(self, params, x, prefix, ctx):
        b, h, w, c = x.shape
        if self.mode == "nearest":
            return jnp.repeat(jnp.repeat(x, self.s, axis=1), self.s, axis=2)
        from desr_tpu.ops.resize import resize_bilinear

        return resize_bilinear(x, (h * self.s, w * self.s))


class Dropout(Layer):
    def __init__(self, rate=0.5):
        self.rate = rate

    def apply(self, params, x, prefix, ctx):
        if not ctx.train or ctx.rng is None or self.rate == 0.0:
            return x
        import zlib

        keep = 1.0 - self.rate
        rng = jax.random.fold_in(ctx.rng, zlib.crc32(prefix.encode()) % (2 ** 31))
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Norm-layer factory (mirrors get_norm_layer in both reference lineages)
# ---------------------------------------------------------------------------


# Side-effect-free layers whose runs `run_block_remat` may place under
# jax.checkpoint. BatchNorm2d is deliberately absent (ctx.stats sink);
# composite layers (ResnetBlock / U-Net levels, defined in networks.py)
# are absent so they self-handle with per-level segments.
_REMAT_PRIMS = (Conv2d, ConvTranspose2d, InstanceNorm2d, GroupNorm,
                ReLU, LeakyReLU, Tanh, ReflectionPad2d, ReplicationPad2d,
                Upsample, Dropout, Identity)


def get_norm_layer(norm_type, lineage="pix2pix"):
    """Return (factory(ch) -> Layer, use_bias_for_convs).

    pix2pix lineage (models/networks.py:18-37): batch | instance(no affine) |
    group(affine=False) | none; convs use bias only with instance norm.
    translation lineage (models/translation_network.py:34-53): group =
    GroupNorm(8, affine=True); use_bias = (norm == 'instance').
    """
    if norm_type == "batch":
        return (lambda ch: BatchNorm2d(ch)), False
    if norm_type == "instance":
        return (lambda ch: InstanceNorm2d(ch)), True
    if norm_type == "group":
        if lineage == "translation":
            return (lambda ch: GroupNorm(8, ch, affine=True)), False
        return (lambda ch: GroupNorm(8, ch, affine=False)), False
    if norm_type == "none":
        return (lambda ch: Identity()), True
    raise NotImplementedError(f"norm layer {norm_type}")


# ---------------------------------------------------------------------------
# Spectral norm wrapper (translation discriminators, --use_spnorm)
# ---------------------------------------------------------------------------


class SpectralNormConv2d(Conv2d):
    """Conv2d with spectral weight normalization.

    Mirrors torch.nn.utils.spectral_norm applied post-hoc
    (models/translation_network.py:721-733). State_dict keys become
    ``weight_orig`` / ``weight_u`` / ``weight_v``. The power-iteration vector u
    is stored in params (non-trainable); apply() runs `n_iters` fresh power
    iterations from the stored u under stop_gradient. Deviation (documented):
    torch persists the updated u after every forward; we re-estimate from the
    checkpointed u at each call with extra iterations, which converges to the
    same sigma.
    """

    n_iters = 3

    def init(self, key, prefix, cfg):
        p = super().init(key, prefix, cfg)
        w = p.pop(prefix + "weight")
        rows = w.shape[0]
        ku = jax.random.fold_in(key, 7)
        u = jax.random.normal(ku, (rows,), jnp.float32)
        u = u / jnp.linalg.norm(u)
        # converge the power iteration at init so apply()'s few refresh
        # iterations track sigma accurately (torch amortizes this over
        # thousands of forwards by persisting u)
        wm = w.reshape(rows, -1)
        v = jnp.zeros((wm.shape[1],), jnp.float32)
        for _ in range(30):
            v = wm.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            u = wm @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
        p[prefix + "weight_orig"] = w
        p[prefix + "weight_u"] = u
        p[prefix + "weight_v"] = v
        return p

    def apply(self, params, x, prefix, ctx):
        w = params[prefix + "weight_orig"]
        rows = w.shape[0]
        wm = w.reshape(rows, -1)
        u = params[prefix + "weight_u"]
        for _ in range(self.n_iters):
            v = wm.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            u = wm @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (wm @ v)
        w_sn = (w / sigma).astype(jnp.float32)
        sub = dict(params)
        sub[prefix + "weight"] = w_sn
        return Conv2d.apply(self, sub, x, prefix, ctx)
