"""Pallas TPU convolution kernels for the hot stride-1 convs.

Motivation (PERF.md round-2 profile, SR step at 0.407 s): XLA's conv fusions
run at ~24-70% MXU on this program's shapes and are surrounded by ~124 ms/step
of layout-change copies. Microbenchmarks (tools/bench_pallas_conv.py) show a
hand-tiled im2col kernel beats XLA's lowering on the 128-channel 3x3 resnet
convs (XLA 24 TF/s -> pallas 31 TF/s) while XLA wins on the 256-channel
translator blocks (52 TF/s) — so routing is per-shape and hardware-measured,
never assumed.

``conv2d_pallas``: stride-1 NHWC convolution with OIHW weights and a static
symmetric VIRTUAL zero pad p in {0..3}:

- The grid walks (batch, H-row-bands). Each step DMAs one full-width
  (R + k - 1)-row input band HBM->VMEM (H is the untiled memref dim; W/C
  slices would need (8,128)-tile alignment, so W is never sliced in HBM).
- Zero padding is virtual: the band buffer is zeroed, the DMA lands at a
  row/col offset, and boundary bands clamp their row ranges — nothing is
  materialized in HBM. Reflect/edge semantics stay with the callers: the
  ring-correction path (layers.Conv2d.apply_ring) already decomposes
  reflect-pad convs into a zero-pad conv + exact additive border terms, and
  the stems keep their materialized reflect pads (hardware-pinned, PERF.md).
- The W axis is swept in chunks inside the kernel; each chunk contracts
  groups of ``g = max(1, 128 // C_in)`` horizontally-adjacent taps per MXU
  matmul so the contraction dim is >= min(128, k*C_in). For C_in < 128 the
  CALLER pre-expands taps into lanes (``_expand_taps``: concat of g W-shifted
  slices — one XLA pass that fuses with the producing pad, and small-C HBM
  arrays are lane-padded to 128 by XLA anyway, so the expanded bytes are the
  bytes the DMA would have moved regardless). This is the restructure XLA's
  space-to-batch lowering lacks for small-C_in kernels like the 7x7 32->128
  Depth_f head (31 ms at 35% MXU); Mosaic cannot DMA sub-128-lane extents,
  which rules out in-kernel expansion.

f32 accumulation, in/out in the compute dtype. Backward stays on XLA
(custom_vjp): dx/dw of a conv are convs, and the kernel's biggest wins are on
FROZEN nets (the stage-2 translator runs forward-only every step).

Semantics cross-checked against jax.lax.conv_general_dilated in
tests/test_pallas_conv.py (interpret mode on CPU, real kernels on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_VMEM_BUDGET = 11 * 1024 * 1024
_XOFF = 8  # band-buffer column where real col 0 lands (8-aligned DMA dst)


def _divisors(n, lo, hi):
    return [t for t in range(lo, min(n, hi) + 1) if n % t == 0]


def _plan(x_shape, k, c_out, pad, dtype_bytes=2, fused=False):
    """Pick (R rows/grid-step, WC compute-chunk cols) under the VMEM budget.

    Returns None when the shape has no legal/profitable tiling and the caller
    must fall back to the XLA conv. ``fused`` reserves room for the
    prologue's chunked f32 transform temps and the stats output block.
    """
    b, h, w, c = x_shape
    ho, wo = h - k + 1 + 2 * pad, w - k + 1 + 2 * pad
    if ho < 16 or wo < 128:
        return None
    if c < 16:
        return None  # tap expansion can't reach a useful contraction dim
    gsize = min(max(1, 128 // c), k)
    if gsize > 1:
        if pad:
            return None  # caller-side tap expansion needs a pre-padded input
        kp = -(-k // gsize) * gsize
        w_eff = _align8(wo + kp - gsize)  # width of the expanded array
    else:
        if w % 8 != 0:
            return None  # Mosaic DMA: logical W extent must be 8-aligned
        w_eff = w
    best = None
    c_eff = gsize * c
    c_lane = max(c_eff, 128)  # VMEM lane padding of the band buffer
    wb = _XOFF + w_eff + 8
    wbytes = k * k * c * c_out * dtype_bytes
    # one 8-row f32 prologue chunk temp (x1.5 margin for Mosaic's scoped
    # stack) + the double-buffered stats block
    fbytes = (12 * wb * c_lane * 4 + 2 * 8 * max(c_out, 128) * 4) if fused else 0
    for r in _divisors(ho, 8, 64):
        if r + k - 1 > h or (pad and ho // r < 2):
            continue  # band exceeds the image / boundary branches need nh>=2
        xbytes = (r + k - 1) * wb * c_lane * dtype_bytes
        outbytes = 2 * r * wo * max(c_out, 128) * dtype_bytes
        for wc in (128, 256, 384, 512, 640):
            if wc > wo:
                break
            accbytes = r * wc * c_out * 4
            if xbytes + accbytes + outbytes + wbytes + fbytes > _VMEM_BUDGET:
                continue
            key = (r * wc, wc)
            if best is None or key > best[0]:
                best = (key, r, wc)
    if best is None:
        return None
    return best[1], best[2]


def conv2d_pallas_supported(x_shape, k, c_out, pad=0, dtype_bytes=2,
                            fused=False):
    """Whether conv2d_pallas has a tiling for this config."""
    if not _HAS_PALLAS or pad not in (0, 1, 2, 3) or (pad and _XOFF < pad):
        return False
    if x_shape[0] * ((x_shape[1] - k + 1 + 2 * pad)) < 2 * 8:
        return False
    return _plan(x_shape, k, c_out, pad, dtype_bytes, fused=fused) is not None


def _conv_kernel(*refs, k, R, WC, C, O, WO, W, H, pad, gsize, kp,
                 prologue=False, relu=False, stats=False):
    # refs: x_hbm, w_ref[, scale_ref, shift_ref], out_ref[, stats_ref],
    #        xbuf, sem — composition is static per (prologue, stats) variant.
    it = iter(refs)
    x_hbm, w_ref = next(it), next(it)
    scale_ref = next(it) if prologue else None
    shift_ref = next(it) if prologue else None
    out_ref = next(it)
    stats_ref = next(it) if stats else None
    xbuf, sem = next(it), next(it)

    b = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    band = R + k - 1

    xbuf[:] = jnp.zeros_like(xbuf)

    # band row r holds virtually-padded row i*R + r; clamp boundary bands.
    # The fused normalize(+ReLU) prologue runs on exactly the DMA'd extent so
    # the virtual zero padding stays zero (relu(0*s+t) != 0 in general).
    def dma(src_row, dst_row, rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_row, rows), :, :],
            xbuf.at[pl.ds(dst_row, rows), pl.ds(_XOFF, W), :], sem)
        cp.start()
        cp.wait()
        if prologue:
            # 8-row chunks bound the f32 temp (a full-band transform's
            # scoped-vmem stack blew the 16M limit at the 104x160x128 shape)
            sc = scale_ref[pl.ds(b, 1), :]
            sh = shift_ref[pl.ds(b, 1), :]
            for r0 in range(0, rows, 8):
                rr = min(8, rows - r0)
                v = xbuf[pl.ds(dst_row + r0, rr), pl.ds(_XOFF, W), :].astype(jnp.float32)
                v = v * sc + sh
                if relu:
                    v = jnp.maximum(v, 0.0)
                xbuf[pl.ds(dst_row + r0, rr), pl.ds(_XOFF, W), :] = v.astype(xbuf.dtype)

    if pad == 0:
        dma(i * R, 0, band)
    else:
        @pl.when(i == 0)
        def _():
            dma(0, pad, band - pad)

        @pl.when(i == nh - 1)
        def _():
            dma(i * R - pad, 0, band - pad)

        @pl.when(jnp.logical_and(i > 0, i < nh - 1))
        def _():
            dma(i * R - pad, 0, band)

    x = xbuf[:]
    base = _XOFF - pad
    ssum = jnp.zeros((O,), jnp.float32) if stats else None
    ss2 = jnp.zeros((O,), jnp.float32) if stats else None
    for j0 in range(0, WO, WC):  # static W sweep (ragged tail chunk allowed)
        wj = min(WC, WO - j0)
        acc = jnp.zeros((R * wj, O), jnp.float32)
        for dy in range(k):
            for g0 in range(0, kp, gsize):
                # pre-expanded inputs (gsize > 1): cell w holds taps
                # w..w+gsize-1 in lanes, so group g0 reads a W-shift of g0
                # cells; plain inputs read single taps. Same indexing.
                w0 = base + j0 + g0
                xm = x[dy:dy + R, w0:w0 + wj, :]
                xm = xm.reshape(R * wj, gsize * C)
                wm = w_ref[dy, g0 * C:(g0 + gsize) * C, :]
                acc = acc + jnp.dot(xm, wm, preferred_element_type=jnp.float32)
        out_ref[0, :, j0:j0 + wj, :] = (
            acc.reshape(R, wj, O).astype(out_ref.dtype))
        if stats:
            # per-band partials of the RAW f32 accumulator (pre output-dtype
            # rounding); the caller reduces over bands
            ssum = ssum + jnp.sum(acc, axis=0)
            ss2 = ss2 + jnp.sum(jnp.square(acc), axis=0)
    if stats:
        # rows 0/1 = sum/sumsq, padded to the 8-sublane tile; concatenate
        # (not .at[].set — Mosaic has no scatter lowering)
        stats_ref[0, 0] = jnp.concatenate(
            [ssum[None], ss2[None], jnp.zeros((6, O), jnp.float32)], axis=0)


def _align8(n):
    return -(-n // 8) * 8


def _expand_taps(x, gsize, we):
    """Lane-expand horizontal taps: xe[b, h, w, t*C+c] = x[b, h, w+t, c].

    One XLA pass (concat of shifted slices, zero-extended on the right so
    cells whose extra taps run off the image exist but only ever multiply
    zero-padded weight rows). Output width is 8-aligned for the DMA.
    """
    b, h, w, c = x.shape
    need = we + gsize - 1  # rightmost source column index + 1
    if need > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - w), (0, 0)))
    return jnp.concatenate([x[:, :, t:t + we, :] for t in range(gsize)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("k", "pad", "relu", "stats", "interpret"))
def _conv_pallas_impl(x, wmat, k, pad=0, scale=None, shift=None, relu=False,
                      stats=False, interpret=False):
    b, h, w, c = x.shape
    o = wmat.shape[-1]
    ho, wo = h - k + 1 + 2 * pad, w - k + 1 + 2 * pad
    prologue = scale is not None
    plan = _plan(x.shape, k, o, pad, x.dtype.itemsize,
                 fused=prologue or stats)
    R, WC = plan
    gsize = min(max(1, 128 // c), k)
    kp = -(-k // gsize) * gsize  # taps zero-padded to a multiple of gsize
    assert not (prologue and gsize > 1), "prologue needs unexpanded lanes"
    if kp > k:
        pad_w = jnp.zeros((k, (kp - k) * c, o), wmat.dtype)
        wmat = jnp.concatenate([wmat, pad_w], axis=1)
    if gsize > 1:
        x = _expand_taps(x, gsize, _align8(wo + kp - gsize))

    w_eff, c_eff = x.shape[2], x.shape[3]
    nh = ho // R
    kern = functools.partial(_conv_kernel, k=k, R=R, WC=WC, C=c, O=o, WO=wo,
                             W=w_eff, H=h, pad=pad, gsize=gsize, kp=kp,
                             prologue=prologue, relu=relu, stats=stats)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((k, kp * c, o), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x, wmat]
    if prologue:
        # whole-array blocks (a (1, C) block of a (B>1, C) array violates
        # Mosaic's 8-sublane rule); the kernel rows-index by program_id(0)
        in_specs += [pl.BlockSpec((b, c), lambda b_, i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [scale.astype(jnp.float32), shift.astype(jnp.float32)]
    out_specs = pl.BlockSpec((1, R, wo, o), lambda b_, i: (b_, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, ho, wo, o), x.dtype)
    if stats:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, 8, o), lambda b_, i: (b_, i, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, nh, 8, o), jnp.float32))
    res = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R + k - 1, _XOFF + w_eff + 8, c_eff), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*inputs)
    if not stats:
        return res
    out, bands = res
    return out, bands[:, :, 0].sum(axis=1), bands[:, :, 1].sum(axis=1)


def _wmat(w_oihw, dtype):
    """(O, I, k, k) torch-layout weights -> (k, k*I, O) tap-major matrix."""
    o, i, kh, kw = w_oihw.shape
    return jnp.transpose(w_oihw, (2, 3, 1, 0)).reshape(kh, kw * i, o).astype(dtype)


def _conv_ref(x, w_oihw, pad=0):
    return jax.lax.conv_general_dilated(
        x, w_oihw.astype(x.dtype), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_pallas(x, w_oihw, pad=0, interpret=None):
    """Stride-1 conv, NHWC x, OIHW w, virtual zero pad; pallas forward.

    Gradient falls back to XLA's conv transforms (dx: full-conv with the
    flipped kernel; dw: activation/cotangent correlation) — the kernel's
    primary targets are frozen-net forwards.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_pallas_impl(x, _wmat(w_oihw, x.dtype), w_oihw.shape[-1],
                             pad=pad, interpret=interpret)


def _conv_fwd(x, w_oihw, pad, interpret):
    return conv2d_pallas(x, w_oihw, pad, interpret), (x, w_oihw)


def _conv_bwd(pad, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _conv_ref(xx, ww, pad), x, w)
    dx, dw = vjp(g)
    return dx, dw.astype(w.dtype)


conv2d_pallas.defvjp(_conv_fwd, _conv_bwd)


def _fused_ref(x, w_oihw, scale, shift, pad, relu, stats):
    """XLA composition with the fused kernel's semantics (used for the VJP
    and as the interpret/parity oracle)."""
    if scale is not None:
        v = x.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, None, :] \
            + shift.astype(jnp.float32)[:, None, None, :]
        if relu:
            v = jnp.maximum(v, 0.0)
        x = v.astype(x.dtype)
    out = _conv_ref(x, w_oihw, pad)
    if not stats:
        return out
    f = out.astype(jnp.float32)
    return out, jnp.sum(f, axis=(1, 2)), jnp.sum(jnp.square(f), axis=(1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def conv2d_pallas_fused(x, w_oihw, scale, shift, pad=0, relu=False,
                        stats=False, interpret=None):
    """Fused normalize(+ReLU) -> stride-1 conv (-> IN stats) in one kernel.

    ``scale``/``shift``: per-(batch, channel) f32 vectors applied to the
    input DURING the band DMA — the caller never materializes the
    normalized activation (this is the pass InstanceNorm/GroupNorm tails
    otherwise write + the next conv re-reads). Pass None to skip.
    ``stats=True`` additionally returns (sum, sumsq) of the raw f32 conv
    output over H, W per (batch, channel) — the one-pass InstanceNorm
    moments of THIS conv's output, accumulated in the MXU epilogue instead
    of a second full-tensor read. Conv bias is intentionally unsupported:
    a bias feeding an InstanceNorm cancels in the mean subtraction, so
    fused chains elide it exactly (QUIRKS.md-grade parity: torch's bias
    grads through IN are numerically ~0 and Adam's eps floors them).

    Backward falls back to the XLA composition (_fused_ref), recomputing
    the prologue like the scoped tail remat already does for these chains.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_pallas_impl(x, _wmat(w_oihw, x.dtype), w_oihw.shape[-1],
                             pad=pad, scale=scale, shift=shift, relu=relu,
                             stats=stats, interpret=interpret)


def _fused_fwd(x, w_oihw, scale, shift, pad, relu, stats, interpret):
    out = conv2d_pallas_fused(x, w_oihw, scale, shift, pad, relu, stats,
                              interpret)
    # keep the primal conv output (free: it is alive as the chain's next
    # input anyway) so the stats cotangent does not re-run the conv forward
    res = (x, w_oihw, scale, shift, out[0] if stats else None)
    return out, res


def _fused_bwd(pad, relu, stats, interpret, res, g):
    x, w, scale, shift, out = res
    if stats:
        # s = sum(out32), s2 = sum(out32^2): fold their cotangents into the
        # conv-output cotangent analytically; the remaining vjp is stats-free
        # so its primal conv is dead code (no conv recompute in backward)
        g_out, g_s, g_s2 = g
        out32 = out.astype(jnp.float32)
        g_all = (g_out.astype(jnp.float32) + g_s[:, None, None, :]
                 + 2.0 * out32 * g_s2[:, None, None, :]).astype(out.dtype)
    else:
        g_all = g
    if scale is None:
        _, vjp = jax.vjp(
            lambda xx, ww: _fused_ref(xx, ww, None, None, pad, relu, False),
            x, w)
        dx, dw = vjp(g_all)
        return dx, dw.astype(w.dtype), None, None
    _, vjp = jax.vjp(
        lambda xx, ww, sc, sh: _fused_ref(xx, ww, sc, sh, pad, relu, False),
        x, w, scale, shift)
    dx, dw, dsc, dsh = vjp(g_all)
    return dx, dw.astype(w.dtype), dsc, dsh


conv2d_pallas_fused.defvjp(_fused_fwd, _fused_bwd)
