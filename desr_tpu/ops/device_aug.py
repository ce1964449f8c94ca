"""On-device geometric augmentation (ColorJitter + rotate/crop/flip).

The reference augments on the host with an albumentations chain —
Rotate(±30°) -> RandomCrop -> HFlip (data/my_main_dataset.py:55-84,
my_I2D_dataset.py:87-102) — which PERF.md measures at ~26 pairs/sec per CPU
core, far below what one chip consumes (100+ pairs/sec at the I2D stage).
Under ``--device_aug`` the host keeps decode + deterministic resize and ships
load-size tensors; jitter, rotation, crop and flip run on the accelerator.

TPU-NATIVE DESIGN (the gather lesson): the obvious warp — a 4-tap bilinear
gather per output pixel — runs at SECONDS per batch on TPU (measured 7.6 s
for 12 pairs at the I2D shape: per-pixel gathers execute on the scalar core;
the CLAUDE.md "avoid integer-array indexing" pitfall). Rotation is instead
the classic PAETH THREE-SHEAR decomposition R = Shx(-tan(t/2)) Shy(sin t)
Shx(-tan(t/2)): each pass shifts whole LINES by per-line fractional offsets —
one vmapped ``lax.dynamic_slice`` (a gather of ~2-5 KB contiguous slices,
which TPUs do at bandwidth) plus a 2-tap blend. Crop is a dynamic_slice;
flip a reverse; ColorJitter pure elementwise fp32/int32 (the cv2 fixed-point
tables are computed arithmetically, not gathered).

Parameter LAWS are identical to the host path (desr_tpu/data/base_dataset.py
``draw_geo_params`` / transforms.draw_jitter_params are shared), so the
augmentation distribution is unchanged. Numerics vs the host chain:
crop/flip-only samples are bit-exact (zero shear shifts reduce to identity
slices); ColorJitter matches within 1 uint8 LSB except isolated pixels
(<1e-4) where fp32 reduction-order differences flip the hue uint8
truncation (bounded by the H-step's RGB slope, ~8.5/255); ROTATED samples use the
three-shear resampling kernel instead of cv2's direct bilinear — the same
rotation map (validated: interior max |diff| < 4e-3 on smooth images) with a
different interpolation kernel, a deviation that only appears at pixel-level
noise frequencies (documented; oracle-tested against a numpy reference of the
same algorithm in tests/test_device_aug.py). Borders: REFLECT_101 per shear
pass (the host chain reflects once in the unsheared frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_MAX_ANGLE_DEG = 30.0  # both host chains draw from U[-30, 30]


_SHEAR_TILE = 16


def _shear_lines(canvas, shifts, pad, max_slope):
    """Per-line 1-D resample: out[l, t] = canvas[l, t + shifts[l]] (bilinear).

    canvas (L, M, C); shifts (L,) float with |shifts| < pad, AFFINE in l with
    |d shifts / dl| <= max_slope (the shear structure). A vmapped
    dynamic_slice per LINE lowers to a serial while loop on TPU (measured
    72 ms device / exec at the I2D shape — xplane profile), so lines are
    processed in TILES of 16: within a tile the shifts span at most
    max_slope*15 + 1, so ONE dynamic_slice per tile (at the tile's floored
    minimum shift) plus a fused weighted sum over K+1 STATIC slices (the
    per-line 2-tap hat weights select the right pair) reproduces the exact
    per-line bilinear sample with ~L/16 loop iterations and no gathers.
    REFLECT_101 border via a static jnp.pad.
    """
    L, M, C = canvas.shape
    tile = _SHEAR_TILE
    n_tiles = -(-L // tile)
    Lp = n_tiles * tile
    if Lp != L:
        canvas = jnp.pad(canvas, ((0, Lp - L), (0, 0), (0, 0)))
        # edge-pad (NOT zero): a zero shift in the last tile would corrupt
        # the tile's floored-minimum base and zero out the real lines' hats
        shifts = jnp.pad(shifts, (0, Lp - L), mode="edge")
    K = int(np.ceil(max_slope * (tile - 1))) + 1
    # pad by an extra K+1 so the slice window (which extends K+1 beyond the
    # per-tile base) never hits the array bound — dynamic_slice CLAMPS
    # out-of-range starts silently, shifting the whole window
    pad_eff = pad + K + 1
    padded = jnp.pad(canvas, ((0, 0), (pad_eff, pad_eff), (0, 0)), mode="reflect")
    w_pad = M + 2 * pad_eff
    win = M + K + 1
    padded = padded.reshape(n_tiles, tile, w_pad, C)
    shifts = shifts.reshape(n_tiles, tile)
    base = jnp.floor(jnp.min(shifts, axis=1))  # (n_tiles,) integral
    rel = shifts - base[:, None]  # in [0, K)
    starts = (base + pad_eff).astype(jnp.int32)
    window = jax.vmap(
        lambda blk, s: jax.lax.dynamic_slice(blk, (0, s, 0), (tile, win, C))
    )(padded, starts)
    j = jnp.arange(K + 1, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - j))  # (n_tiles, tile, K+1)
    out = w[:, :, 0, None, None] * window[:, :, 0:M]
    for jj in range(1, K + 1):
        out = out + w[:, :, jj, None, None] * window[:, :, jj:jj + M]
    return out.reshape(Lp, M, C)[:L]


def paeth_rotate(src, angle_deg):
    """Rotate (H, W, C) about cv2's center (w/2, h/2) via three shears.

    Same rotation map as the host chain's cv2.getRotationMatrix2D warp
    (R^{-1} = Shx(a) Shy(b) Shx(a), a = -tan(angle/2), b = sin(angle) —
    composition verified against cv2 to <4e-3 interior error on smooth
    images); resampling kernel is the per-pass 2-tap blend instead of direct
    bilinear. angle_deg may be a traced scalar; angle 0 is the bit-exact
    identity (zero shifts select the unpadded lines with weight 0).
    """
    h, w = src.shape[0], src.shape[1]
    th = angle_deg * (jnp.pi / 180.0)
    a = -jnp.tan(th / 2.0)
    b = jnp.sin(th)
    y = jnp.arange(h, dtype=jnp.float32) - h / 2.0
    x = jnp.arange(w, dtype=jnp.float32) - w / 2.0
    tmax = np.tan(np.deg2rad(_MAX_ANGLE_DEG) / 2.0)
    smax = np.sin(np.deg2rad(_MAX_ANGLE_DEG))
    pad_x = int(np.ceil(tmax * (h / 2.0))) + 2
    pad_y = int(np.ceil(smax * (w / 2.0))) + 2
    out = _shear_lines(src, a * y, pad_x, tmax)
    out = _shear_lines(out.swapaxes(0, 1), b * x, pad_y, smax).swapaxes(0, 1)
    return _shear_lines(out, a * y, pad_x, tmax)


def warp_affine_crop(src, angle_deg, cy, cx, flip, out_h, out_w):
    """``hflip?(crop(rotate(src, angle)))`` — the host chain's operation
    order (T.rotate -> T.crop(cy, cx) -> T.hflip), with the rotation done by
    ``paeth_rotate`` and crop as a dynamic_slice. All params may be traced
    scalars (flip: 0.0 or 1.0; cy/cx integral floats)."""
    rot = paeth_rotate(src, angle_deg)
    out = jax.lax.dynamic_slice(
        rot, (jnp.asarray(cy).astype(jnp.int32), jnp.asarray(cx).astype(jnp.int32), 0),
        (out_h, out_w, src.shape[2]))
    return jnp.where(flip > 0.5, out[:, ::-1], out)


def warp_batch(src, params, out_h, out_w):
    """vmapped warp: src (B, H, W, C), params (B, 4) = [angle, cy, cx, flip]."""
    return jax.vmap(
        lambda s, p: warp_affine_crop(s, p[0], p[1], p[2], p[3], out_h, out_w)
    )(src, params)


# -- on-device ColorJitter (I2D stage) ---------------------------------------
#
# The host jitter (data/transforms.py color_jitter, mirroring the reference's
# torchvision ColorJitter at my_I2D_dataset.py:212-214) is the single most
# expensive host op (~30 of ~50 ms/sample on this VM's core — PERF.md "Input
# pipeline"). brightness/contrast/saturation are plain fp32 elementwise ops;
# hue is a uint8 HSV round-trip whose cv2 semantics are reproduced here:
# RGB->HSV bit-exact over all 2^24 inputs (fixed-point division tables,
# hsv_shift=12); HSV->RGB exact on 99.985% of the domain, +-1 uint8 LSB on
# the rest (XLA FMA contraction) — tests/test_device_aug.py.

_HSV_SHIFT = 12


def _rgb2hsv_u8(r, g, b):
    """cv2.COLOR_RGB2HSV on uint8 (int32 in/out): H in [0,180), S/V in [0,256).

    cv2's sdiv/hdiv fixed-point tables (sdiv[i] = rint((255<<12)/i),
    hdiv[i] = rint((180<<12)/(6i))) are computed ARITHMETICALLY in fp32
    instead of gathered — per-pixel table lookups are scalar-core gathers on
    TPU (the CLAUDE.md pitfall) and dominated the augmenter's runtime. The
    fp32 division is exactly the table: the true quotients are never at a
    .5 rounding boundary (2*1044480 = 2^13*255 and 2*122880 = 2^13*30 admit
    no odd divisor <= 255, so q = k+0.5 is impossible), and the boundary
    margin >= q/(2*1044480) exceeds the <= q*2^-24 division error 8x over.
    """
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    half = 1 << (_HSV_SHIFT - 1)
    sdiv_v = jnp.where(
        v > 0, jnp.rint(jnp.float32(255 << _HSV_SHIFT)
                        / jnp.maximum(v, 1).astype(jnp.float32)), 0.0
    ).astype(jnp.int32)
    hdiv_d = jnp.where(
        diff > 0, jnp.rint(jnp.float32((180 << _HSV_SHIFT) // 6)
                           / jnp.maximum(diff, 1).astype(jnp.float32)), 0.0
    ).astype(jnp.int32)
    s = (diff * sdiv_v + half) >> _HSV_SHIFT
    h_num = jnp.where(v == r, g - b,
                      jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h_num * hdiv_d + half) >> _HSV_SHIFT
    return jnp.where(h < 0, h + 180, h), s, v


def _hsv2rgb_u8(h, s, v):
    """cv2.COLOR_HSV2RGB on uint8 (int32 in/out).

    cv2's 8u path computes the sector interpolation in fp32 at [0, 1] scale
    and FLOORS the final value*255 — including fp32 rounding error (e.g.
    51*(1/255.f) > 0.2 makes v=5,s=51 come out 3, not 4). Reproduced
    operation-for-operation in fp32. Exhaustive sweep of the full 180*256*256
    domain vs cv2: 1758 combos (0.015%) differ by exactly +-1 LSB — XLA's
    FMA contraction of v*(1 - s*(1 - frac)) rounds across cv2's floor
    boundary; bounds asserted in tests/test_device_aug.py.
    """
    hf = h.astype(jnp.float32) * jnp.float32(6.0 / 180.0)
    sf = s.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    vf = v.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    sector = jnp.floor(hf)
    frac = hf - sector
    sec = sector.astype(jnp.int32)
    tab = [vf, vf * (1.0 - sf), vf * (1.0 - sf * frac), vf * (1.0 - sf * (1.0 - frac))]
    # OpenCV sector_data (b,g,r tab indices per sector), transposed to rgb
    r_idx, g_idx, b_idx = (0, 2, 1, 1, 3, 0), (3, 0, 0, 2, 1, 1), (1, 1, 3, 0, 0, 2)

    def pick(idx):
        out = tab[idx[0]]
        for k in range(1, 6):
            out = jnp.where(sec == k, tab[idx[k]], out)
        return jnp.floor(out * 255.0).astype(jnp.int32)

    return pick(r_idx), pick(g_idx), pick(b_idx)


def color_jitter_device(img, factors, order):
    """Device ColorJitter on one (H, W, 3) float32 RGB image in [0, 255].

    factors: (4,) [brightness, contrast, saturation, hue_shift]; order: (4,)
    int32 op permutation. Bit-matches the host apply_jitter up to the fp32
    reduction order of contrast's image mean (<=1 uint8 LSB on pixels the hue
    round-trip truncates at an integer boundary).
    """
    b, c, s, hshift = factors[0], factors[1], factors[2], factors[3]

    def do_brightness(x):
        return jnp.clip(x * b, 0.0, 255.0)

    def do_contrast(x):
        mean = jnp.mean(x)
        return jnp.clip(mean + (x - mean) * c, 0.0, 255.0)

    def do_saturation(x):
        gray = x @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        gray = gray[..., None]
        return jnp.clip(gray + (x - gray) * s, 0.0, 255.0)

    def do_hue(x):
        xi = x.astype(jnp.uint8).astype(jnp.int32)  # host: astype truncates
        h, sat, val = _rgb2hsv_u8(xi[..., 0], xi[..., 1], xi[..., 2])
        hf = (h.astype(jnp.float32) + hshift * 180.0) % 180.0
        r, g, bl = _hsv2rgb_u8(hf.astype(jnp.int32), sat, val)
        return jnp.stack([r, g, bl], axis=-1).astype(jnp.float32)

    ops = [do_brightness, do_contrast, do_saturation, do_hue]
    for i in range(4):
        img = jax.lax.switch(order[i], ops, img)
    return img


def make_pair_augmenter(out_h, out_w, jitter=False):
    """Jitted augmenter for the unpaired A/B datasets.

    Takes ``A_full``/``B_full`` (B, H, W, 4) = concat(img RGB, depth) warped
    jointly per domain (img and depth share parameters, like the host chain's
    additional_targets), and (B, 4) param rows from ``draw_geo_params``.
    Returns the standard model input keys at crop resolution.

    With ``jitter=True`` (the I2D stage) the image channels arrive in raw
    [0, 255] range plus a (B, 9) jitter row ``[b, c, s, hue, order0..3,
    enable]``: ColorJitter runs on device before normalization. ``enable=0``
    marks samples the host already jittered (raw size != load size, where
    jitter must precede the resize) — the hue round-trip is lossy, so identity
    FACTORS alone cannot express a no-op.
    """

    def warp_clip(full, geo):
        # clip AFTER the warp — the host chain clips after crop, and bicubic
        # load-size resize can overshoot [-1, 1] (prepare_full ships unclipped)
        out = warp_affine_crop(full, geo[0], geo[1], geo[2], geo[3], out_h, out_w)
        return jnp.clip(out, -1.0, 1.0)

    if not jitter:

        @jax.jit
        def fn(a_full, a_aug, b_full, b_aug):
            a = jax.vmap(warp_clip)(a_full, a_aug)
            b = jax.vmap(warp_clip)(b_full, b_aug)
            return {
                "A_i": a[..., :3], "A_d": a[..., 3:],
                "B_i": b[..., :3], "B_d": b[..., 3:],
            }

        return fn

    def one(full, geo, jit):
        img = full[..., :3]
        jittered = color_jitter_device(img, jit[:4], jit[4:8].astype(jnp.int32))
        img = jnp.where(jit[8] > 0.5, jittered, img)
        img = (img - 127.5) / 127.5  # normalize_image_np, after jitter like host
        return warp_clip(jnp.concatenate([img, full[..., 3:]], axis=-1), geo)

    @jax.jit
    def fn_jit(a_full, a_aug, a_jit, b_full, b_aug, b_jit):
        a = jax.vmap(one)(a_full, a_aug, a_jit)
        b = jax.vmap(one)(b_full, b_aug, b_jit)
        return {
            "A_i": a[..., :3], "A_d": a[..., 3:],
            "B_i": b[..., :3], "B_d": b[..., 3:],
        }

    return fn_jit


def make_sr_finisher(load_h, load_w, pad_h, pad_w, out_h, out_w):
    """Jitted device half of SR ``--device_aug`` (data/sr_dataset.py).

    The SR host chain has no rotate/flip/jitter; its cost is the full-canvas
    resize + pad (normalize -> INTER_AREA resize to 960x1280 -> REFLECT_101
    pad to 1024x1280 -> random crop, my_naive_sr_dataset.py:56-89). Under
    --device_aug the host ships the DECODED raw uint8/uint16 frames (4x
    smaller than float32) and everything else runs here: normalization
    (exact transforms.normalize_{image,depth}_np semantics, dtype-branched),
    cv2-exact INTER_AREA matmul resize (ops/resize.resize_cv2_inter_area),
    reflect pad, per-item dynamic_slice crop at HOST-drawn offsets (the same
    rng stream as the host path, so the augmentation distribution is
    unchanged), post-crop clip — matching the host chain's op order exactly.

    Takes (B, Hi, Wi, 3) uint8 images + (B, Hd, Wd) int/float depths per
    domain plus (B, 2) int32 crop offsets; returns the standard model input
    keys at crop size. One compiled variant per distinct source
    geometry/dtype (datasets are homogeneous per source in practice).
    """
    from desr_tpu.ops.resize import resize_cv2_inter_area

    def pad_amounts(rows, cols):
        top = int((pad_h - rows) / 2.0) if rows < pad_h else 0
        bot = pad_h - rows - top if rows < pad_h else 0
        left = int((pad_w - cols) / 2.0) if cols < pad_w else 0
        right = pad_w - cols - left if cols < pad_w else 0
        return (top, bot), (left, right)

    def norm_depth(d):
        # transforms.normalize_depth_np (my_main_dataset.py:38-52): int mm
        # sources clip at 5100; float sources also zero the <0.33 tail
        if jnp.issubdtype(d.dtype, jnp.integer):
            x = jnp.minimum(d.astype(jnp.float32), 5100.0) / 5100.0
        else:
            x = jnp.where(d < 0.33, jnp.float32(0), d.astype(jnp.float32))
            x = jnp.minimum(x, 5100.0) / 5100.0
        return x * 2.0 - 1.0

    def canvas(img, depth):
        img = (img.astype(jnp.float32) - 127.5) / 127.5  # normalize_image_np
        depth = norm_depth(depth)
        img = resize_cv2_inter_area(img, (load_h, load_w))
        depth = resize_cv2_inter_area(depth[..., None], (load_h, load_w))
        full = jnp.concatenate([img, depth], axis=-1)
        (t, b), (l, r) = pad_amounts(load_h, load_w)
        if t or b or l or r:  # REFLECT_101 == jnp.pad 'reflect'
            full = jnp.pad(full, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")
        return full

    def crop_one(full, off):
        sl = jax.lax.dynamic_slice(
            full, (off[0], off[1], 0), (out_h, out_w, full.shape[-1]))
        return jnp.clip(sl, -1.0, 1.0)  # host clips after crop

    @jax.jit
    def fn(a_img, a_d, a_off, b_img, b_d, b_off):
        a = jax.vmap(crop_one)(canvas(a_img, a_d), a_off.astype(jnp.int32))
        b = jax.vmap(crop_one)(canvas(b_img, b_d), b_off.astype(jnp.int32))
        return {"A_i": a[..., :3], "A_d": a[..., 3:],
                "B_i": b[..., :3], "B_d": b[..., 3:]}

    return fn
