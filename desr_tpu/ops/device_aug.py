"""On-device geometric augmentation: one fused bilinear warp per sample.

The reference augments on the host with an albumentations chain —
Rotate(±30°) -> RandomCrop -> HFlip (data/my_main_dataset.py:55-84,
my_I2D_dataset.py:87-102) — which PERF.md measures at ~16 pairs/sec per CPU
core, far below what one chip consumes (100+ pairs/sec at the I2D stage).
Under ``--device_aug`` the host keeps decode + deterministic resize (+
ColorJitter for I2D) and ships the full load-size tensors; the rotate, crop
and flip COMPOSE into a single affine map evaluated once per output pixel as
a 4-tap bilinear gather at crop resolution — no intermediate rotated canvas
is ever materialized, and the work rides the accelerator instead of the
loader cores.

Parameter LAWS are identical to the host path (desr_tpu/data/base_dataset.py
``draw_geo_params`` is shared by both), so the augmentation distribution is
unchanged. Numerics: crop/flip-only samples are bit-exact; rotated samples
match cv2.warpAffine within fp32 rounding (~2e-4 on [-1, 1] data, measured in
tests/test_device_aug.py — cv2's 5-bit fixed-point interpolation tables apply
only to uint8 inputs; for float32 it uses exact float weights, as do we).
Border semantics match albumentations 0.4.6: BORDER_REFLECT_101 via a mirror
fold of the sample coordinates (reflection is a grid isometry, so folding
coordinates equals folding taps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mirror(c, n):
    """Fold continuous coordinates into [0, n-1] with REFLECT_101 semantics."""
    period = 2.0 * (n - 1.0)
    c = jnp.abs(c) % period
    return jnp.minimum(c, period - c)


def warp_affine_crop(src, angle_deg, cy, cx, flip, out_h, out_w):
    """Sample ``hflip?(crop(rotate(src, angle)))`` in one bilinear pass.

    src: (H, W, C) float32. angle/cy/cx/flip: scalars (flip: 0.0 or 1.0).
    Matches the host chain T.rotate (cv2 center (w/2, h/2), REFLECT_101,
    bilinear — albumentations 0.4.6 conventions) -> T.crop(cy, cx) ->
    T.hflip, evaluated as dst(x,y) = src(R^{-1}((x', y') - c) + c) with
    x' = cx + (out_w-1-x if flip else x), y' = cy + y.
    """
    h, w = src.shape[0], src.shape[1]
    ang = angle_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    ccx, ccy = w / 2.0, h / 2.0

    yo = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xo = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    x1 = jnp.where(flip > 0.5, (out_w - 1.0) - xo, xo) + cx - ccx
    y1 = yo + cy - ccy
    # inverse of cv2.getRotationMatrix2D's forward map (linear part
    # [[cos, sin], [-sin, cos]]): sample-coord rotation by -angle
    xs = _mirror(cos * x1 - sin * y1 + ccx, w)
    ys = _mirror(sin * x1 + cos * y1 + ccy, h)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = src.reshape(h * w, -1)

    def tap(yi, xi):
        return jnp.take(flat, (yi * w + xi).reshape(-1), axis=0).reshape(
            out_h, out_w, flat.shape[1])

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


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


def _hsv_tables():
    i = np.arange(256, dtype=np.float64)
    with np.errstate(divide="ignore"):
        sdiv = np.rint((255 << _HSV_SHIFT) / np.maximum(i, 1))
        hdiv = np.rint((180 << _HSV_SHIFT) / (6.0 * np.maximum(i, 1)))
    sdiv[0] = 0.0
    hdiv[0] = 0.0
    return jnp.asarray(sdiv, jnp.int32), jnp.asarray(hdiv, jnp.int32)


def _rgb2hsv_u8(r, g, b):
    """cv2.COLOR_RGB2HSV on uint8 (int32 in/out): H in [0,180), S/V in [0,256)."""
    sdiv, hdiv = _hsv_tables()
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    half = 1 << (_HSV_SHIFT - 1)
    s = (diff * jnp.take(sdiv, v) + half) >> _HSV_SHIFT
    h_num = jnp.where(v == r, g - b,
                      jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h_num * jnp.take(hdiv, diff) + half) >> _HSV_SHIFT
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
