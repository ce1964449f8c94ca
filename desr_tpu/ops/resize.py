"""Resize ops with exact PyTorch `F.interpolate` semantics (NHWC).

The reference leans on torch bicubic/bilinear/nearest interpolation in the hot
path (models/main_sr_model.py:279-398). torch bicubic uses the Keys kernel
with a = -0.75 and half-pixel sampling with edge clamping and NO antialiasing;
`jax.image.resize` uses a different kernel (a = -0.5) and always antialiases on
downsample, so we implement interpolation as two dense matrix contractions
(rows then cols). The weight matrices are built with numpy at trace time
(static shapes) and the contractions run on the MXU — on TPU this is both
exact and faster than a gather-based implementation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x, a=-0.75):
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    f = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return f


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size, out_size, mode):
    """(out_size, in_size) row-interpolation matrix, torch semantics.

    Cached as NUMPY (never jnp): a cached jnp constant created while tracing
    would leak a tracer into later traces."""
    if mode == "nearest":
        # torch F.interpolate(mode='nearest'): src = floor(i * in/out)
        src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        m = np.zeros((out_size, in_size), dtype=np.float32)
        m[np.arange(out_size), src] = 1.0
        return m

    scale = in_size / out_size
    # half-pixel centers (align_corners=False)
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for tap, wgt in ((lo, 1.0 - frac), (lo + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), wgt)
    elif mode == "bicubic":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for k in range(-1, 3):
            tap = base + k
            wgt = _cubic_kernel(frac - k)
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), wgt)
    elif mode == "cv2_area":
        # cv2 INTER_AREA decimation (float path): dst[j] = area-average of
        # src over [j*scale, (j+1)*scale), fractional cells edge-weighted.
        # cv2 uses this only when BOTH axes downscale — resize_cv2_inter_area
        # applies that rule.
        for j in range(out_size):
            lo, hi = j * scale, (j + 1) * scale
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, in_size)):
                m[j, i] = (min(i + 1.0, hi) - max(float(i), lo)) / scale
    elif mode == "cv2_area_up":
        # cv2 INTER_AREA when NOT (both axes downscale): the generic-path
        # coefficients sx=floor(dx*scale), fx=(dx+1)-(sx+1)/scale clamped to
        # [0,1) (OpenCV resize.cpp INTER_AREA branch) — pixel replication for
        # integer zooms, 2-tap blends at fractional boundaries. Verified
        # exact vs cv2 for integer, fractional, and mixed-axis resizes.
        inv = out_size / in_size
        for dx in range(out_size):
            sx = int(np.floor(dx * scale))
            fx = (dx + 1) - (sx + 1) * inv
            fx = 0.0 if fx <= 0 else fx - np.floor(fx)
            m[dx, min(sx, in_size - 1)] += 1.0 - fx
            m[dx, min(sx + 1, in_size - 1)] += fx
    else:
        raise ValueError(mode)
    return m.astype(np.float32)


def _apply_separable(img, out_hw, mode):
    b, h, w, c = img.shape
    oh, ow = out_hw
    dtype = img.dtype
    x = img.astype(jnp.float32)
    if oh != h:
        mh = jnp.asarray(_resize_matrix(h, oh, mode))
        x = jnp.einsum("oh,bhwc->bowc", mh, x)
    if ow != w:
        mw = jnp.asarray(_resize_matrix(w, ow, mode))
        x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x.astype(dtype)


def _apply_separable_planar(x, out_hw, mode):
    """Resize the LAST TWO dims of (..., H, W) — the TPU-friendly layout."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    y = x.astype(jnp.float32)
    if oh != h:
        y = jnp.einsum("oh,...hw->...ow", jnp.asarray(_resize_matrix(h, oh, mode)), y)
    if ow != w:
        # output spec "...ho" yields (..., H', OW) directly
        y = jnp.einsum("ow,...hw->...ho", jnp.asarray(_resize_matrix(w, ow, mode)), y)
    return y.astype(x.dtype)


def resize_bicubic(img, out_hw):
    """torch F.interpolate(mode='bicubic', align_corners=False) equivalent (NHWC)."""
    return _apply_separable(img, out_hw, "bicubic")


def resize_bilinear(img, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent (NHWC)."""
    return _apply_separable(img, out_hw, "bilinear")


def resize_nearest(img, out_hw):
    """torch F.interpolate(mode='nearest') equivalent (NHWC)."""
    return _apply_separable(img, out_hw, "nearest")


def resize_bicubic_planar(x, out_hw):
    """bicubic on the last two dims of (..., H, W) / (B, C, H, W)."""
    return _apply_separable_planar(x, out_hw, "bicubic")


def resize_bilinear_planar(x, out_hw):
    return _apply_separable_planar(x, out_hw, "bilinear")


def resize_nearest_planar(x, out_hw):
    return _apply_separable_planar(x, out_hw, "nearest")


def resize_cv2_inter_area(img, out_hw):
    """cv2.resize(..., interpolation=cv2.INTER_AREA) float-path equivalent.

    The SR host loader resizes with albumentations interpolation=3 ==
    cv2.INTER_AREA (data/my_naive_sr_dataset.py:56-89 via transforms); cv2's
    rule: true area decimation when BOTH axes downscale, else the generic
    area-zoom 2-tap coefficients on both axes. Matmul formulation (static
    weight matrices on the MXU), used by the SR --device_aug path; parity vs
    cv2 in tests/test_device_aug.py.
    """
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    mode = "cv2_area" if (h >= oh and w >= ow) else "cv2_area_up"
    return _apply_separable(img, out_hw, mode)
