"""SSIM (structural similarity) — on-device jnp implementation.

Matches both reference implementations:
- the scipy-fftconvolve offline metric (new_metrics.py:86-111): 11x11 gaussian
  sigma=1.5 built from an mgrid (NOT symmetric for even sizes the mgrid covers
  -size//2+1 .. size//2, symmetric for odd 11), 'valid' convolution, K1=0.01,
  K2=0.03, L configurable (L=1 for normalized depth).
- the vendored pytorch_ssim package (models/pytorch_ssim/__init__.py): same
  constants, grouped 'same' conv with a separable gaussian window.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gauss_window(size=11, sigma=1.5):
    """new_metrics.py:70-84 fspecial_gauss (2-D, normalized).

    Cached as numpy (a cached jnp constant created while tracing would leak a
    tracer into later traces)."""
    ax = np.arange(-(size // 2) + 1, size // 2 + 1, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax, indexing="ij")
    g = np.exp(-((xx ** 2 + yy ** 2) / (2.0 * sigma ** 2)))
    return (g / g.sum()).astype(np.float32)


def _filter2d_valid(img, window):
    """'valid' 2-D convolution per channel. img: (B,H,W,C); window: (k,k) numpy."""
    k = window.shape[0]
    c = img.shape[-1]
    w = jnp.broadcast_to(jnp.asarray(window)[:, :, None, None], (k, k, 1, c))
    # Gaussian is symmetric, so convolution == correlation.
    return jax.lax.conv_general_dilated(
        img,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(img1, img2, max_val=1.0, size=11, sigma=1.5):
    """Mean SSIM over valid window positions. Returns a scalar.

    Matches new_metrics.py:86-111 with L=max_val.
    """
    if img1.ndim == 2:
        img1 = img1[None, :, :, None]
        img2 = img2[None, :, :, None]
    elif img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    window = _gauss_window(size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu1 = _filter2d_valid(img1, window)
    mu2 = _filter2d_valid(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter2d_valid(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d_valid(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d_valid(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
