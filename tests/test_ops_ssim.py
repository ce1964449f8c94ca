import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops.ssim import ssim


def _scipy_ssim_oracle(img1, img2, L=1):
    """Golden oracle: the scipy formula of new_metrics.py:70-111."""
    from scipy import signal

    size, sigma = 11, 1.5
    x, y = np.mgrid[-size // 2 + 1 : size // 2 + 1, -size // 2 + 1 : size // 2 + 1]
    window = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    window /= window.sum()
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * L) ** 2, (K2 * L) ** 2
    mu1 = signal.fftconvolve(window, img1, mode="valid")
    mu2 = signal.fftconvolve(window, img2, mode="valid")
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = signal.fftconvolve(window, img1 * img1, mode="valid") - mu1_sq
    s2 = signal.fftconvolve(window, img2 * img2, mode="valid") - mu2_sq
    s12 = signal.fftconvolve(window, img1 * img2, mode="valid") - mu1_mu2
    return np.mean(((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)))


def test_ssim_matches_scipy_oracle():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, size=(48, 64)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, size=a.shape), 0, 1)
    want = _scipy_ssim_oracle(a, b)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    assert abs(got - want) < 1e-4


def test_ssim_identical_is_one():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, size=(32, 32)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-4
