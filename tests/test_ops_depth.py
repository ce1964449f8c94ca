import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu.ops import depth as D


def test_data_to_meters():
    x = jnp.array([-1.0, 0.0, 1.0])
    m = D.data_to_meters(x, 5100)
    np.testing.assert_allclose(np.asarray(m), [0.0, 2.55, 5.1], rtol=1e-6)


def test_normalize_depth_int_roundtrip():
    mm = jnp.array([0, 1000, 5100, 8000], dtype=jnp.int32)
    d = D.normalize_depth_int(mm)
    assert float(d[0]) == -1.0
    assert float(d[2]) == 1.0
    assert float(d[3]) == 1.0  # clipped
    # round trip through meters
    meters = D.data_to_meters(d, 5100)
    np.testing.assert_allclose(np.asarray(meters[:3]), [0.0, 1.0, 5.1], atol=1e-5)


def test_normalize_depth_float_zeroes_small():
    d = D.normalize_depth_float(jnp.array([0.1, 100.0, 6000.0]))
    np.testing.assert_allclose(np.asarray(d), [-1.0, 100 / 5100 * 2 - 1, 1.0], rtol=1e-5)


def _reference_valid_mask(depth_nchw, border=-0.97):
    """Literal re-execution of the reference's shifted-add sequence
    (models/main_model.py:208-215) in numpy, as the golden oracle."""
    holl = np.where(depth_nchw <= border, 1.0, 0.0).astype(np.float32)
    rm = holl.copy()
    rm[:, :, :-1, :] += rm[:, :, 1:, :].copy()
    rm[:, :, 1:, :] += rm[:, :, :-1, :].copy()
    rm[:, :, :, :-1] += rm[:, :, :, 1:].copy()
    rm[:, :, :, 1:] += rm[:, :, :, :-1].copy()
    return np.where(rm < 1, 1.0, 0.0).astype(np.float32)


def test_valid_mask_matches_reference_sequence():
    rng = np.random.default_rng(0)
    depth = rng.uniform(-1, 1, size=(2, 1, 16, 20)).astype(np.float32)
    depth[depth < -0.5] = -1.0  # plant holes
    expected = _reference_valid_mask(depth)
    got = D.valid_mask(jnp.asarray(depth.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(got)[..., 0], expected[:, 0])


def test_hole_mask_border():
    d = jnp.array([[-1.0, -0.97, -0.96, 0.5]]).reshape(1, 1, 4, 1)
    m = D.hole_mask(d, -0.97)
    np.testing.assert_array_equal(np.asarray(m).ravel(), [1, 1, 0, 0])


def test_random_rect_holes_properties():
    key = jax.random.PRNGKey(0)
    base = jnp.ones((4, 96, 128, 1), jnp.float32)
    # punch a base hole region: mask invalid there
    base = base.at[:, :10, :10, :].set(0.0)
    m = D.random_rect_holes(key, base, n_max=60, p=0.9)
    m_np = np.asarray(m)
    assert m_np.shape == base.shape
    assert set(np.unique(m_np)).issubset({0.0, 1.0})
    # holes are only punched where the base mask was valid
    assert np.all(m_np[:, :10, :10, :] == 1.0)
    # with p=0.9 across 4 samples, some holes should exist
    assert m_np.mean() < 1.0


def test_random_rect_holes_test_mode_no_holes():
    key = jax.random.PRNGKey(1)
    base = jnp.ones((2, 64, 64, 1), jnp.float32)
    # test-time config: n=11, p=0 -> all sizes zero -> no holes. (p == 0.0
    # takes the static all-ones short-circuit that prunes the synthesis
    # chain out of serving graphs; Bernoulli(0) makes the general path
    # produce the same all-ones mask.)
    m = D.random_rect_holes(key, base, n_max=11, p=0.0)
    assert m.shape == base.shape and m.dtype == base.dtype
    assert float(np.asarray(m).min()) == 1.0
    # planar (B, H, W) input keeps its rank through the short-circuit
    mp = D.random_rect_holes(key, base[..., 0], n_max=11, p=0.0)
    assert mp.shape == base.shape[:3]
    assert float(np.asarray(mp).min()) == 1.0


def test_punch_holes():
    d = jnp.full((1, 4, 4, 1), 0.5)
    mask = jnp.ones((1, 4, 4, 1)).at[0, 1, 1, 0].set(0.0)
    out = D.punch_holes(d, mask)
    assert float(out[0, 1, 1, 0]) == -1.0
    assert float(out[0, 0, 0, 0]) == 0.5


def test_random_rect_holes_jits():
    key = jax.random.PRNGKey(2)
    base = jnp.ones((2, 48, 64, 1), jnp.float32)
    f = jax.jit(lambda k, b: D.random_rect_holes(k, b, n_max=60, p=0.9))
    out = f(key, base)
    assert out.shape == base.shape
