"""Planar (B,H,W)/(B,3,H,W) op variants must match their NHWC references."""

import numpy as np
import jax.numpy as jnp

from desr_tpu.ops import losses as L
from desr_tpu.ops import normals as N
from desr_tpu.ops import resize as R


def _d(shape, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, shape).astype(np.float32)


def test_fov_normals_planar_matches_nhwc():
    d = _d((2, 24, 32))
    planar = np.asarray(N.surface_normals_fov_planar(jnp.asarray(d)))
    nhwc = np.asarray(N.surface_normals_fov(jnp.asarray(d[..., None])))
    np.testing.assert_allclose(planar, nhwc.transpose(0, 3, 1, 2), atol=1e-6)


def test_k_normals_planar_matches_nhwc():
    d = _d((2, 20, 28), 1)
    K = np.tile(np.array([[[577.0, 0, 14], [0, 577, 10], [0, 0, 1]]], np.float32), (2, 1, 1))
    crop = np.tile(np.array([[0, 20, 0, 28]], np.float32), (2, 1))
    planar = np.asarray(N.surface_normals_from_K_planar(jnp.asarray(d), jnp.asarray(K),
                                                        jnp.asarray(crop)))
    nhwc = np.asarray(N.surface_normals_from_K(jnp.asarray(d[..., None]), jnp.asarray(K),
                                               jnp.asarray(crop)))
    np.testing.assert_allclose(planar, nhwc.transpose(0, 3, 1, 2), atol=1e-6)


def test_image_normals_planar_matches_nhwc():
    d = _d((2, 16, 20), 2)
    planar = np.asarray(N.surface_normals_planar(jnp.asarray(d)))
    nhwc = np.asarray(N.surface_normals(jnp.asarray(d[..., None])))
    np.testing.assert_allclose(planar, nhwc.transpose(0, 3, 1, 2), atol=1e-6)


def test_resize_planar_matches_nhwc():
    x = _d((2, 16, 24), 3)
    for mode_nhwc, mode_planar in [(R.resize_bicubic, R.resize_bicubic_planar),
                                   (R.resize_nearest, R.resize_nearest_planar),
                                   (R.resize_bilinear, R.resize_bilinear_planar)]:
        a = np.asarray(mode_planar(jnp.asarray(x), (8, 12)))
        b = np.asarray(mode_nhwc(jnp.asarray(x[..., None]), (8, 12)))[..., 0]
        np.testing.assert_allclose(a, b, atol=1e-5)
    # multi-channel planar (B, C, H, W)
    y = _d((1, 3, 16, 24), 4)
    a = np.asarray(R.resize_bicubic_planar(jnp.asarray(y), (32, 48)))
    b = np.asarray(R.resize_bicubic(jnp.asarray(y.transpose(0, 2, 3, 1)), (32, 48)))
    np.testing.assert_allclose(a, b.transpose(0, 3, 1, 2), atol=1e-5)


def test_tv_planar_matches_nhwc():
    x = _d((2, 3, 10, 12), 5)
    a = float(L.tv_loss_planar(jnp.asarray(x)))
    b = float(L.tv_loss(jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert abs(a - b) < 1e-3
    a = float(L.tv_norm_planar(jnp.asarray(x)))
    b = float(L.tv_norm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert abs(a - b) < 1e-6


def test_cos_sim_planar_matches_nhwc():
    x, y = _d((2, 3, 8, 8), 6), _d((2, 3, 8, 8), 7)
    a = float(L.cos_sim_loss_planar(jnp.asarray(x), jnp.asarray(y)))
    b = float(L.cos_sim_loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                             jnp.asarray(y.transpose(0, 2, 3, 1))))
    assert abs(a - b) < 1e-6
    mask = (_d((2, 1, 8, 8), 8) > 0).astype(np.float32)
    mask3 = np.repeat(mask, 3, axis=1)
    a = float(L.masked_cos_sim_loss_planar(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask3)))
    b = float(L.masked_cos_sim_loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    jnp.asarray(y.transpose(0, 2, 3, 1)),
                                    jnp.asarray(mask3.transpose(0, 2, 3, 1))))
    assert abs(a - b) < 1e-9


def test_smooth_planar_matches_nhwc():
    depth = _d((2, 16, 24), 9)
    image = _d((2, 3, 16, 24), 10)
    a = float(L.smooth_weight_loss_planar(jnp.asarray(depth), jnp.asarray(image), 3))
    b = float(L.smooth_weight_loss(jnp.asarray(depth[..., None]),
                                   jnp.asarray(image.transpose(0, 2, 3, 1)), 3))
    assert abs(a - b) < 1e-5
