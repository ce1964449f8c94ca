import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops import normals as N
from tests.reference_oracle import load_reference_module


def _rand_depth(b=2, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.uniform(-0.9, 1.0, size=(b, h, w, 1)).astype(np.float32)
    return d


def test_np_gradient_matches_numpy():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((3, 7, 9)).astype(np.float32)
    for axis in (0, 1, 2):
        got = np.asarray(N.np_gradient(jnp.asarray(f), axis))
        want = np.gradient(f, axis=axis)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_surface_normals_vs_reference():
    torch = pytest.importorskip("torch")
    ref = load_reference_module("models/norms.py", "ref_norms")
    d = _rand_depth()
    ours = np.asarray(N.surface_normals(jnp.asarray(d)))
    with torch.no_grad():
        t = torch.from_numpy(d.transpose(0, 3, 1, 2))
        want = ref.SurfaceNormals()(t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_surface_normals_fov_vs_reference():
    torch = pytest.importorskip("torch")
    ref = load_reference_module("models/translation_network.py", "ref_tn")
    d = _rand_depth(b=1, h=32, w=40, seed=3)
    ours = np.asarray(N.surface_normals_fov(jnp.asarray(d)))
    with torch.no_grad():
        t = torch.from_numpy(d.transpose(0, 3, 1, 2))
        want = ref.SurfaceNormals()(t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


def test_surface_normals_from_K_vs_reference_fp64():
    torch = pytest.importorskip("torch")
    ref = load_reference_module("models/norms.py", "ref_norms2")
    d = _rand_depth(b=2, h=20, w=28, seed=5)
    K = np.array(
        [[[577.0, 0.0, 320.0], [0.0, 577.0, 240.0], [0.0, 0.0, 1.0]]] * 2
    )
    crop = np.array([[0, 20, 0, 28], [5, 25, 7, 35]], dtype=np.float64)
    with torch.no_grad():
        t = torch.from_numpy(d.transpose(0, 3, 1, 2))
        want = (
            ref.SurfaceNormals_new()(t, torch.from_numpy(K), torch.from_numpy(crop))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    # fp32 path (the TPU default) against the fp64 reference
    ours = np.asarray(
        N.surface_normals_from_K(jnp.asarray(d), jnp.asarray(K), jnp.asarray(crop))
    )
    err = np.abs(ours - want)
    assert err.max() < 2e-3, f"max fp32-vs-fp64 normal error {err.max()}"

    # fp64 path must match exactly (up to float64 noise)
    from jax import config as jax_config

    try:
        jax_config.update("jax_enable_x64", True)
        ours64 = np.asarray(
            N.surface_normals_from_K(
                jnp.asarray(d), jnp.asarray(K), jnp.asarray(crop), dtype=jnp.float64
            )
        )
    finally:
        jax_config.update("jax_enable_x64", False)
    np.testing.assert_allclose(ours64, want, rtol=1e-5, atol=1e-6)
