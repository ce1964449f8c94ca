"""Fused conv->norm->relu chains (--pallas_fuse): parity vs the default path.

Interpret mode on the CPU mesh (conftest); the kernels run compiled on TPU.
The chains must be bit-comparable (f32 tolerance) to the unfused layer stack
for both lineages: pix2pix [ReflectionPad2d, Conv2d(pad0), InstanceNorm2d,
ReLU] (networks.py resnet blocks) and translation [Conv2d(pad1, replicate),
GroupNorm(affine), ReLU] (translation_network.py:554-575 blocks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desr_tpu.models import layers as L


CFG = L.InitCfg()


def _x(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _seq_params(seq, seed=0):
    return seq.init(jax.random.PRNGKey(seed), "m.", CFG)


def _apply(seq, params, x, ctx):
    return seq.apply(params, x, "m.", ctx)


def _close(a, b, key, gmax=1.0, tol=4e-3):
    """Grad compare, tolerance relative to the array's own scale (floored at
    1e-3 of the largest grad in the tree).

    The whole-tensor sums behind these grads are O(1e6) elements; f32
    accumulation-order noise through two rsqrt normalizations reaches ~2e-3
    of the grad magnitude (measured), and conv biases feeding an
    InstanceNorm have mathematically-zero grads that both paths realize
    only as cancellation noise (hence the global floor)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1e-2 * gmax, 1e-6)
    assert np.abs(a - b).max() <= tol * scale, \
        (key, float(np.abs(a - b).max()), float(scale))


def _resnet_chain_in():
    """Two pix2pix-style half-blocks: Pad/Conv/IN/ReLU/Pad/Conv/IN."""
    return L.Sequential([
        L.ReflectionPad2d(1), L.Conv2d(128, 128, 3, padding=0, bias=True),
        L.InstanceNorm2d(128), L.ReLU(),
        L.ReflectionPad2d(1), L.Conv2d(128, 128, 3, padding=0, bias=True),
        L.InstanceNorm2d(128),
    ])


def _translation_chain_gn():
    """Translation-style: embedded replicate pads + affine GroupNorm."""
    return L.Sequential([
        L.Conv2d(128, 128, 3, padding=1, padding_mode="replicate", bias=True),
        L.GroupNorm(8, 128), L.ReLU(),
        L.Conv2d(128, 128, 3, padding=1, padding_mode="replicate", bias=True),
        L.GroupNorm(8, 128),
    ])


CHAINS = [
    ("resnet_in", _resnet_chain_in, (1, 104, 160, 128)),
    ("translation_gn", _translation_chain_gn, (1, 104, 160, 128)),
]


@pytest.mark.parametrize("name,build,shape", CHAINS, ids=[c[0] for c in CHAINS])
def test_chain_forward_matches_default(name, build, shape):
    seq = build()
    params = _seq_params(seq)
    x = _x(shape)
    y_ref = _apply(seq, params, x, L.Ctx(dtype=jnp.float32))
    y_fused = _apply(seq, params, x, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name,build,shape", CHAINS, ids=[c[0] for c in CHAINS])
def test_chain_grads_match_default(name, build, shape):
    seq = build()
    params = _seq_params(seq)
    x = _x(shape, seed=2)

    def loss(p, ctx):
        return jnp.sum(jnp.sin(_apply(seq, p, x, ctx)))

    g_ref = jax.grad(loss)(params, L.Ctx(dtype=jnp.float32))
    g_fused = jax.grad(loss)(params, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    assert set(g_ref) == set(g_fused)
    gmax = max(float(np.abs(np.asarray(v)).max()) for v in g_ref.values())
    for k in sorted(g_ref):
        _close(g_fused[k], g_ref[k], k, gmax)


def test_chain_under_remat_tails():
    """pallas_fuse + remat_tails: chains bypass checkpoint grouping, same math."""
    seq = _resnet_chain_in()
    params = _seq_params(seq)
    x = _x((1, 104, 160, 128), seed=3)

    def loss(p, ctx):
        return jnp.sum(jnp.sin(_apply(seq, p, x, ctx)))

    ctx_ref = L.Ctx(dtype=jnp.float32)
    ctx_fused = L.Ctx(dtype=jnp.float32, pallas_fuse=True, remat_tails=True)
    np.testing.assert_allclose(float(loss(params, ctx_fused)),
                               float(loss(params, ctx_ref)), rtol=1e-4)
    g_ref = jax.grad(loss)(params, ctx_ref)
    g_fused = jax.grad(loss)(params, ctx_fused)
    gmax = max(float(np.abs(np.asarray(v)).max()) for v in g_ref.values())
    for k in sorted(g_ref):
        _close(g_fused[k], g_ref[k], k, gmax)


def test_norm_entry_after_strided_conv():
    """Entry at a bare norm: stride-2 conv -> IN -> ReLU -> fusable link."""
    seq = L.Sequential([
        L.Conv2d(64, 128, 3, stride=2, padding=1, bias=True),
        L.InstanceNorm2d(128), L.ReLU(),
        L.ReflectionPad2d(1), L.Conv2d(128, 128, 3, padding=0, bias=True),
        L.InstanceNorm2d(128), L.ReLU(),
    ])
    params = _seq_params(seq, seed=4)
    x = _x((1, 208, 320, 64), seed=5)
    y_ref = _apply(seq, params, x, L.Ctx(dtype=jnp.float32))
    y_fused = _apply(seq, params, x, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_dropout_breaks_the_chain_but_stays_correct():
    """Dropout after ReLU: the prologue carry stops, output still matches
    (eval mode: Dropout is identity)."""
    seq = L.Sequential([
        L.ReflectionPad2d(1), L.Conv2d(128, 128, 3, padding=0, bias=True),
        L.InstanceNorm2d(128), L.ReLU(), L.Dropout(0.5),
        L.ReflectionPad2d(1), L.Conv2d(128, 128, 3, padding=0, bias=True),
        L.InstanceNorm2d(128),
    ])
    params = _seq_params(seq, seed=6)
    x = _x((1, 104, 160, 128), seed=7)
    y_ref = _apply(seq, params, x, L.Ctx(dtype=jnp.float32))
    y_fused = _apply(seq, params, x, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_unsupported_shape_falls_back():
    """Shapes the kernel can't tile run the default path under the flag."""
    seq = _resnet_chain_in()
    params = _seq_params(seq, seed=8)
    x = _x((1, 40, 96, 128), seed=9)  # wo < 128: no pallas tiling
    y_ref = _apply(seq, params, x, L.Ctx(dtype=jnp.float32))
    y_fused = _apply(seq, params, x, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_generator_forward_matches():
    """Whole-net check: resnet_6blocks generator fwd, fused vs default."""
    from desr_tpu.models.networks import define_G

    net = define_G(3, 1, 24, "resnet_6blocks", norm="instance")
    params = net.init(jax.random.PRNGKey(0))
    x = _x((1, 208, 320, 3), seed=10)
    y_ref = net.apply(params, x, L.Ctx(dtype=jnp.float32))
    y_fused = net.apply(params, x, L.Ctx(dtype=jnp.float32, pallas_fuse=True))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
