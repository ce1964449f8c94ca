"""Pallas conv kernel (ops/pallas_conv.py): parity vs XLA's conv.

Runs in interpret mode on the CPU mesh (conftest); the same kernel runs
compiled on TPU, where tools/bench_pallas_conv.py measured the speedups that
justify the routing (see --pallas_conv help and PERF.md round 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desr_tpu.ops.pallas_conv import (_conv_ref, _plan, conv2d_pallas,
                                      conv2d_pallas_supported)


def _xw(shape, cout, k, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    w = jnp.asarray(0.1 * rng.standard_normal((cout, shape[-1], k, k)), dtype)
    return x, w


# (input shape, cout, k, pad) covering: virtual pad=1 ring-base 3x3s at 128
# and 256 channels (boundary-band DMA clamping), pad=0, the gsize>1
# tap-expansion path (C=32, k=7), and a ragged W-chunk tail (wo=154).
CONFIGS = [
    ((2, 24, 160, 128), 128, 3, 1),
    ((1, 16, 136, 256), 256, 3, 1),
    ((1, 24, 160, 128), 128, 3, 0),
    ((1, 38, 160, 32), 64, 7, 0),
    ((1, 22, 168, 128), 32, 3, 1),
]


@pytest.mark.parametrize("shape,cout,k,pad", CONFIGS)
def test_kernel_matches_xla_conv(shape, cout, k, pad):
    assert conv2d_pallas_supported(shape, k, cout, pad=pad, dtype_bytes=4), \
        (shape, _plan(shape, k, cout, pad, 4))
    x, w = _xw(shape, cout, k)
    got = conv2d_pallas(x, w, pad)
    want = _conv_ref(x, w, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_bf16_matches_xla_conv():
    shape, cout, k, pad = (1, 16, 160, 128), 128, 3, 1
    x, w = _xw(shape, cout, k, seed=3, dtype=jnp.bfloat16)
    got = np.asarray(conv2d_pallas(x, w, pad), np.float32)
    want = np.asarray(_conv_ref(x, w, pad), np.float32)
    # f32 accumulation in both; only the bf16 rounding of in/out differs
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_unsupported_shapes_report_false():
    # narrow output (wo < 128), tiny C, odd W with gsize==1, pad with gsize>1
    assert not conv2d_pallas_supported((2, 64, 120, 128), 3, 128, pad=1)
    assert not conv2d_pallas_supported((2, 64, 160, 8), 3, 128, pad=1)
    assert not conv2d_pallas_supported((2, 64, 157, 128), 3, 128, pad=0)
    assert not conv2d_pallas_supported((1, 64, 160, 32), 3, 64, pad=1)


def test_custom_vjp_grads_match_xla():
    shape, cout, k, pad = (1, 16, 136, 128), 64, 3, 1
    x, w = _xw(shape, cout, k, seed=5)

    def f_pal(x, w):
        return jnp.sum(jnp.sin(conv2d_pallas(x, w, pad)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_conv_ref(x, w, pad)))

    v1, (gx1, gw1) = jax.value_and_grad(f_pal, argnums=(0, 1))(x, w)
    v2, (gx2, gw2) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, w)
    assert float(v1) == pytest.approx(float(v2), rel=1e-4)
    # f32 accumulation-order noise only (pallas forward vs XLA forward feeds
    # the same XLA-conv VJP)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pad,relu,stats", [
    (1, True, True), (1, False, False), (0, True, False), (1, True, False),
])
def test_fused_prologue_and_stats_match_composition(pad, relu, stats):
    from desr_tpu.ops.pallas_conv import _fused_ref, conv2d_pallas_fused

    shape, cout, k = (2, 24, 160, 128), 64, 3
    x, w = _xw(shape, cout, k, seed=11)
    rng = np.random.default_rng(12)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (shape[0], shape[-1])), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((shape[0], shape[-1])), jnp.float32)

    got = conv2d_pallas_fused(x, w, scale, shift, pad, relu, stats)
    want = _fused_ref(x, w, scale, shift, pad, relu, stats)
    if not stats:
        got, want = (got,), (want,)
    for g, v in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(v),
                                   rtol=1e-4, atol=1e-3)


def test_fused_no_prologue_stats_only():
    from desr_tpu.ops.pallas_conv import _fused_ref, conv2d_pallas_fused

    shape, cout, k, pad = (1, 16, 136, 256), 128, 3, 1
    x, w = _xw(shape, cout, k, seed=13)
    out, s, s2 = conv2d_pallas_fused(x, w, None, None, pad, False, True)
    wout, ws, ws2 = _fused_ref(x, w, None, None, pad, False, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wout),
                               rtol=1e-4, atol=1e-4)
    # f32 accumulation-order noise; near-zero channel sums need the atol
    np.testing.assert_allclose(np.asarray(s), np.asarray(ws),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ws2),
                               rtol=1e-4, atol=1e-3)


def test_fused_grads_match_composition():
    from desr_tpu.ops.pallas_conv import _fused_ref, conv2d_pallas_fused

    shape, cout, k, pad = (1, 16, 136, 128), 32, 3, 1
    x, w = _xw(shape, cout, k, seed=17)
    rng = np.random.default_rng(18)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (1, 128)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)

    def loss_pal(x, w, sc, sh):
        out, s, s2 = conv2d_pallas_fused(x, w, sc, sh, pad, True, True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(s * s2) * 1e-3

    def loss_ref(x, w, sc, sh):
        out, s, s2 = _fused_ref(x, w, sc, sh, pad, True, True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(s * s2) * 1e-3

    g1 = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def _ring_layer_and_input():
    from desr_tpu.models import layers as L

    lyr = L.Conv2d(128, 32, 3, padding=1, padding_mode="reflect")
    params = lyr.init(jax.random.PRNGKey(0), "c.", L.InitCfg())
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 104, 160, 128)), jnp.float32)
    return L, lyr, params, x


def test_conv2d_ring_routing_matches_default():
    """Conv2d.apply_ring with ctx.pallas_conv: same output as the XLA base."""
    L, lyr, params, x = _ring_layer_and_input()
    ctx_off = L.Ctx(dtype=jnp.float32)
    ctx_on = L.Ctx(dtype=jnp.float32, pallas_conv=True)
    assert lyr.pallas_ok(x, ctx_on, 1)
    y_off = lyr.apply(params, x, "c.", ctx_off)
    y_on = lyr.apply(params, x, "c.", ctx_on)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-4, atol=1e-4)


def test_multi_device_mesh_disables_routing():
    """pallas_call has no SPMD partitioning rule: >1-device meshes fall back."""
    from jax.sharding import Mesh

    L, lyr, params, x = _ring_layer_and_input()
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    ctx = L.Ctx(dtype=jnp.float32, pallas_conv=True, mesh=mesh)
    assert not lyr.pallas_ok(x, ctx, 1)
    y = lyr.apply(params, x, "c.", ctx)  # still correct through the fallback
    y_ref = lyr.apply(params, x, "c.", L.Ctx(dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5)


def test_per_stage_default_resolution():
    """opt.pallas_conv=None resolves via _default_pallas_conv (single-dev)."""
    from desr_tpu.models.base_model import BaseModel

    class _Opt:
        isTrain = True
        num_devices = 1
        compute_dtype = "float32"

    opt = _Opt()
    opt.pallas_conv = None
    opt.remat_tails = None
    m = BaseModel(opt)
    assert opt.pallas_conv == m._default_pallas_conv
    assert opt.remat_tails == m._default_remat_tails
