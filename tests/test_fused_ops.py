"""Exactness of the HLO-profile-driven fusions (tools/hlo_bytes.py findings).

1. Conv2d._pad_fused: zero-padded conv + thin border-correction strips must
   equal the jnp.pad(reflect/edge) + conv(pad=0) reference path bit-for-bit in
   f32 (same conv op on identical windows, only the pad materialization
   differs). Covers pad 1/k 3 and pad 3/k 7, both modes, values AND grads.
2. Sequential peephole: [ReflectionPad2d/ReplicationPad2d, Conv2d(pad=0)]
   pairs route to the fused path; remat_tails composes with it.
3. Conv2d.apply_split / Net.apply_parts: conv(concat(parts)) as a sum of
   channel-sliced convs (different summation order -> tiny fp tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu.models import layers as L
from desr_tpu.models.layers import (
    Conv2d, Ctx, InitCfg, InstanceNorm2d, ReLU, ReflectionPad2d,
    ReplicationPad2d, Sequential,
)


def _conv_params(key, conv, prefix="0."):
    return conv.init(key, prefix, InitCfg(init_type="normal", init_gain=0.2))


CASES = [(3, 1, "reflect"), (3, 1, "replicate"), (7, 3, "reflect"), (7, 3, "replicate")]


@pytest.mark.parametrize("k,p,mode", CASES)
def test_pad_fused_matches_padded_conv(k, p, mode):
    conv = Conv2d(5, 4, k, padding=p, padding_mode=mode, bias=True)
    params = _conv_params(jax.random.PRNGKey(0), conv)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 14, 17, 5), jnp.float32)

    ref = conv.apply(params, x, "0.", Ctx(fused_pad=False))
    fused = conv.apply(params, x, "0.", Ctx(fused_pad=True))
    assert ref.shape == fused.shape
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))


@pytest.mark.parametrize("k,p,mode", [(3, 1, "reflect"), (7, 3, "replicate")])
def test_pad_fused_grads_match(k, p, mode):
    conv = Conv2d(3, 2, k, padding=p, padding_mode=mode, bias=True)
    params = _conv_params(jax.random.PRNGKey(2), conv)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 13, 3), jnp.float32)

    def loss(prm, x, fused):
        out = conv.apply(prm, x, "0.", Ctx(fused_pad=fused))
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x, False)
    g_fused = jax.grad(loss, argnums=(0, 1))(params, x, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        a, b = np.asarray(a), np.asarray(b)
        # same math, different conv shapes -> fp reassociation only
        tol = 1e-6 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=tol)


def test_sequential_peephole_and_remat_tails():
    seq = Sequential([
        ReflectionPad2d(1), Conv2d(4, 6, 3, padding=0), InstanceNorm2d(6), ReLU(),
        ReplicationPad2d(1), Conv2d(6, 4, 3, padding=0),
    ])
    params = seq.init(jax.random.PRNGKey(4), "m.", InitCfg())
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 10, 11, 4), jnp.float32)

    ref = seq.apply(params, x, "m.", Ctx(fused_pad=False))
    fused = seq.apply(params, x, "m.", Ctx(fused_pad=True))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), rtol=1e-6, atol=1e-6)

    remat = seq.apply(params, x, "m.", Ctx(fused_pad=True, remat_tails=True))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(remat), rtol=1e-6, atol=1e-6)


def test_pad_fused_small_input_falls_back():
    conv = Conv2d(2, 2, 7, padding=3, padding_mode="reflect")
    params = _conv_params(jax.random.PRNGKey(6), conv)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 2), jnp.float32)
    assert not conv.fused_pad_ok(x, 3)  # 8 < k + p = 10 -> jnp.pad path
    out = conv.apply(params, x, "0.", Ctx(fused_pad=True))
    assert out.shape == (1, 8, 8, 2)


def test_instancenorm_one_pass_stats():
    """One-pass variadic-reduce stats == two-pass mean/meansq, values + grads."""
    norm = InstanceNorm2d(6)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 9, 10, 6), jnp.float32) * 3 + 1

    def two_pass(x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        meansq = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True, dtype=jnp.float32)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        return (x - mean) * jax.lax.rsqrt(var + norm.eps)

    got = norm.apply({}, x, "0.", Ctx())
    np.testing.assert_allclose(np.asarray(got), np.asarray(two_pass(x)),
                               rtol=1e-6, atol=1e-6)

    def loss_new(x):
        return jnp.sum(jnp.sin(norm.apply({}, x, "0.", Ctx())))

    def loss_old(x):
        return jnp.sum(jnp.sin(two_pass(x)))

    g_new, g_old = jax.grad(loss_new)(x), jax.grad(loss_old)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-5, atol=1e-5)


def test_apply_split_matches_concat():
    conv = Conv2d(12, 5, 4, stride=2, padding=1, bias=True)
    params = _conv_params(jax.random.PRNGKey(8), conv)
    key = jax.random.PRNGKey(9)
    parts = [jax.random.normal(jax.random.fold_in(key, i), (2, 8, 8, c), jnp.float32)
             for i, c in enumerate([4, 5, 2, 1])]
    ref = conv.apply(params, jnp.concatenate(parts, axis=-1), "0.", Ctx())
    split = conv.apply_split(params, parts, "0.", Ctx())
    np.testing.assert_allclose(np.asarray(ref), np.asarray(split), rtol=1e-5, atol=1e-5)


def test_unet_apply_parts_matches_concat():
    from desr_tpu.models.networks import define_G

    net = define_G(10, 1, 4, "unet_128", norm="instance")
    params = net.init(jax.random.PRNGKey(10))
    key = jax.random.PRNGKey(11)
    parts = [jax.random.normal(jax.random.fold_in(key, i), (1, 128, 128, c), jnp.float32)
             for i, c in enumerate([4, 3, 2, 1])]
    ref = net.apply(params, jnp.concatenate(parts, axis=-1), Ctx())
    split = net.apply_parts(params, parts, Ctx())
    np.testing.assert_allclose(np.asarray(ref), np.asarray(split), rtol=1e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# 4. Conv2d._conv_taps: tap-decomposed large-k small-channel convs. The
#    hardware profile (PERF.md round 2) showed 7x7 C_out=1 heads at 0.8
#    TFLOP/s (1 of 128 MXU lanes); the decomposition runs the same math as
#    1x1 convs over tap-expanded channels (different tap summation order ->
#    fp32 tolerance, f32 tap accumulation).

@pytest.mark.parametrize("cin,cout", [(64, 1), (16, 2), (3, 8)])
def test_tap_conv_matches_direct(cin, cout):
    conv = Conv2d(cin, cout, 7, padding=3, padding_mode="reflect", bias=True)
    params = _conv_params(jax.random.PRNGKey(0), conv)
    # area >= 1<<16 so tap_conv_ok fires (the real trigger is HR images)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 136, 520, cin), jnp.float32)

    ref = conv.apply(params, x, "0.", Ctx(tap_conv=False))
    tap = conv.apply(params, x, "0.", Ctx(tap_conv=True))
    assert ref.shape == tap.shape
    np.testing.assert_allclose(np.asarray(tap), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradient parity through the decomposition
    def loss(fn_ctx):
        def f(p, y):
            return jnp.sum(conv.apply(p, y, "0.", fn_ctx) ** 2)
        return f

    g_ref = jax.grad(loss(Ctx(tap_conv=False)), argnums=(0, 1))(params, x)
    g_tap = jax.grad(loss(Ctx(tap_conv=True)), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tap)):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   rtol=1e-4, atol=1e-4)


def test_tap_conv_zero_pad_and_gates():
    conv = Conv2d(2, 4, 7, padding=3, bias=False)  # zeros padding_mode
    params = _conv_params(jax.random.PRNGKey(2), conv)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 136, 520, 2), jnp.float32)
    ref = conv.apply(params, x, "0.", Ctx(tap_conv=False))
    tap = conv.apply(params, x, "0.", Ctx(tap_conv=True))
    np.testing.assert_allclose(np.asarray(tap), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # small images, small kernels, and healthy output widths stay direct
    small = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 2), jnp.float32)
    assert not conv.tap_conv_ok(small, Ctx(tap_conv=True))
    assert not Conv2d(32, 64, 3, padding=1).tap_conv_ok(x, Ctx(tap_conv=True))
    assert not Conv2d(32, 128, 7, padding=3).tap_conv_ok(x, Ctx(tap_conv=True))
    assert not conv.tap_conv_ok(x, Ctx(tap_conv=False))


# ---------------------------------------------------------------------------
# 5. Conv2d.apply_ring: [pad(1), 3x3 conv] as zero-pad conv + exact additive
#    ring corrections (line matmuls + corner de-dup). Same math as the
#    padded conv up to one extra f32 add rounding on the ring.

@pytest.mark.parametrize("mode,k,p", [("reflect", 3, 1), ("replicate", 3, 1),
                                      ("reflect", 5, 2), ("replicate", 5, 2),
                                      ("reflect", 7, 3), ("replicate", 7, 3)])
def test_ring_pad_matches_padded_conv(mode, k, p):
    conv = Conv2d(5, 16, k, padding=p, padding_mode=mode, bias=True)
    params = _conv_params(jax.random.PRNGKey(0), conv)
    # area >= 1<<14 so ring_pad_ok fires; odd-ish sizes to catch index slips
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 130, 140, 5), jnp.float32)

    jmode = "reflect" if mode == "reflect" else "edge"
    ref = conv.apply(params, x, "0.", Ctx(ring_pad=False))
    # call apply_ring directly: the p>1 math is validated even though the
    # hardware-pinned ROUTING only engages it at p == 1 (see ring_pad_ok)
    ring = conv.apply_ring(params, x, "0.", Ctx(ring_pad=True), jmode)
    assert ref.shape == ring.shape
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn_ctx):
        def f(p, y):
            return jnp.sum(conv.apply(p, y, "0.", fn_ctx) ** 2)
        return f

    def loss_ring(p_, y):
        return jnp.sum(conv.apply_ring(p_, y, "0.", Ctx(), jmode) ** 2)

    g_ref = jax.grad(loss(Ctx(ring_pad=False)), argnums=(0, 1))(params, x)
    g_ring = jax.grad(loss_ring, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ring)):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   rtol=1e-4, atol=1e-4)


def test_ring_pad_peephole_and_gates():
    pad = ReflectionPad2d(1)
    conv = Conv2d(3, 12, 3, padding=0, bias=True)
    seq = Sequential([pad, conv])
    params = seq.init(jax.random.PRNGKey(5), "m.", InitCfg("normal", 0.02))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 128, 130, 3), jnp.float32)
    ref = seq.apply(params, x, "m.", Ctx(ring_pad=False, fused_pad=False))
    ring = seq.apply(params, x, "m.", Ctx(ring_pad=True))
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # composes with remat_tails
    remat = seq.apply(params, x, "m.", Ctx(ring_pad=True, remat_tails=True))
    np.testing.assert_allclose(np.asarray(remat), np.asarray(ring),
                               rtol=1e-6, atol=1e-6)
    # gates: small tensors, mismatched k/p, strided convs stay off the path
    small = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 3), jnp.float32)
    assert not conv.ring_pad_ok(small, 1)
    # p=3 ROUTING measured slower on hardware; math still covered above
    assert not Conv2d(3, 16, 7, padding=0).ring_pad_ok(x, 3)
    assert not Conv2d(3, 16, 7, padding=0).ring_pad_ok(x, 2)  # k != 2p+1
    # small-C_out heads keep the materialized-pad + tap path (ring's lazy
    # zero-pad tap accumulation measured slower on hardware)
    assert not Conv2d(64, 1, 7, padding=0).ring_pad_ok(x, 3)
    assert not Conv2d(3, 6, 3, padding=0, stride=2).ring_pad_ok(x, 1)


# ---------------------------------------------------------------------------
# 6. ConvTranspose2d phase decomposition: stride-2 convT as 4 parity
#    sub-convs + interleave (same nonzero terms as the lhs-dilated form; the
#    dilated zeros never exist). Covers the two convT shapes the nets use.

@pytest.mark.parametrize("k,p,op", [(4, 1, 0), (3, 1, 1)])
def test_convt_phase_matches_dilated(k, p, op):
    from desr_tpu.models.layers import ConvTranspose2d

    ct = ConvTranspose2d(6, 5, k, stride=2, padding=p, output_padding=op)
    params = ct.init(jax.random.PRNGKey(0), "0.", InitCfg("normal", 0.2))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 66, 6), jnp.float32)

    ref = ct.apply(params, x, "0.", Ctx(phase_convt=False))
    ph = ct.apply(params, x, "0.", Ctx(phase_convt=True))
    assert ref.shape == ph.shape
    np.testing.assert_allclose(np.asarray(ph), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn_ctx):
        def f(prm, y):
            return jnp.sum(ct.apply(prm, y, "0.", fn_ctx) ** 2)
        return f

    g_ref = jax.grad(loss(Ctx(phase_convt=False)), argnums=(0, 1))(params, x)
    g_ph = jax.grad(loss(Ctx(phase_convt=True)), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ph)):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   rtol=1e-4, atol=1e-4)


def test_convt_phase_gates():
    from desr_tpu.models.layers import ConvTranspose2d

    small = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4), jnp.float32)
    ct = ConvTranspose2d(4, 4, 4, stride=2, padding=1)
    assert not ct.phase_ok(small, Ctx(phase_convt=True))  # under area gate
    big = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 80, 4), jnp.float32)
    assert ct.phase_ok(big, Ctx(phase_convt=True))
    assert not ct.phase_ok(big, Ctx(phase_convt=False))
    # odd output length -> phases disagree -> fallback
    ct3 = ConvTranspose2d(4, 4, 3, stride=2, padding=1, output_padding=0)
    assert ct3._phase_geometry(80) is None
    out = ct3.apply(ct3.init(jax.random.PRNGKey(4), "0.", InitCfg("normal", 0.2)),
                    big, "0.", Ctx(phase_convt=True))
    assert out.shape == (1, 159, 159, 4)


def test_row_tap_matches_direct():
    """--row_tap: k row convs == the direct conv (bf16-dtype accumulation;
    f32 on CPU tests, so near-exact here)."""
    conv = Conv2d(32, 64, 7, padding=3, padding_mode="reflect", bias=True)
    params = _conv_params(jax.random.PRNGKey(20), conv)
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 136, 520, 32), jnp.float32)
    ref = conv.apply(params, x, "0.", Ctx(row_tap=False))
    rt = conv.apply(params, x, "0.", Ctx(row_tap=True))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # zero-padding-mode virtual pad path
    convz = Conv2d(16, 32, 5, padding=2, bias=False)
    pz = _conv_params(jax.random.PRNGKey(22), convz)
    xz = jax.random.normal(jax.random.PRNGKey(23), (1, 130, 520, 16), jnp.float32)
    refz = convz.apply(pz, xz, "0.", Ctx(row_tap=False))
    rtz = convz.apply(pz, xz, "0.", Ctx(row_tap=True))
    np.testing.assert_allclose(np.asarray(rtz), np.asarray(refz),
                               rtol=2e-5, atol=2e-5)
    assert not conv.row_tap_ok(x, Ctx(row_tap=False))


def test_fold_norm_matches_default():
    """--fold_norm single-FMA normalize == two-op form, values + grads,
    for InstanceNorm (no affine) and affine GroupNorm."""
    from desr_tpu.models.layers import GroupNorm
    import dataclasses

    x = jax.random.normal(jax.random.PRNGKey(20), (2, 9, 10, 8), jnp.float32) * 3 + 2
    base = Ctx(dtype=jnp.float32)
    fold = dataclasses.replace(base, fold_norm=True)

    ino = InstanceNorm2d(8)
    np.testing.assert_allclose(np.asarray(ino.apply({}, x, "0.", fold)),
                               np.asarray(ino.apply({}, x, "0.", base)),
                               rtol=1e-5, atol=1e-5)
    g0 = jax.grad(lambda x: jnp.sum(jnp.sin(ino.apply({}, x, "0.", base))))(x)
    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(ino.apply({}, x, "0.", fold))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-5)

    gn = GroupNorm(4, 8)
    prm = gn.init(jax.random.PRNGKey(21), "n.", InitCfg())
    np.testing.assert_allclose(np.asarray(gn.apply(prm, x, "n.", fold)),
                               np.asarray(gn.apply(prm, x, "n.", base)),
                               rtol=1e-5, atol=1e-5)
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(gn.apply(p, x, "n.", base))))(prm)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(gn.apply(p, x, "n.", fold))))(prm)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)
