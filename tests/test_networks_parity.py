"""Network parity: our TPU-native nets vs the reference torch modules.

For each architecture we initialize our net, export its flat param dict as a
torch state_dict, load it into the reference module with strict=True (proving
checkpoint-key compatibility), and compare forward outputs (proving layer
semantics). NHWC (ours) <-> NCHW (torch) conversion at the boundary only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu.models import networks as N
from desr_tpu.models import translation_networks as TN
from desr_tpu.models.layers import Ctx
from tests.reference_oracle import load_reference_module

torch = pytest.importorskip("torch")


def _to_torch_state(params):
    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


def _compare(ours_out, ref_module, torch_in, atol=2e-4):
    ref_module.eval()
    with torch.no_grad():
        want = _nhwc(ref_module(*torch_in))
    got = np.asarray(ours_out)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


def test_resnet_generator_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks")
    net = N.define_G(3, 16, 8, "resnet_6blocks", norm="instance", n_down=2)
    params = net.init(jax.random.PRNGKey(0))
    ref = ref_nets.define_G(3, 16, 8, "resnet_6blocks", norm="instance", gpu_ids=[], n_down=2)
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((2, 32, 40, 3), 1)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def test_resnet_generator_replace_transpose_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks_rt")
    net = N.define_G(2, 4, 8, "resnet_6blocks", norm="instance", replace_transpose=True)
    params = net.init(jax.random.PRNGKey(3))
    ref = ref_nets.define_G(2, 4, 8, "resnet_6blocks", norm="instance", gpu_ids=[],
                            replace_transpose=True)
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((1, 24, 32, 2), 4)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def test_unet128_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks_u")
    net = N.define_G(4, 1, 8, "unet_128", norm="instance")
    params = net.init(jax.random.PRNGKey(1))
    ref = ref_nets.define_G(4, 1, 8, "unet_128", norm="instance", gpu_ids=[])
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((1, 128, 128, 4), 2)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def test_unet128_sr_head_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks_sr")
    net = N.define_G(4, 1, 8, "unet_128", norm="instance", use_sr=True)
    params = net.init(jax.random.PRNGKey(2))
    ref = ref_nets.define_G(4, 1, 8, "unet_128", norm="instance", gpu_ids=[], use_sr=True)
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((1, 128, 128, 4), 5)
    out = net.apply(params, jnp.asarray(x), Ctx())
    assert out.shape == (1, 256, 256, 1)  # SR head: 2x per axis
    _compare(out, ref, [_nchw(x)])


def test_nlayer_discriminator_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks_d")
    net = N.define_D(3, 16, "basic", norm="instance")
    params = net.init(jax.random.PRNGKey(4))
    ref = ref_nets.define_D(3, 16, "basic", norm="instance", gpu_ids=[])
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((2, 64, 64, 3), 6)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def test_pixel_discriminator_parity():
    ref_nets = load_reference_module("models/networks.py", "ref_networks_p")
    net = N.define_D(1, 16, "pixel", norm="instance")
    params = net.init(jax.random.PRNGKey(5))
    ref = ref_nets.define_D(1, 16, "pixel", norm="instance", gpu_ids=[])
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((2, 32, 32, 1), 7)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def _translator_opt(**kw):
    opt = TN.default_translator_opt(**kw)
    opt.gpu_ids = []
    return opt


def test_translation_generator_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_gen")
    opt = _translator_opt(ngf_img=8, ngf_depth=8, n_blocks=3)
    net = TN.define_Gen(opt, input_type="img_depth")
    params = net.init(jax.random.PRNGKey(6))
    ref = ref_tn.define_Gen(opt, input_type="img_depth")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    depth = _rand((1, 32, 40, 1), 8)
    img = _rand((1, 32, 40, 3), 9)
    out = net.apply(params, jnp.asarray(depth), jnp.asarray(img), Ctx())
    _compare(out, ref, [_nchw(depth), _nchw(img)])


def test_translation_generator_depth_only_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_gen_d")
    opt = _translator_opt(ngf_depth=8, n_blocks=2)
    net = TN.define_Gen(opt, input_type="depth")
    params = net.init(jax.random.PRNGKey(7))
    ref = ref_tn.define_Gen(opt, input_type="depth")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    depth = _rand((1, 32, 32, 1), 10)
    out = net.apply(params, jnp.asarray(depth), None, Ctx())
    _compare(out, ref, [_nchw(depth)])


def test_translation_discriminator_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_d")
    opt = _translator_opt()
    opt.ndf = 16
    opt.n_layers_D = 3
    opt.norm_d = "none"
    opt.netD = "basic"
    opt.use_spnorm = False
    net = TN.define_D(opt, input_type="normal")
    params = net.init(jax.random.PRNGKey(8))
    ref = ref_tn.define_D(opt, input_type="normal")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((2, 48, 48, 3), 11)
    out = net.apply(params, jnp.asarray(x), Ctx())
    _compare(out, ref, [_nchw(x)])


def test_gu_discriminator_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_gu")
    opt = _translator_opt()
    opt.ndf = 16
    opt.n_layers_D = 3
    opt.norm_d = "none"
    opt.netD = "Gu"
    opt.use_spnorm = False
    net = TN.define_D(opt, input_type="depth")
    params = net.init(jax.random.PRNGKey(9))
    ref = ref_tn.define_D(opt, input_type="depth")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = _rand((2, 48, 48, 1), 12)
    # eval mode: our BatchNorm uses running stats, like torch .eval()
    out = net.apply(params, jnp.asarray(x), Ctx(train=False))
    _compare(out, ref, [_nchw(x)])


def test_pth_roundtrip(tmp_path):
    from desr_tpu import checkpoints as C

    net = N.define_G(3, 8, 8, "resnet_6blocks", norm="instance")
    params = net.init(jax.random.PRNGKey(10))
    path = str(tmp_path / "latest_net_Test.pth")
    C.save_net(params, path)
    # perturb, then reload — must restore exactly
    zeroed = {k: jnp.zeros_like(v) for k, v in params.items()}
    restored = C.load_net(zeroed, path, verbose=False)
    for k in params:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(params[k]))


def test_load_net_shape_filter(tmp_path):
    from desr_tpu import checkpoints as C

    params = {"a.weight": jnp.ones((2, 2)), "b.weight": jnp.ones((3,))}
    C.save_net({"a.weight": jnp.full((2, 2), 5.0), "b.weight": jnp.zeros((4,))},
               str(tmp_path / "x.pth"))
    out = C.load_net(params, str(tmp_path / "x.pth"), verbose=False)
    np.testing.assert_array_equal(np.asarray(out["a.weight"]), np.full((2, 2), 5.0))
    # shape mismatch -> keep original
    np.testing.assert_array_equal(np.asarray(out["b.weight"]), np.ones((3,)))
