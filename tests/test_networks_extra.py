"""Parity for the less-traveled translation-zoo surface (split generators)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu.models import translation_networks as TN
from desr_tpu.models.layers import Ctx
from tests.reference_oracle import load_reference_module

torch = pytest.importorskip("torch")


def _opt(**kw):
    opt = TN.default_translator_opt(**kw)
    opt.gpu_ids = []
    opt.ngf_img_feature = 8
    return opt


def _to_torch_state(params):
    return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}


def test_generator_i_f_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_if")
    opt = _opt()
    net = TN.define_Gen(opt, input_type="img", out_type="feature")
    params = net.init(jax.random.PRNGKey(0))
    ref = ref_tn.define_Gen(opt, input_type="img", out_type="feature")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(net.apply(params, jnp.asarray(x), Ctx()))
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=2e-4)


def test_generator_f_d_parity():
    ref_tn = load_reference_module("models/translation_network.py", "ref_tn_fd")
    opt = _opt()
    net = TN.define_Gen(opt, input_type="feature", out_type="depth")
    params = net.init(jax.random.PRNGKey(1))
    ref = ref_tn.define_Gen(opt, input_type="feature", out_type="depth")
    ref.load_state_dict(_to_torch_state(params), strict=True)
    feat_ch = 8 * 2 ** 2  # ngf_img_feature * 2**n_downsampling
    x = np.random.default_rng(1).uniform(-1, 1, (1, 8, 8, feat_ch)).astype(np.float32)
    out = np.asarray(net.apply(params, jnp.asarray(x), Ctx()))
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=2e-4)


def test_crop_indx():
    from desr_tpu.utils.util import crop_indx

    assert crop_indx("scene0000_00_2_3") == (64 * 2 + 5, 64 * 2 + 5 + 320,
                                             64 * 3 + 5, 64 * 3 + 5 + 320)
