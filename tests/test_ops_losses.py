import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops import losses as L


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def test_masked_l1_vs_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference_module

    ref = load_reference_module("models/translation_network.py", "ref_tn_l")
    x = _rand((2, 8, 8, 1), 1)
    y = _rand((2, 8, 8, 1), 2)
    mask = _rand((2, 8, 8, 1), 3) > 0.0
    got = float(L.masked_l1_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)))
    with torch.no_grad():
        want = float(
            ref.MaskedL1Loss()(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(y.transpose(0, 3, 1, 2)),
                torch.from_numpy(mask.transpose(0, 3, 1, 2)),
            )
        )
    assert abs(got - want) < 1e-6


def test_masked_mean_dif_vs_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference_module

    ref = load_reference_module("models/translation_network.py", "ref_tn_l2")
    x = _rand((3, 6, 6, 1), 4)
    y = _rand((3, 6, 6, 1), 5)
    mask = _rand((3, 6, 6, 1), 6) > 0.2
    got = float(L.masked_mean_dif(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)))
    with torch.no_grad():
        want = float(
            ref.MaskedMeanDif()(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(y.transpose(0, 3, 1, 2)),
                torch.from_numpy(mask.transpose(0, 3, 1, 2)),
            )
        )
    assert abs(got - want) < 1e-6


def test_tv_norm_and_cos_sim_vs_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference_module

    ref = load_reference_module("models/translation_network.py", "ref_tn_l3")
    x = _rand((2, 8, 8, 3), 7)
    y = _rand((2, 8, 8, 3), 8)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want_tv = float(ref.TV_norm(surf_normal=True)(tx))
        want_cos = float(ref.CosSimLoss()(tx, ty))
    assert abs(float(L.tv_norm(jnp.asarray(x))) - want_tv) < 1e-6
    assert abs(float(L.cos_sim_loss(jnp.asarray(x), jnp.asarray(y))) - want_cos) < 1e-6


def test_masked_cos_sim_compat_bug():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import load_reference_module

    ref = load_reference_module("models/translation_network.py", "ref_tn_l4")
    x = _rand((2, 8, 8, 3), 9)
    y = _rand((2, 8, 8, 3), 10)
    mask = _rand((2, 8, 8, 3), 11) > 0.0
    with torch.no_grad():
        want = float(
            ref.MaskedCosSimLoss()(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(y.transpose(0, 3, 1, 2)),
                torch.from_numpy(mask.transpose(0, 3, 1, 2)),
            )
        )
    got = float(
        L.masked_cos_sim_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    )
    assert abs(got - want) < 1e-9  # the 1e+6-denominator as-shipped behavior


def test_gan_loss_modes():
    torch = pytest.importorskip("torch")
    pred = _rand((2, 5, 5, 1), 12, lo=-2, hi=2)
    tp = torch.from_numpy(pred)
    # lsgan
    assert abs(
        float(L.gan_loss(jnp.asarray(pred), True, "lsgan"))
        - float(torch.nn.MSELoss()(tp, torch.ones_like(tp)))
    ) < 1e-6
    # vanilla
    assert abs(
        float(L.gan_loss(jnp.asarray(pred), False, "vanilla"))
        - float(torch.nn.BCEWithLogitsLoss()(tp, torch.zeros_like(tp)))
    ) < 1e-5
    # wgangp
    assert abs(float(L.gan_loss(jnp.asarray(pred), True, "wgangp")) + pred.mean()) < 1e-6


def test_tv_loss_matches_formula():
    img = _rand((2, 6, 7, 3), 13)
    got = float(L.tv_loss(jnp.asarray(img)))
    want = np.sum((img[:, :, :-1, :] - img[:, :, 1:, :]) ** 2) + np.sum(
        (img[:, :-1, :, :] - img[:, 1:, :, :]) ** 2
    )
    assert abs(got - want) < 1e-3


def test_smooth_weight_loss_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    depth = _rand((2, 16, 24, 1), 14)
    image = _rand((2, 16, 24, 3), 15)

    def torch_oracle(depth, image, num_scales=3):
        # Literal re-execution of models/main_model.py:22-73.
        def pyramid(img):
            out = [img]
            h, w = img.shape[2], img.shape[3]
            for i in range(1, num_scales):
                r = 2 ** i
                out.append(
                    F.interpolate(img, size=(h // r, w // r), mode="bilinear", align_corners=True)
                )
            out.reverse()
            return out

        gx = lambda im: im[:, :, :-1, :] - im[:, :, 1:, :]
        gy = lambda im: im[:, :, :, :-1] - im[:, :, :, 1:]
        imgs, deps = pyramid(image), pyramid(depth)
        total = 0.0
        for i in range(num_scales):
            wx = torch.exp(-torch.mean(torch.abs(gx(imgs[i])), 1, keepdim=True))
            wy = torch.exp(-torch.mean(torch.abs(gy(imgs[i])), 1, keepdim=True))
            total += float(torch.mean(torch.abs(gx(deps[i]) * wx))) / 2 ** i
            total += float(torch.mean(torch.abs(gy(deps[i]) * wy))) / 2 ** i
        return total

    with torch.no_grad():
        want = torch_oracle(
            torch.from_numpy(depth.transpose(0, 3, 1, 2)),
            torch.from_numpy(image.transpose(0, 3, 1, 2)),
        )
    got = float(L.smooth_weight_loss(jnp.asarray(depth), jnp.asarray(image), 3))
    assert abs(got - want) < 1e-5
