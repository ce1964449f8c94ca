"""--device_aug: on-device fused rotate+crop+flip warp vs the host cv2 chain.

The device path must (a) draw the SAME parameter stream as the host chain from
the same rng (base_dataset.draw_geo_params is shared), and (b) reproduce the
host pixels: bit-exact for crop/flip-only samples, fp32-rounding-close (~2e-4)
for rotated ones (cv2.warpAffine uses exact float weights on float32 inputs).
Reference host chain: /root/reference/data/my_main_dataset.py:55-84,
my_I2D_dataset.py:87-102.
"""

import numpy as np
import pytest

from desr_tpu.data import transforms as T
from desr_tpu.data.base_dataset import draw_geo_params

from tests.test_data import _opt, _write_fixtures

ROT_TOL = 1e-3  # measured max |device - cv2| on [-1,1] data is ~2e-4


def _host_chain(img, angle, y, x, flip, ch, cw):
    out = T.rotate(img, angle) if angle else img
    out = T.crop(out, y, x, ch, cw)
    if flip:
        out = T.hflip(out)
    return np.clip(out, -1, 1)


def _rand_img(rng, h, w, c=4):
    # include out-of-range values so the clip-ordering equivalence is exercised
    return rng.uniform(-1.3, 1.3, (h, w, c)).astype(np.float32)


def test_warp_crop_flip_bitexact():
    from desr_tpu.ops.device_aug import warp_affine_crop

    rng = np.random.default_rng(0)
    src = _rand_img(rng, 120, 160)
    for flip in (0.0, 1.0):
        got = np.clip(  # the clip lives in make_pair_augmenter, after the warp
            np.asarray(warp_affine_crop(src, 0.0, 11.0, 23.0, flip, 96, 128)), -1, 1)
        want = _host_chain(src, 0.0, 11, 23, flip > 0.5, 96, 128)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("angle", [-30.0, -7.3, 13.9, 29.99])
def test_warp_rotate_matches_cv2(angle):
    from desr_tpu.ops.device_aug import warp_affine_crop

    rng = np.random.default_rng(1)
    src = _rand_img(rng, 120, 160)
    # full-size crop so REFLECT_101 border pixels are part of the comparison
    got = np.clip(
        np.asarray(warp_affine_crop(src, angle, 0.0, 0.0, 1.0, 120, 160)), -1, 1)
    want = _host_chain(src, angle, 0, 0, True, 120, 160)
    assert np.abs(got - want).max() < ROT_TOL


def test_draw_geo_params_consumes_rng_identically():
    # the host inline chain and draw_geo_params must advance the rng the same
    # way, so mixing host/device paths across samples keeps streams aligned
    for seed in range(8):
        r1, r2 = np.random.default_rng(seed), np.random.default_rng(seed)
        did_rot = bool(r1.uniform() < 0.9)
        angle = float(r1.uniform(-30, 30)) if did_rot else 0.0
        y, x = T.random_crop_params(r1, 120, 160, 96, 128)
        flip = bool(r1.uniform() < 0.5)
        assert (did_rot, angle, y, x, flip) == draw_geo_params(r2, 0.9, 120, 160, 96, 128)
        assert r1.uniform() == r2.uniform()  # streams still aligned after


def test_rgb2hsv_u8_matches_cv2():
    # bit-exact vs cv2 (full 2^24 sweep done offline; structured + random here)
    import cv2
    import jax.numpy as jnp

    from desr_tpu.ops.device_aug import _rgb2hsv_u8

    rng = np.random.default_rng(2)
    rand = rng.integers(0, 256, (512, 512, 3))
    grid = np.stack(np.meshgrid(np.arange(0, 256, 8), np.arange(0, 256, 8),
                                np.arange(0, 256, 8), indexing="ij"),
                    -1).reshape(1024, -1, 3)
    for rgb in (rand.astype(np.uint8), grid.astype(np.uint8)):
        want = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV).astype(np.int32)
        h, s, v = _rgb2hsv_u8(*(jnp.asarray(rgb[..., i], jnp.int32) for i in range(3)))
        got = np.stack([np.asarray(h), np.asarray(s), np.asarray(v)], -1)
        assert np.array_equal(got, want)


def test_hsv2rgb_u8_matches_cv2():
    # cv2's 8u path floors the fp32 sector interpolation (incl. its fp32
    # error); ours reproduces it except where XLA's fp32 contraction differs
    # by 1 ulp across a floor boundary: measured 1758 of the full 11.8M-combo
    # domain (0.015%), always +-1 LSB. Assert those bounds on a dense slice.
    import cv2
    import jax.numpy as jnp

    from desr_tpu.ops.device_aug import _hsv2rgb_u8

    h, s, v = np.meshgrid(np.arange(180), np.arange(0, 256, 4),
                          np.arange(0, 256, 4), indexing="ij")
    hsv = np.stack([h, s, v], -1).reshape(720, -1, 3).astype(np.uint8)
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.int32)
    r, g, b = _hsv2rgb_u8(*(jnp.asarray(hsv[..., i], jnp.int32) for i in range(3)))
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff.sum(-1) > 0).mean() < 5e-4


def test_color_jitter_device_matches_host():
    import jax.numpy as jnp

    from desr_tpu.data.transforms import apply_jitter, draw_jitter_params
    from desr_tpu.ops.device_aug import color_jitter_device

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (120, 160, 3)).astype(np.float32)
    for seed in range(6):
        b, c, s, h, order = draw_jitter_params(np.random.default_rng(seed))
        want = apply_jitter(img, b, c, s, h, order)
        got = np.asarray(color_jitter_device(
            jnp.asarray(img), jnp.asarray([b, c, s, h], jnp.float32),
            jnp.asarray(order, jnp.int32)))
        # residuals: contrast's image mean (fp32 reduction order) and the
        # 0.015% hue fp32-contraction cases — both bounded by 1 uint8 LSB
        assert np.abs(got - want).max() <= 1.0
        assert (np.abs(got - want) > 1e-3).mean() < 2e-3


def _device_vs_host_items(ds_cls, opt_host, opt_dev, index=0):
    ds_host = ds_cls(opt_host, stage="train")
    ds_dev = ds_cls(opt_dev, stage="train")
    host = ds_host[index]
    dev = ds_dev[index]
    assert "A_full" in dev and "A_aug" in dev
    from desr_tpu.data.loader import collate

    batch = collate([dev])
    finished = ds_dev.device_finish(batch)
    return host, {k: np.asarray(v)[0] if hasattr(v, "ndim") else v
                  for k, v in finished.items()}


def test_main_dataset_device_aug_equivalence(tmp_path):
    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt_host = _opt(str(tmp_path), dirs, intr, "main")
    opt_dev = _opt(str(tmp_path), dirs, intr, "main", extra=("--device_aug",))
    from desr_tpu.data.main_dataset import MainDataset

    for idx in range(3):
        host, dev = _device_vs_host_items(MainDataset, opt_host, opt_dev, idx)
        for k in ("A_i", "A_d", "B_i", "B_d"):
            assert dev[k].shape == host[k].shape
            assert np.abs(dev[k] - host[k]).max() < ROT_TOL, k
        for k in ("K_A", "K_B", "crop_A", "crop_B"):  # meta rides through
            assert np.allclose(np.asarray(dev[k]), np.asarray(host[k]))


def test_i2d_dataset_device_aug_equivalence(tmp_path):
    dirs, intr = _write_fixtures(str(tmp_path), hw=(480, 640))
    opt_host = _opt(str(tmp_path), dirs, intr, "I2D")
    opt_dev = _opt(str(tmp_path), dirs, intr, "I2D", extra=("--device_aug",))
    from desr_tpu.data.i2d_dataset import I2DDataset

    host, dev = _device_vs_host_items(I2DDataset, opt_host, opt_dev)
    # image channels: ColorJitter runs on device — residual bounded by 1 uint8
    # LSB (1/127.5 after normalization: contrast-mean fp32 + hue contraction)
    img_tol = 1.0 / 127.5 + ROT_TOL
    for k, tol in (("A_i", img_tol), ("A_d", ROT_TOL),
                   ("B_i", img_tol), ("B_d", ROT_TOL)):
        assert dev[k].shape == host[k].shape
        assert np.abs(dev[k] - host[k]).max() < tol, k


def test_main_no_aug_keeps_host_path(tmp_path):
    # --no_aug is pad+flip only: device_aug must stay inactive there
    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt = _opt(str(tmp_path), dirs, intr, "main",
               extra=("--device_aug", "--no_aug"))
    from desr_tpu.data.main_dataset import MainDataset

    item = MainDataset(opt, stage="train")[0]
    assert "A_full" not in item and "A_i" in item


def test_device_finish_composes_with_sharded_put(tmp_path):
    # the loader dispatches device_put (model.shard: batch sharded over the
    # 8-device data mesh) BEFORE device_finish — the warp must accept sharded
    # inputs and its outputs must feed a sharded train step unchanged
    import jax

    from desr_tpu.parallel.mesh import make_mesh, shard_batch

    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt_host = _opt(str(tmp_path), dirs, intr, "main")
    opt_dev = _opt(str(tmp_path), dirs, intr, "main", extra=("--device_aug",))
    from desr_tpu.data.loader import collate
    from desr_tpu.data.main_dataset import MainDataset

    mesh = make_mesh()
    ds_host = MainDataset(opt_host, stage="train")
    ds_dev = MainDataset(opt_dev, stage="train")
    batch = collate([ds_dev[i] for i in range(8)])
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    finished = ds_dev.device_finish(shard_batch(arrays, mesh))
    want = collate([ds_host[i] for i in range(8)])
    for k in ("A_i", "A_d", "B_i", "B_d"):
        got = np.asarray(finished[k])
        assert got.shape == np.asarray(want[k]).shape
        assert np.abs(got - want[k]).max() < ROT_TOL, k
        # outputs keep the data sharding (leading axis split over 8 devices)
        shards = [s.data.shape for s in finished[k].addressable_shards]
        assert all(s[0] == 1 for s in shards), (k, shards)
    jax.clear_caches()


def test_loader_integration_device_aug(tmp_path):
    # create_dataset wires device_finish: batches come out with standard keys
    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt = _opt(str(tmp_path), dirs, intr, "main",
               extra=("--device_aug", "--batch_size", "2"))
    from desr_tpu.data.i2d_dataset import I2DDataset  # noqa: F401 (import check)
    from desr_tpu.data.loader import create_dataset
    from desr_tpu.data.main_dataset import MainDataset

    loader = create_dataset(opt, MainDataset, stage="train")
    batch = next(iter(loader))
    assert "A_full" not in batch
    assert np.asarray(batch["A_i"]).shape == (2, 96, 128, 3)
    assert np.asarray(batch["A_d"]).shape == (2, 96, 128, 1)
    # test stage keeps the plain host path (no device_finish)
    test_loader = create_dataset(opt, MainDataset, stage="test")
    tb = next(iter(test_loader))
    assert "A_full" not in tb and "A_i" in tb
