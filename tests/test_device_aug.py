"""--device_aug: on-device jitter + three-shear rotate/crop/flip.

The device path must (a) draw the SAME parameter stream as the host chain from
the same rng (base_dataset.draw_geo_params is shared), and (b) reproduce the
host pixels: bit-exact for crop/flip-only samples, <=1 uint8 LSB for jitter.
Rotated samples use the Paeth three-shear resampler (the per-pixel-gather
bilinear warp measured 7.6 s/batch on TPU — PERF.md): same rotation map as
cv2, different interpolation kernel, so their oracle is a numpy reference of
the SAME algorithm (exact), plus a smooth-image agreement bound vs cv2.
Reference host chain: /root/reference/data/my_main_dataset.py:55-84,
my_I2D_dataset.py:87-102.
"""

import numpy as np
import pytest

from desr_tpu.data import transforms as T
from desr_tpu.data.base_dataset import draw_geo_params

from tests.test_data import _opt, _write_fixtures

ROT_TOL = 2e-3  # device (fp32 jnp) vs the fp32 numpy paeth reference


def _shear_np(canvas, shifts, pad):
    L, M = canvas.shape[:2]
    k = np.floor(shifts).astype(np.int64)
    g = (shifts - k).astype(np.float32).reshape(L, *([1] * (canvas.ndim - 1)))
    spec = [(0, 0), (pad, pad)] + [(0, 0)] * (canvas.ndim - 2)
    padded = np.pad(canvas, spec, mode="reflect")
    rows = np.stack([padded[l, k[l] + pad: k[l] + pad + M + 1] for l in range(L)])
    return (rows[:, :M] * (1 - g) + rows[:, 1:] * g).astype(np.float32)


def paeth_rotate_np(img, angle_deg):
    """fp32 numpy mirror of ops/device_aug.paeth_rotate (the device oracle)."""
    h, w = img.shape[:2]
    th = np.float32(angle_deg) * np.float32(np.pi / 180.0)
    a = np.float32(-np.tan(th / np.float32(2.0), dtype=np.float32))
    b = np.sin(th, dtype=np.float32)
    y = (np.arange(h) - h / 2.0).astype(np.float32)
    x = (np.arange(w) - w / 2.0).astype(np.float32)
    tmax = np.tan(np.deg2rad(30.0) / 2.0)
    smax = np.sin(np.deg2rad(30.0))
    pad_x = int(np.ceil(tmax * (h / 2.0))) + 2
    pad_y = int(np.ceil(smax * (w / 2.0))) + 2
    out = _shear_np(img, a * y, pad_x)
    out = _shear_np(out.swapaxes(0, 1), b * x, pad_y).swapaxes(0, 1)
    return np.ascontiguousarray(_shear_np(out, a * y, pad_x))


def _host_chain(img, angle, y, x, flip, ch, cw, rotate=None):
    rotate = rotate if rotate is not None else T.rotate
    out = rotate(img, angle) if angle else img
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
@pytest.mark.parametrize("cy", [4, 24])  # cy=24 reaches the padded last tile
def test_warp_rotate_matches_numpy_paeth(angle, cy):
    from desr_tpu.ops.device_aug import warp_affine_crop

    rng = np.random.default_rng(1)
    src = _rand_img(rng, 120, 160)
    got = np.clip(
        np.asarray(warp_affine_crop(src, angle, float(cy), 9.0, 1.0, 96, 128)), -1, 1)
    want = _host_chain(src, angle, cy, 9, True, 96, 128, rotate=paeth_rotate_np)
    assert np.abs(got - want).max() < ROT_TOL


@pytest.mark.parametrize("angle", [-30.0, 13.9])
def test_paeth_rotation_map_agrees_with_cv2_on_smooth(angle):
    # same rotation GEOMETRY as cv2's direct-bilinear warp: on smooth content
    # (where the interpolation-kernel difference vanishes) the interiors agree
    import cv2

    from desr_tpu.ops.device_aug import paeth_rotate

    rng = np.random.default_rng(2)
    img = cv2.GaussianBlur(rng.uniform(-1, 1, (120, 160)).astype(np.float32),
                           (0, 0), 3)
    got = np.asarray(paeth_rotate(img[..., None], angle))[..., 0]
    want = T.rotate(img, angle)
    interior = (slice(30, 90), slice(40, 120))
    assert np.abs(got[interior] - want[interior]).max() < 4e-3


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
        # 0.015% hue fp32-contraction cases — 1 uint8 LSB, except isolated
        # hue-truncation flips (up to the H-step RGB slope, ~8.5)
        d = np.abs(got - want)
        assert (d > 1.0).mean() < 1e-4
        assert d.max() <= 10.0
        assert (d > 1e-3).mean() < 2e-3


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


def test_main_dataset_device_aug_equivalence(tmp_path, monkeypatch):
    # host comparator uses the SAME three-shear resampler (rotated samples'
    # oracle); parameter stream identity is what makes the items comparable
    monkeypatch.setattr(T, "rotate", paeth_rotate_np)
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


def test_i2d_dataset_device_aug_equivalence(tmp_path, monkeypatch):
    monkeypatch.setattr(T, "rotate", paeth_rotate_np)
    dirs, intr = _write_fixtures(str(tmp_path), hw=(480, 640))
    opt_host = _opt(str(tmp_path), dirs, intr, "I2D")
    opt_dev = _opt(str(tmp_path), dirs, intr, "I2D", extra=("--device_aug",))
    from desr_tpu.data.i2d_dataset import I2DDataset

    host, dev = _device_vs_host_items(I2DDataset, opt_host, opt_dev)
    # image channels: ColorJitter runs on device — bounded by 1 uint8 LSB
    # (1/127.5 after normalization) except isolated pixels where fp32
    # reduction-order differences flip the hue uint8 truncation (one H unit
    # moves RGB by up to ~8.5/255); those must stay vanishingly rare
    img_tol = 1.0 / 127.5 + ROT_TOL
    for k, tol in (("A_i", img_tol), ("A_d", ROT_TOL),
                   ("B_i", img_tol), ("B_d", ROT_TOL)):
        assert dev[k].shape == host[k].shape
        d = np.abs(dev[k] - host[k])
        assert (d > tol).mean() < 1e-4, k
        assert d.max() < 0.1, k


def test_main_no_aug_keeps_host_path(tmp_path):
    # --no_aug is pad+flip only: device_aug must stay inactive there
    dirs, intr = _write_fixtures(str(tmp_path), hw=(240, 320))
    opt = _opt(str(tmp_path), dirs, intr, "main",
               extra=("--device_aug", "--no_aug"))
    from desr_tpu.data.main_dataset import MainDataset

    item = MainDataset(opt, stage="train")[0]
    assert "A_full" not in item and "A_i" in item


def test_device_finish_composes_with_sharded_put(tmp_path, monkeypatch):
    # the loader dispatches device_put (model.shard: batch sharded over the
    # 8-device data mesh) BEFORE device_finish — the warp must accept sharded
    # inputs and its outputs must feed a sharded train step unchanged
    monkeypatch.setattr(T, "rotate", paeth_rotate_np)
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


# ------------------------------------------------------ SR device_aug (r4)


@pytest.mark.parametrize("src,dst", [
    ((480, 640), (960, 1280)),   # SR depth: integer upscale -> replication
    ((968, 1296), (960, 1280)),  # SR color: both-axes downscale -> true area
    ((200, 300), (73, 111)),     # fractional decimation
    ((64, 64), (128, 96)),       # fractional zoom (generic 2-tap coeffs)
    ((480, 640), (960, 640)),    # mixed: one axis up -> generic path
])
def test_resize_cv2_inter_area_matches_cv2(src, dst):
    """ops/resize.resize_cv2_inter_area == cv2.resize(INTER_AREA) float path
    in every regime cv2 distinguishes (decimation / zoom / mixed axes)."""
    import cv2

    from desr_tpu.ops.resize import resize_cv2_inter_area

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (1, *src, 3)).astype(np.float32)
    want = cv2.resize(x[0], (dst[1], dst[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize_cv2_inter_area(x, dst))[0]
    assert np.abs(got - want).max() < 3e-7


def test_sr_dataset_device_aug_equivalence(tmp_path):
    """SR --device_aug: decode+normalize on host, canvas resize+pad+crop on
    device — numerically equivalent to the host chain (the resize is
    cv2-exact, pad/crop/clip are exact), same rng stream (identical crop
    offsets ride into crop_A/crop_B)."""
    from desr_tpu.data.loader import collate
    from desr_tpu.data.sr_dataset import NaiveSRDataset

    dirs, intr = _write_fixtures(str(tmp_path), hw=(480, 640))
    opt_host = _opt(str(tmp_path), dirs, intr, "main", extra=("--SR",))
    opt_dev = _opt(str(tmp_path), dirs, intr, "main",
                   extra=("--SR", "--device_aug"))
    ds_host = NaiveSRDataset(opt_host, stage="train")
    ds_dev = NaiveSRDataset(opt_dev, stage="train")
    for idx in range(2):
        host = ds_host[idx]
        dev_item = ds_dev[idx]
        assert "A_img_src" in dev_item and "A_i" not in dev_item
        finished = ds_dev.device_finish(collate([dev_item]))
        dev = {k: np.asarray(v)[0] if hasattr(v, "ndim") else v
               for k, v in finished.items()}
        for k in ("A_i", "A_d", "B_i", "B_d"):
            assert dev[k].shape == host[k].shape, k
            assert np.abs(dev[k] - host[k]).max() < 3e-6, k
        for k in ("K_A", "K_B", "crop_A", "crop_B"):
            assert np.allclose(np.asarray(dev[k]), np.asarray(host[k])), k


def test_sr_device_aug_loader_integration(tmp_path):
    """End to end through create_dataset: the SR loader emits standard model
    keys at HR crop size with --device_aug on."""
    from desr_tpu.data.loader import create_dataset
    from desr_tpu.data.sr_dataset import NaiveSRDataset

    dirs, intr = _write_fixtures(str(tmp_path), hw=(480, 640))
    opt = _opt(str(tmp_path), dirs, intr, "main",
               extra=("--SR", "--device_aug"))
    opt.batch_size = 2
    loader = create_dataset(opt, NaiveSRDataset, stage="train")
    batch = next(iter(loader))
    ch, cw = opt.crop_size_h * 2, opt.crop_size_w * 2
    assert np.asarray(batch["A_d"]).shape == (2, ch, cw, 1)
    assert np.asarray(batch["B_i"]).shape == (2, ch, cw, 3)
    assert "A_img_src" not in batch
