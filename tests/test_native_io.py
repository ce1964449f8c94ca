import numpy as np
import pytest

from desr_tpu.data import native_io


@pytest.fixture(scope="module")
def lib_ok():
    if not native_io.available():
        pytest.skip("native dataio library unavailable (no g++/libpng)")
    return True


def test_decode_uint16_png(lib_ok, tmp_path):
    import imageio

    rng = np.random.default_rng(0)
    depth = rng.integers(0, 65535, (48, 64)).astype(np.uint16)
    path = tmp_path / "d.png"
    imageio.imwrite(path, depth)
    got = native_io.decode_png(path)
    np.testing.assert_array_equal(got, depth)


def test_decode_rgb_png(lib_ok, tmp_path):
    import imageio

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
    path = tmp_path / "i.png"
    imageio.imwrite(path, img)
    got = native_io.decode_png(path)
    np.testing.assert_array_equal(got, img.astype(np.uint16))


def test_depth_normalization_matches_python(lib_ok, tmp_path):
    import imageio

    from desr_tpu.data.transforms import normalize_depth_np

    rng = np.random.default_rng(2)
    depth = rng.integers(0, 8000, (30, 30)).astype(np.uint16)
    path = tmp_path / "d.png"
    imageio.imwrite(path, depth)
    got = native_io.load_depth_normalized(path, 5100.0)
    want = normalize_depth_np(depth.astype(np.int32), 5100.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_image_normalization(lib_ok, tmp_path):
    import imageio

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
    path = tmp_path / "i.png"
    imageio.imwrite(path, img)
    got = native_io.load_image_normalized(path)
    want = (img.astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_area_matches_cv2(lib_ok):
    import cv2

    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (60, 80, 3)).astype(np.float32)
    got = native_io.resize_area(img, 30, 40)
    want = cv2.resize(img, (40, 30), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(got, want, atol=1e-5)
