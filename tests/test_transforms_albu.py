"""Augmentation oracle vs vendored albumentations==0.4.6 semantics.

The reference pins albumentations==0.4.6 (requirements.txt:5) and builds its
train/test chains from A.Resize / A.Rotate / A.RandomCrop / A.PadIfNeeded /
A.HorizontalFlip applied jointly to img+depth (data/my_main_dataset.py:55-84,
my_I2D_dataset.py:88-104). The library is not installable here, so the 0.4.6
call-level semantics are vendored below as oracle fixtures (each function is
the pinned version's cv2 call sequence, cited); desr_tpu.data.transforms must
match them exactly.

Version-sensitive details pinned by these tests:
- Rotate center is (w/2, h/2) in 0.4.6 — later versions moved to
  (w/2-0.5, h/2-0.5); the difference is a half-pixel shift of every
  augmented sample.
- RandomCrop offset = int((extent-crop) * u), u ~ U[0,1) — the final offset
  is never selected.
- PadIfNeeded splits padding floor-top / remainder-bottom, REFLECT_101.
- Resize(interpolation=3) is cv2.INTER_AREA (not bicubic).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from desr_tpu.data import transforms as T

# ------------------------------------------------------------- 0.4.6 oracle
# albumentations/augmentations/functional.py @ 0.4.6


def albu046_rotate(img, angle):
    height, width = img.shape[:2]
    matrix = cv2.getRotationMatrix2D((width / 2, height / 2), angle, 1.0)
    return cv2.warpAffine(img, M=matrix, dsize=(width, height),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)


def albu046_pad_if_needed(img, min_height, min_width):
    rows, cols = img.shape[:2]
    h_pad_top = int((min_height - rows) / 2.0) if rows < min_height else 0
    h_pad_bottom = min_height - rows - h_pad_top if rows < min_height else 0
    w_pad_left = int((min_width - cols) / 2.0) if cols < min_width else 0
    w_pad_right = min_width - cols - w_pad_left if cols < min_width else 0
    return cv2.copyMakeBorder(img, h_pad_top, h_pad_bottom, w_pad_left,
                              w_pad_right, cv2.BORDER_REFLECT_101)


def albu046_resize(img, height, width, interpolation):
    return cv2.resize(img, dsize=(width, height), interpolation=interpolation)


def albu046_random_crop(img, crop_height, crop_width, h_start, w_start):
    height, width = img.shape[:2]
    y1 = int((height - crop_height) * h_start)
    y2 = y1 + crop_height
    x1 = int((width - crop_width) * w_start)
    x2 = x1 + crop_width
    return img[y1:y2, x1:x2]


def _imgs(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (37, 53, 3)).astype(np.float32)
    depth = rng.uniform(-1, 1, (37, 53)).astype(np.float32)
    return img, depth


# ---------------------------------------------------------------- op parity


@pytest.mark.parametrize("angle", [-30.0, -7.3, 0.0, 13.9, 30.0, 90.0])
def test_rotate_matches_046(angle):
    img, depth = _imgs()
    np.testing.assert_array_equal(T.rotate(img, angle), albu046_rotate(img, angle))
    np.testing.assert_array_equal(T.rotate(depth, angle), albu046_rotate(depth, angle))


def test_rotate_046_center_not_half_pixel():
    """Regression guard: 0.4.6 rotates about (w/2, h/2); the -0.5-center
    convention of later versions produces a visibly different image."""
    img, _ = _imgs(1)
    h, w = img.shape[:2]
    m_half = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), 17.0, 1.0)
    later = cv2.warpAffine(img, m_half, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT_101)
    ours = T.rotate(img, 17.0)
    np.testing.assert_array_equal(ours, albu046_rotate(img, 17.0))
    assert np.abs(ours - later).max() > 1e-3


@pytest.mark.parametrize("hw,minhw", [((480, 640), (512, 640)),
                                      ((37, 53), (64, 64)),
                                      ((37, 53), (40, 53)),
                                      ((64, 64), (64, 64))])
def test_pad_if_needed_matches_046(hw, minhw):
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, hw + (3,)).astype(np.float32)
    ours = T.pad_if_needed(img, *minhw)
    want = albu046_pad_if_needed(img, *minhw)
    np.testing.assert_array_equal(ours, want)
    # odd pad splits floor-top / remainder-bottom
    if hw == (37, 53) and minhw == (40, 53):
        assert ours.shape[0] == 40
        np.testing.assert_array_equal(ours[1], img[0])  # top pad = 1 row


@pytest.mark.parametrize("interp", [0, 1, 2, 3, 4])
def test_resize_matches_046(interp):
    img, depth = _imgs(3)
    np.testing.assert_array_equal(T.resize(img, 24, 40, interp),
                                  albu046_resize(img, 24, 40, interp))
    np.testing.assert_array_equal(T.resize(depth, 24, 40, interp),
                                  albu046_resize(depth, 24, 40, interp))


def test_random_crop_offsets_match_046():
    class _U:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self):
            return self.vals.pop(0)

    for h_start, w_start in [(0.0, 0.0), (0.3, 0.7), (0.999999, 0.999999)]:
        y, x = T.random_crop_params(_U([h_start, w_start]), 480, 640, 384, 512)
        assert y == int((480 - 384) * h_start)
        assert x == int((640 - 512) * w_start)
    # 0.4.6 never selects the final offset
    y, x = T.random_crop_params(_U([0.9999999, 0.9999999]), 480, 640, 384, 512)
    assert y == 480 - 384 - 1 and x == 640 - 512 - 1


# ------------------------------------------------------------- chain parity


def test_main_train_chain_matches_046():
    """Resize(AREA) -> Rotate -> RandomCrop -> HFlip, jointly on img+depth,
    exactly the my_main_dataset.py:66-77 train chain with fixed params."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (300, 400, 3)).astype(np.float32)
    depth = rng.uniform(0, 5100, (300, 400)).astype(np.float32)
    angle, h_start, w_start = -21.5, 0.37, 0.81
    lh, lw, ch, cw = 480, 640, 384, 512

    def ours(x):
        x = T.resize(x, lh, lw, 3)
        x = T.rotate(x, angle)
        y0 = int((lh - ch) * h_start)
        x0 = int((lw - cw) * w_start)
        x = T.crop(x, y0, x0, ch, cw)
        return T.hflip(x)

    def oracle(x):
        x = albu046_resize(x, lh, lw, 3)
        x = albu046_rotate(x, angle)
        x = albu046_random_crop(x, ch, cw, h_start, w_start)
        return np.ascontiguousarray(x[:, ::-1])

    np.testing.assert_array_equal(ours(img), oracle(img))
    np.testing.assert_array_equal(ours(depth), oracle(depth))


def test_test_chain_matches_046():
    """Resize(480,640,AREA) -> PadIfNeeded(512,640): the test-time chain whose
    16-row reflected pads motivate the [:, 16:-16, :] dump crop."""
    rng = np.random.default_rng(8)
    img = rng.uniform(0, 255, (468, 624, 3)).astype(np.float32)
    ours = T.pad_if_needed(T.resize(img, 480, 640, 3), 512, 640)
    want = albu046_pad_if_needed(albu046_resize(img, 480, 640, 3), 512, 640)
    np.testing.assert_array_equal(ours, want)
    assert ours.shape == (512, 640, 3)
    np.testing.assert_array_equal(ours[15], ours[17])  # REFLECT_101 around row 16
