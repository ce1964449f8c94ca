"""Host-side augmentation primitives with albumentations-equivalent semantics.

The reference augments with albumentations (cv2-backed) applied jointly to
image+depth (data/my_main_dataset.py:18-90). albumentations is not available
here; these functions call cv2 directly with the same interpolation and border
conventions:

Semantics pinned to albumentations==0.4.6 (reference requirements.txt:5):

- Resize(interpolation=3) == cv2.INTER_AREA; =1 bilinear, =2 cubic, =4 lanczos
- Rotate: bilinear, border REFLECT_101, rotation center (w/2, h/2) — 0.4.6
  rotates about the pixel-grid corner, NOT the (w/2-0.5, h/2-0.5) pixel
  center later versions use; the half-pixel shift feeds every loss
- PadIfNeeded: centered (top pad = floor), border REFLECT_101 — the 480->512
  pad adds 16 reflected rows top and bottom, which is why test-time
  prediction dumps crop [:, 16:-16, :] (main_model.py:333)
- RandomCrop: offset = int((extent - crop) * u), u ~ U[0,1) — 0.4.6 never
  selects the final offset
- HorizontalFlip / joint application with shared params across targets
  (additional_targets={'depth': 'image'})

All functions take and return HWC (or HW) numpy float32 arrays. The vendored
0.4.6 call-level semantics live in tests/test_transforms_albu.py as the
oracle fixtures.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None

INTER = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # cv2 interpolation codes pass through

if cv2 is not None:
    # the loader parallelizes across items with a thread pool; cv2's internal
    # threading on top of that causes oversubscription
    cv2.setNumThreads(1)


def resize(img, height, width, interpolation=3):
    if img.shape[0] == height and img.shape[1] == width:
        return img
    return cv2.resize(img, (width, height), interpolation=INTER[interpolation])


def rotate(img, angle, interpolation=1, border_mode=None):
    border_mode = cv2.BORDER_REFLECT_101 if border_mode is None else border_mode
    h, w = img.shape[:2]
    # albumentations 0.4.6 F.rotate: center (w/2, h/2), no -0.5 correction
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    return cv2.warpAffine(img, m, (w, h), flags=interpolation, borderMode=border_mode)


def pad_if_needed(img, min_h, min_w, border_mode=None):
    border_mode = cv2.BORDER_REFLECT_101 if border_mode is None else border_mode
    h, w = img.shape[:2]
    pt = max((min_h - h) // 2, 0)
    pb = max(min_h - h - pt, 0)
    pl = max((min_w - w) // 2, 0)
    pr = max(min_w - w - pl, 0)
    if pt == pb == pl == pr == 0:
        return img
    return cv2.copyMakeBorder(img, pt, pb, pl, pr, border_mode)


def random_crop_params(rng, h, w, crop_h, crop_w):
    # albumentations 0.4.6 F.random_crop: offset = int((extent - crop) * u)
    y = int(max(h - crop_h, 0) * float(rng.uniform()))
    x = int(max(w - crop_w, 0) * float(rng.uniform()))
    return y, x


def crop(img, y, x, crop_h, crop_w):
    return img[y : y + crop_h, x : x + crop_w]


def hflip(img):
    return np.ascontiguousarray(img[:, ::-1])


def draw_jitter_params(rng, brightness=0.1, contrast=0.1, saturation=0.1, hue=0.05):
    """ColorJitter parameter draws, shared by the host chain and --device_aug
    (the on-device jitter in ops/device_aug.py) so both paths consume the rng
    identically: 4 factor uniforms, then the op-order permutation."""
    b = float(rng.uniform(1 - brightness, 1 + brightness))
    c = float(rng.uniform(1 - contrast, 1 + contrast))
    s = float(rng.uniform(1 - saturation, 1 + saturation))
    hshift = float(rng.uniform(-hue, hue))
    order = rng.permutation(4)
    return b, c, s, hshift, order


def color_jitter(rng, img_u8, brightness=0.1, contrast=0.1, saturation=0.1, hue=0.05):
    """torchvision-style ColorJitter on a uint8 RGB image
    (data/my_I2D_dataset.py:212-214). Factors are sampled uniformly from
    [1-x, 1+x] (hue from [-hue, hue]) and applied in random order."""
    b, c, s, hshift, order = draw_jitter_params(
        rng, brightness, contrast, saturation, hue)
    return apply_jitter(img_u8, b, c, s, hshift, order)


def apply_jitter(img_u8, b, c, s, hshift, order):
    """Apply drawn ColorJitter parameters (host path / --device_aug fallback
    for images whose raw size differs from the load size)."""
    img = img_u8.astype(np.float32)

    def do_brightness(x):
        return np.clip(x * b, 0, 255)

    def do_contrast(x):
        mean = x.mean()
        return np.clip(mean + (x - mean) * c, 0, 255)

    def do_saturation(x):
        gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
        gray = gray[..., None]
        return np.clip(gray + (x - gray) * s, 0, 255)

    def do_hue(x):
        hsv = cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.float32)
        # fp32 shift arithmetic, matching the --device_aug jitter exactly —
        # float64 here would flip the uint8 H truncation on ~1e-5 of pixels
        hsv[..., 0] = (hsv[..., 0] + np.float32(hshift) * np.float32(180.0)) % np.float32(180.0)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)

    ops = [do_brightness, do_contrast, do_saturation, do_hue]
    for i in order:
        img = ops[i](img)
    return img


def normalize_image_np(img):
    """(u8-range float) -> [-1, 1] (my_main_dataset.py:35-36)."""
    return (img.astype(np.float32) - 127.5) / 127.5


def normalize_depth_np(depth, meters=5100.0):
    """int depth (mm) or float depth -> [-1, 1] (my_main_dataset.py:38-52)."""
    if np.issubdtype(depth.dtype, np.integer):
        d = np.where(depth > meters, meters, depth) / meters
    else:
        d = np.where(depth < 0.33, 0.0, depth)
        d = np.where(d > meters, meters, d) / meters
    return (d * 2.0 - 1.0).astype(np.float32)
