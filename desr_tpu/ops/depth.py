"""Depth normalization, hole masks and on-device randomized hole synthesis.

All tensors are NHWC (TPU-native layout; the PyTorch reference is NCHW).
Depth maps are single-channel: (B, H, W, 1).

Reference semantics reproduced here:
- depth/image normalization: data/my_main_dataset.py:32-57
- ``data_to_meters``:        util/util.py:8-12
- hole mask + dilated valid mask ("right_mask"): models/main_model.py:208-230
- random rectangle hole synthesis: models/main_model.py:257-298 (train n=60
  p=0.9; test n=11 p=0) and models/main_sr_model.py:296-337 (p=0.95 real / 0.90
  syn for SR). The reference builds these masks with per-sample numpy loops on
  the host inside forward(); here they are vectorized jax.random code that runs
  on-device inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DEPTH_MM = 5100.0


def data_to_meters(x, max_distance=MAX_DEPTH_MM):
    """[-1,1]-normalized depth -> meters. Reference: util/util.py:8-12."""
    x = x * (max_distance / 2) + (max_distance / 2)
    return x / 1000.0


def normalize_image(img_u8):
    """uint8 RGB -> [-1, 1] float. Reference: my_main_dataset.py:35-36."""
    return (img_u8.astype(jnp.float32) - 127.5) / 127.5


def normalize_depth_int(depth_mm, max_mm=MAX_DEPTH_MM):
    """uint16/int32 depth in mm -> [-1, 1]. Reference: my_main_dataset.py:39-42."""
    d = jnp.minimum(depth_mm.astype(jnp.float32), max_mm) / max_mm
    return d * 2.0 - 1.0


def normalize_depth_float(depth, max_val=MAX_DEPTH_MM):
    """float depth (.npy path) -> [-1, 1]: values < 0.33 are zeroed first.

    Reference: my_main_dataset.py:44-47.
    """
    d = jnp.where(depth < 0.33, 0.0, depth)
    d = jnp.minimum(d, max_val) / max_val
    return d * 2.0 - 1.0


def hole_mask(depth, border=-0.97):
    """1.0 where depth is a hole (depth <= border), else 0.0.

    Reference: models/main_model.py:208 (border=-0.97) and
    models/translation_model.py:324-326 (border=-0.98, `<=` via `<= -0.98`).
    """
    return jnp.where(depth <= border, 1.0, 0.0).astype(depth.dtype)


def valid_mask(depth, border=-0.97):
    """1.0 where no hole exists in the 3x3 neighborhood, else 0.0.

    Accepts (B, H, W) planar or (B, H, W, 1) NHWC depth. The reference
    computes this with four sequential in-place shifted adds of the hole mask
    followed by `< 1` (models/main_model.py:209-215). The net effect of that
    sequence is exactly a 3x3 box dilation of the hole mask followed by
    logical-not, implemented here with one fused XLA reduce-window.
    """
    holes = hole_mask(depth, border)
    if depth.ndim == 3:
        window, strides = (1, 3, 3), (1, 1, 1)
        padding = ((0, 0), (1, 1), (1, 1))
    else:
        window, strides = (1, 3, 3, 1), (1, 1, 1, 1)
        padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    dilated = jax.lax.reduce_window(
        holes, -jnp.inf, jax.lax.max,
        window_dimensions=window, window_strides=strides, padding=padding,
    )
    return (1.0 - dilated).astype(depth.dtype)


def random_rect_holes(
    rng,
    base_valid_mask,
    *,
    n_max=60,
    n_min=10,
    p=0.90,
    min_frac=150,
    max_frac=8,
):
    """Per-sample random rectangle hole masks, fully on-device.

    Returns a float mask shaped like ``base_valid_mask`` (NHW1) that is 0 where
    a synthetic hole was punched into a previously-valid pixel and 1 elsewhere
    — the exact output contract of the reference's numpy loop
    (models/main_model.py:257-298):

    - ``number`` ~ U{n_min, .., n_max-1} rectangles per sample
    - corner xs ~ U{0..W-1}, ys ~ U{0..H-1}
    - sizes_x ~ U{W//min_frac .. W//max_frac-1} * Bernoulli(p)  (ONE Bernoulli
      draw shared by all rectangles of a sample per axis, as in the reference)
    - final mask is 0 only where (rectangle covers pixel) AND (base mask valid)

    Deviation (documented): the reference samples corners without replacement
    (np.random.choice(replace=False)); we sample with replacement. For 10-60
    corners over >=384*512 grids the collision probability is negligible and
    the hole-statistics are unchanged, while keeping the op shape-static.

    Accepts (B, H, W) planar or (B, H, W, 1) NHWC masks.
    """
    planar = base_valid_mask.ndim == 3
    if planar:
        base_valid_mask = base_valid_mask[..., None]
    if p == 0.0:
        # Bernoulli(p=0) zeroes every rectangle size, so the general path
        # below deterministically returns all-ones (no pixel is covered by a
        # zero-size rectangle). Short-circuit statically: eval-mode forwards
        # pass p=0.0 (main_sr_model.py:299/320 eval branch), so serving
        # graphs drop the whole iota/einsum/punch synthesis chain instead of
        # compiling it in. Numerics identical (tests/test_depth_ops.py);
        # sibling RNG streams are unaffected (the caller split/fold_in'd).
        out = jnp.ones_like(base_valid_mask)
        return out[..., 0] if planar else out
    b, h, w, _ = base_valid_mask.shape
    k_num, k_x, k_y, k_sx, k_sy, k_bx, k_by = jax.random.split(rng, 7)

    # Static upper bound n_max-1 rectangles; rectangles beyond `number` are
    # disabled via a validity mask (shape-static replacement for the
    # data-dependent loop bound).
    n_rect = n_max - 1 if n_max > n_min else n_min
    number = jax.random.randint(k_num, (b, 1), n_min, max(n_max, n_min + 1))
    active = (
        jnp.arange(n_rect)[None, :] < number
    )  # (B, R)

    xs = jax.random.randint(k_x, (b, n_rect), 0, w)
    ys = jax.random.randint(k_y, (b, n_rect), 0, h)
    sx_lo, sx_hi = w // min_frac, max(w // max_frac, w // min_frac + 1)
    sy_lo, sy_hi = h // min_frac, max(h // max_frac, h // min_frac + 1)
    sizes_x = jax.random.randint(k_sx, (b, n_rect), sx_lo, sx_hi)
    sizes_y = jax.random.randint(k_sy, (b, n_rect), sy_lo, sy_hi)
    bern_x = jax.random.bernoulli(k_bx, p, (b, 1)).astype(jnp.int32)
    bern_y = jax.random.bernoulli(k_by, p, (b, 1)).astype(jnp.int32)
    sizes_x = sizes_x * bern_x
    sizes_y = sizes_y * bern_y

    # A pixel is covered iff ANY rectangle covers both its row and column:
    #   covered[b, y, x] = OR_r (row_in[b, r, y] AND col_in[b, r, x])
    # which is an (H, R) x (R, W) matmul per sample — it runs on the MXU and
    # avoids materializing the (B, R, H, W) broadcast (77 MB/sample at SR res).
    yy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    row_in = ((yy >= ys[:, :, None]) & (yy < (ys + sizes_y)[:, :, None])
              & active[:, :, None]).astype(jnp.float32)  # (B, R, H)
    col_in = ((xx >= xs[:, :, None]) & (xx < (xs + sizes_x)[:, :, None])).astype(jnp.float32)
    counts = jnp.einsum("brh,brw->bhw", row_in, col_in)
    covered = (counts > 0.5)[..., None]
    base_valid = base_valid_mask > 0.05
    punched = base_valid & covered
    out = jnp.where(punched, 0.0, 1.0).astype(base_valid_mask.dtype)
    return out[..., 0] if planar else out


def punch_holes(depth, gt_mask, fill=-1.0):
    """Apply a 0/1 hole mask to depth: masked pixels become `fill` (-1 = hole).

    Reference: models/main_model.py:276 / :298.
    """
    return jnp.where(gt_mask < 0.05, jnp.asarray(fill, depth.dtype), depth)
