"""Loss functions (masked depth losses, GAN objectives, smoothness, TV).

Pure jnp; every loss returns a scalar. NHWC tensors throughout.

Reference mapping:
- masked L1 / mean-dif / signed mean:  models/translation_network.py:281-300
- TV_norm (first-2-channel TV / numel): models/translation_network.py:302-311
- cos-sim + masked cos-sim:            models/translation_network.py:313-327
  (the masked variant divides by sum(mask) + 1e+6 — an as-shipped bug that we
  reproduce behind `compat_bug=True` because shipped training configs depend
  on its scale; pass compat_bug=False for the intended 1e-6 denominator)
- GANLoss (lsgan/vanilla/wgangp):      models/networks.py:213-279
- tv_loss (unnormalized):              models/main_model.py:15-19
- smoothness pyramid loss:             models/main_model.py:22-73
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x, y):
    return jnp.mean(jnp.square(x - y))


def masked_l1_loss(x, y, mask, eps=1e-6):
    """sum(|y - x| * mask) / (sum(mask) + eps). translation_network.py:281-286."""
    mask = mask.astype(x.dtype)
    return jnp.sum(jnp.abs(y - x) * mask) / (jnp.sum(mask) + eps)


def masked_mean_dif(x, y, mask, eps=1e-6):
    """mean over batch of |masked per-image mean difference|.

    translation_network.py:288-293.
    """
    mask = mask.astype(x.dtype)
    num = jnp.sum((y - x) * mask, axis=(1, 2, 3))
    den = jnp.sum(mask, axis=(1, 2, 3)) + eps
    return jnp.mean(jnp.abs(num / den))


def masked_signed_mean(x, y, mask, eps=1e-6):
    """sum((y - x) * mask) / (sum(mask) + eps). translation_network.py:295-300."""
    mask = mask.astype(x.dtype)
    return jnp.sum((y - x) * mask) / (jnp.sum(mask) + eps)


def tv_loss(img):
    """Unnormalized total variation (sum of squared diffs).

    models/main_model.py:15-19 (used on predicted normals with a 1e-7 weight).
    """
    w_var = jnp.sum(jnp.square(img[:, :, :-1, :] - img[:, :, 1:, :]))
    h_var = jnp.sum(jnp.square(img[:, :-1, :, :] - img[:, 1:, :, :]))
    return h_var + w_var


def tv_norm(x, surf_normal=True):
    """TV on the first two channels, normalized by the (sliced) numel.

    translation_network.py:302-311.
    """
    if surf_normal:
        x = x[..., :2]
    tv_h = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    tv_w = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return (tv_h + tv_w) / x.size


def cos_sim_loss(x, y, eps=1e-8):
    """mean(1 - cosine_similarity) over the channel axis.

    translation_network.py:313-318; eps matches torch CosineSimilarity (1e-8,
    applied as a max on each norm). Uses the gradient-safe norm (normal maps
    contain exact-zero rows from the FOV quirk — see ops.normals.safe_norm).
    """
    from desr_tpu.ops.normals import safe_norm

    nx = jnp.maximum(safe_norm(x, keepdims=False), eps)
    ny = jnp.maximum(safe_norm(y, keepdims=False), eps)
    cos = jnp.sum(x * y, axis=-1) / (nx * ny)
    return jnp.mean(1.0 - cos)


def masked_cos_sim_loss(x, y, mask, compat_bug=True, eps=1e-8):
    """Masked 1-cos loss. translation_network.py:320-327.

    With compat_bug=True (default) the denominator is sum(mask) + 1e+6 — the
    literal constant shipped in the reference (a typo for 1e-6) which scales
    this loss down by ~1e-6; shipped translation configs only exercise it via
    the off-by-default cycle_A path, but we keep the constant so loss curves
    match when that path is enabled.
    """
    from desr_tpu.ops.normals import safe_norm

    nx = jnp.maximum(safe_norm(x, keepdims=False), eps)
    ny = jnp.maximum(safe_norm(y, keepdims=False), eps)
    cos = jnp.sum(x * y, axis=-1) / (nx * ny)
    loss = (1.0 - cos)[..., None]
    mask = mask.astype(x.dtype)
    denom_eps = 1e6 if compat_bug else 1e-6
    return jnp.sum(loss * mask) / (jnp.sum(mask) + denom_eps)


def gan_loss(prediction, target_is_real, mode="lsgan"):
    """GAN objective on raw discriminator logits.

    models/networks.py:213-279: lsgan = MSE vs 1/0 labels, vanilla =
    BCE-with-logits, wgangp = -+mean.
    """
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCEWithLogits: max(x,0) - x*t + log(1 + exp(-|x|))
        x = prediction
        return jnp.mean(
            jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
        )
    if mode == "wgangp":
        m = jnp.mean(prediction)
        return -m if target_is_real else m
    raise NotImplementedError(f"gan mode {mode} not implemented")


def _resize_bilinear_align_corners(img, out_hw):
    """torch F.upsample(mode='bilinear', align_corners=True) equivalent (NHWC)."""
    b, h, w, c = img.shape
    oh, ow = out_hw
    dtype = img.dtype

    def axis_weights(in_size, out_size):
        if out_size == 1:
            src = jnp.zeros((1,), dtype)
        else:
            src = jnp.arange(out_size, dtype=dtype) * ((in_size - 1) / (out_size - 1))
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = src - lo.astype(dtype)
        return lo, hi, frac

    lo_r, hi_r, fr_r = axis_weights(h, oh)
    lo_c, hi_c, fr_c = axis_weights(w, ow)
    top = img[:, lo_r, :, :] * (1 - fr_r)[None, :, None, None] + img[:, hi_r, :, :] * fr_r[None, :, None, None]
    out = top[:, :, lo_c, :] * (1 - fr_c)[None, None, :, None] + top[:, :, hi_c, :] * fr_c[None, None, :, None]
    return out


def scale_pyramid(img, num_scales):
    """Bilinear (align_corners=True) pyramid, smallest scale first.

    models/main_model.py:22-38.
    """
    b, h, w, c = img.shape
    scaled = [img]
    for i in range(1, num_scales):
        ratio = 2 ** i
        scaled.append(_resize_bilinear_align_corners(img, (h // ratio, w // ratio)))
    scaled.reverse()
    return scaled


def smooth_weight_loss(depth, image, num_scales=3):
    """Image-gradient-weighted multi-scale depth smoothness.

    models/main_model.py:52-73. Note the reference's gradient_x differences
    rows and gradient_y differences columns (axes swapped vs their names);
    reproduced as-is since only the sum matters.
    """
    images = scale_pyramid(image, num_scales)
    depths = scale_pyramid(depth, num_scales)
    total = 0.0
    for i in range(num_scales):
        d, im = depths[i], images[i]
        dgx = d[:, :-1, :, :] - d[:, 1:, :, :]
        dgy = d[:, :, :-1, :] - d[:, :, 1:, :]
        igx = im[:, :-1, :, :] - im[:, 1:, :, :]
        igy = im[:, :, :-1, :] - im[:, :, 1:, :]
        wx = jnp.exp(-jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
        wy = jnp.exp(-jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
        # scale_pyramid returns smallest first; reference divides by 2**i with
        # i indexing that reversed list.
        total = total + jnp.mean(jnp.abs(dgx * wx)) / (2 ** i)
        total = total + jnp.mean(jnp.abs(dgy * wy)) / (2 ** i)
    return total
