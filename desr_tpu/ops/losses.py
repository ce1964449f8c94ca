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


import functools

import numpy as np


@functools.lru_cache(maxsize=128)
def _align_corners_matrix(in_size, out_size):
    """(out, in) bilinear align_corners=True interpolation matrix (numpy —
    never cache jnp values, see ops/resize.py)."""
    if out_size == 1:
        src = np.zeros((1,))
    else:
        src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(m, (np.arange(out_size), hi), frac)
    return m


def gradient_penalty(d_apply, real, fake, rng, gp_type="mixed", constant=1.0,
                     lambda_gp=10.0, eps=1e-16):
    """WGAN-GP gradient penalty (networks.py:282-316; defined but unused in
    shipped reference configs). ``d_apply`` maps an NHWC batch to logits."""
    if lambda_gp <= 0.0:
        return jnp.zeros(()), None
    if gp_type == "real":
        interp = real
    elif gp_type == "fake":
        interp = fake
    elif gp_type == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
        interp = alpha * real + (1 - alpha) * fake
    else:
        raise NotImplementedError(gp_type)

    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(interp)
    flat = grads.reshape(real.shape[0], -1)
    norm = jnp.linalg.norm(flat + eps, axis=1)
    return jnp.mean(jnp.square(norm - constant)) * lambda_gp, grads


def mean_matching_shift(rng, real, fake, direction, mu):
    """Random depth-shift augmentation (translation_network.py:244-279
    MeanMatching; unused in shipped configs). Shifts valid (> -1) pixels of
    one side by U(0, mu) and clamps to [-1, 1]."""
    shift = jax.random.uniform(rng, (), minval=0.0, maxval=mu)
    if direction == "A2B":
        mask = fake > -1.0
        fake = jnp.clip(fake + shift * mask, -1.0, 1.0)
    elif direction == "B2A":
        mask = real > -1.0
        real = jnp.clip(real + shift * mask, -1.0, 1.0)
    else:
        raise NotImplementedError("Specify direction")
    return real, fake


def _resize_bilinear_align_corners(img, out_hw):
    """torch F.upsample(mode='bilinear', align_corners=True) equivalent (NHWC).

    Implemented as two dense matrix contractions (MXU) — integer-indexed
    gathers are pathologically slow on TPU."""
    b, h, w, c = img.shape
    oh, ow = out_hw
    x = img.astype(jnp.float32)
    if oh != h:
        x = jnp.einsum("oh,bhwc->bowc", jnp.asarray(_align_corners_matrix(h, oh)), x)
    if ow != w:
        x = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(_align_corners_matrix(w, ow)), x)
    return x.astype(img.dtype)


# ---------------------------------------------------------------------------
# Planar variants: tensors with (H, W) as the LAST TWO dims — (B, H, W) depth
# maps and (B, C, H, W) normal/image maps. TPU tiles the minor two dims, so
# NHWC tensors with C in {1, 3} waste 128x/43x of every lane; the models' loss
# tails run on these planar forms.
# ---------------------------------------------------------------------------


def tv_loss_planar(img):
    """Unnormalized TV over the last two (spatial) dims."""
    w_var = jnp.sum(jnp.square(img[..., :, :-1] - img[..., :, 1:]))
    h_var = jnp.sum(jnp.square(img[..., :-1, :] - img[..., 1:, :]))
    return h_var + w_var


def tv_norm_planar(x, surf_normal=True):
    """TV_norm on (B, C, H, W) (translation_network.py:302-311)."""
    if surf_normal:
        x = x[:, :2]
    tv_h = jnp.sum(jnp.square(x[..., 1:, :] - x[..., :-1, :]))
    tv_w = jnp.sum(jnp.square(x[..., :, 1:] - x[..., :, :-1]))
    return (tv_h + tv_w) / x.size


def cos_sim_loss_planar(x, y, eps=1e-8):
    """mean(1 - cos) over channel axis 1 for (B, C, H, W) maps."""
    from desr_tpu.ops.normals import safe_norm

    nx = jnp.maximum(safe_norm(x, axis=1, keepdims=False), eps)
    ny = jnp.maximum(safe_norm(y, axis=1, keepdims=False), eps)
    cos = jnp.sum(x * y, axis=1) / (nx * ny)
    return jnp.mean(1.0 - cos)


def masked_cos_sim_loss_planar(x, y, mask_b3hw, compat_bug=True, eps=1e-8):
    """Masked 1-cos on (B, C, H, W); mask (B, C, H, W) (see masked_cos_sim_loss)."""
    from desr_tpu.ops.normals import safe_norm

    nx = jnp.maximum(safe_norm(x, axis=1, keepdims=False), eps)
    ny = jnp.maximum(safe_norm(y, axis=1, keepdims=False), eps)
    cos = jnp.sum(x * y, axis=1) / (nx * ny)
    loss = (1.0 - cos)[:, None]
    mask = mask_b3hw.astype(x.dtype)
    denom_eps = 1e6 if compat_bug else 1e-6
    return jnp.sum(loss * mask) / (jnp.sum(mask) + denom_eps)


def _resize_ac_planar(x, out_hw):
    """align_corners=True bilinear on the last two dims of (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    y = x.astype(jnp.float32)
    if oh != h:
        y = jnp.einsum("oh,...hw->...ow", jnp.asarray(_align_corners_matrix(h, oh)), y)
    if ow != w:
        # output spec "...ho" already yields (..., H, OW)
        y = jnp.einsum("ow,...hw->...ho", jnp.asarray(_align_corners_matrix(w, ow)), y)
    return y.astype(x.dtype)


def scale_pyramid_planar(img, num_scales):
    """Bilinear (align_corners=True) pyramid on (..., H, W), smallest first."""
    h, w = img.shape[-2], img.shape[-1]
    scaled = [img]
    for i in range(1, num_scales):
        ratio = 2 ** i
        scaled.append(_resize_ac_planar(img, (h // ratio, w // ratio)))
    scaled.reverse()
    return scaled


def smooth_weight_loss_planar(depth_bhw, image_b3hw, num_scales=3):
    """Image-gradient-weighted depth smoothness on planar maps
    (models/main_model.py:52-73)."""
    images = scale_pyramid_planar(image_b3hw, num_scales)
    depths = scale_pyramid_planar(depth_bhw, num_scales)
    total = 0.0
    for i in range(num_scales):
        d, im = depths[i], images[i]
        dgx = d[..., :-1, :] - d[..., 1:, :]
        dgy = d[..., :, :-1] - d[..., :, 1:]
        igx = im[..., :-1, :] - im[..., 1:, :]
        igy = im[..., :, :-1] - im[..., :, 1:]
        wx = jnp.exp(-jnp.mean(jnp.abs(igx), axis=1))
        wy = jnp.exp(-jnp.mean(jnp.abs(igy), axis=1))
        total = total + jnp.mean(jnp.abs(dgx * wx)) / (2 ** i)
        total = total + jnp.mean(jnp.abs(dgy * wy)) / (2 ** i)
    return total


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
