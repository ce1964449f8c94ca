"""Functional compute ops (the L1 op library of the framework).

Everything here is a pure function of jnp arrays, shape-static, and safe to use
inside a single jitted train step. Reference semantics are documented per-op
with file:line citations into the PyTorch reference.
"""

from desr_tpu.ops.depth import (
    data_to_meters,
    normalize_depth_int,
    normalize_depth_float,
    normalize_image,
    hole_mask,
    valid_mask,
    random_rect_holes,
    punch_holes,
)
from desr_tpu.ops.normals import (
    np_gradient,
    safe_norm,
    surface_normals,
    surface_normals_fov,
    surface_normals_from_K,
    surface_normals_planar,
    surface_normals_fov_planar,
    surface_normals_from_K_planar,
)
from desr_tpu.ops.losses import (
    l1_loss,
    mse_loss,
    masked_l1_loss,
    masked_mean_dif,
    masked_signed_mean,
    tv_loss,
    tv_norm,
    cos_sim_loss,
    masked_cos_sim_loss,
    gan_loss,
    smooth_weight_loss,
    scale_pyramid,
)
from desr_tpu.ops.resize import (
    resize_bicubic,
    resize_bicubic_planar,
    resize_bilinear,
    resize_bilinear_planar,
    resize_nearest,
    resize_nearest_planar,
)
from desr_tpu.ops.ssim import ssim
from desr_tpu.ops.optim import adam_init, adam_update, lr_schedule
from desr_tpu.ops.pallas_kernels import masked_loss_sums
