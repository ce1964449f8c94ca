"""Surface-normal operators (NHWC).

Three normal estimators exist in the reference and all are reproduced:

1. ``surface_normals``        — image-space normals from np.gradient-style
                                central differences (models/norms.py:180-235,
                                duplicated in models/I2D_model.py:9-64).
2. ``surface_normals_fov``    — fixed-60°-FOV camera-grid normals used by the
                                translation stage (models/translation_network.py:329-360).
3. ``surface_normals_from_K`` — intrinsics-based normals from a K-unprojected
                                point cloud (models/norms.py:6-158,
                                ``SurfaceNormals_new``). The reference runs
                                this in float64; on TPU we default to float32
                                (validated against the float64 oracle in
                                tests/test_normals.py) and accept a `dtype`
                                argument so CPU tests can run exact float64.

Depth maps are (B, H, W, 1); normals are (B, H, W, 3).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=True):
    """L2 norm with a well-defined (zero) gradient at x == 0.

    ``jnp.linalg.norm`` has a NaN gradient at exactly zero vectors, which the
    FOV normals hit on every reflect-pad boundary row (the difference windows
    are offset by one, so the first gy row is exactly zero — an as-shipped
    reference quirk, translation_network.py:351-356). Values are identical to
    the plain norm.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def np_gradient(f, axis):
    """np.gradient with unit spacing along `axis`.

    2nd-order central differences in the interior, 1st-order at the edges —
    exactly models/norms.py:192-235.
    """
    f = jnp.moveaxis(f, axis, 0)
    interior = (f[2:] - f[:-2]) / 2.0
    first = (f[1] - f[0])[None]
    last = (f[-1] - f[-2])[None]
    out = jnp.concatenate([first, interior, last], axis=0)
    return jnp.moveaxis(out, 0, axis)


def surface_normals_planar(depth_bhw, eps=1e-6):
    """Image-space normals on planar depth (B, H, W) -> (B, 3, H, W).

    Channel-FIRST output: TPU tiles the last two dims, so (B, 3, H, W) keeps
    (H, W) unpadded where (B, H, W, 3) would pad the 3-lane axis to 128
    (43x memory amplification on every loss-tail intermediate).
    """
    dzdx = -np_gradient(depth_bhw, axis=1)  # rows (H)
    dzdy = -np_gradient(depth_bhw, axis=2)  # cols (W)
    ones = jnp.ones_like(depth_bhw)
    n = jnp.stack([dzdx, dzdy, ones], axis=1)
    norm = safe_norm(n, axis=1)
    return n / (norm + eps)


def surface_normals(depth, eps=1e-6):
    """Image-space normals: normalize([-dD/drow, -dD/dcol, 1]). NHWC wrapper.

    Reference: models/norms.py:180-190 (`dzdx` = gradient over torch axis 2 =
    rows, `dzdy` = axis 3 = cols; channel order [dzdx, dzdy, 1]).
    """
    return jnp.moveaxis(surface_normals_planar(depth[..., 0], eps), 1, -1)


def _fov_grid(h, w, fov_deg, dtype):
    """The fixed camera grid of translation_network.py:338-342."""
    t = math.tan(fov_deg / 2.0 / 180.0 * math.pi)
    x = (jnp.arange(1, w + 1, dtype=dtype) - (w + 1) / 2.0) / (w / 2.0) * t
    y = -(jnp.arange(1, h + 1, dtype=dtype) - (h + 1) / 2.0) / (h / 2.0) * t * (h / w)
    gx = jnp.broadcast_to(x[None, :], (h, w))
    gy = jnp.broadcast_to(y[:, None], (h, w))
    ones = jnp.ones((h, w), dtype=dtype)
    return jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)


def surface_normals_fov_planar(depth_bhw, fov_deg=60.0, canvas_hw=(482, 642), eps=1e-8):
    """Fixed-FOV surface normals of the translation stage, planar.

    (B, H, W) depth -> (B, 3, H, W) normals.
    Reference: models/translation_network.py:329-360. Reproduces the as-shipped
    quirks exactly: the crop into the 482x642 canvas uses offset ``p + 1`` (one
    past center), and the horizontal/vertical difference windows are offset by
    one row / one column respectively (``narrow(2, 0, h)`` on the padded
    tensor). These normals feed the normal discriminators, so weight parity
    requires bit-level structural parity here.
    """
    b, h, w = depth_bhw.shape
    ch, cw = canvas_hw
    grid = _fov_grid(ch, cw, fov_deg, depth_bhw.dtype)  # (H, W, 3)
    ph = (ch - h) // 2
    pw = (cw - w) // 2
    grid = jnp.moveaxis(grid[ph + 1 : ph + 1 + h, pw + 1 : pw + 1 + w, :], -1, 0)

    v = depth_bhw[:, None] * grid[None]  # (B, 3, H, W)
    pv = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    # gx: cols [0:w] - cols [2:w+2], rows [0:h] of the padded tensor.
    gx = (pv[:, :, 0:h, 0:w] - pv[:, :, 0:h, 2 : 2 + w]) / 2.0
    # gy: rows [2:h+2] - rows [0:h], cols [0:w] of the padded tensor.
    gy = (pv[:, :, 2 : 2 + h, 0:w] - pv[:, :, 0:h, 0:w]) / 2.0
    crs = jnp.cross(gx, gy, axis=1)
    norm = safe_norm(crs, axis=1)
    return -crs / jnp.maximum(norm, eps)


def surface_normals_fov(depth, fov_deg=60.0, canvas_hw=(482, 642), eps=1e-8):
    """NHWC wrapper around surface_normals_fov_planar."""
    return jnp.moveaxis(
        surface_normals_fov_planar(depth[..., 0], fov_deg, canvas_hw, eps), 1, -1)


def _inv3x3(K):
    """Closed-form batched 3x3 inverse (adjugate / det).

    Avoids jnp.linalg.inv's LU path, which is unsupported for f64 and slow for
    tiny batched matrices on TPU."""
    a, b, c = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    d, e, f = K[..., 1, 0], K[..., 1, 1], K[..., 1, 2]
    g, h, i = K[..., 2, 0], K[..., 2, 1], K[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def depth_to_points_planar(depth01_bhw, K, crop, shift=0.5):
    """Unproject orthogonal planar depth into camera-space points (B, 3, H, W).

    depth01_bhw: (B, H, W) depth in [0, 1]; K: (B, 3, 3); crop: (B, 4) rows
    [h0, h1, w0, w1] in pixels. Reference: models/norms.py:75-101 (``batch_pc``).
    """
    b, h, w = depth01_bhw.shape
    dtype = depth01_bhw.dtype
    K = K.astype(dtype)
    crop = crop.astype(dtype)
    # Per-sample pixel grids: v over rows crop[:,0]..crop[:,1], u over cols.
    v = crop[:, 0:1] + jnp.arange(h, dtype=dtype)[None, :] + shift  # (B, H)
    u = crop[:, 2:3] + jnp.arange(w, dtype=dtype)[None, :] + shift  # (B, W)
    vv = jnp.broadcast_to(v[:, :, None], (b, h, w))
    uu = jnp.broadcast_to(u[:, None, :], (b, h, w))
    ones = jnp.ones_like(vv)
    pix = jnp.stack([uu, vv, ones], axis=1)  # (B, 3, H, W)
    Kinv = _inv3x3(K)
    pts = jnp.einsum("blk,bkhw->blhw", Kinv, pix)
    pts = pts / pts[:, 2:3]  # orthogonal depth convention
    return pts * depth01_bhw[:, None]


def points_to_normals_planar(coords, eps=None):
    """First-order normals of a planar point cloud (B, 3, H, W) -> (B, 3, H, W).

    Reference: models/norms.py:29-73 (order2=True path). Normalization matches
    torch.nn.functional.normalize (x / max(||x||, 1e-12)).
    """
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    dxdu = np_gradient(x, axis=2)
    dydu = np_gradient(y, axis=2)
    dzdu = np_gradient(z, axis=2)
    dxdv = np_gradient(x, axis=1)
    dydv = np_gradient(y, axis=1)
    dzdv = np_gradient(z, axis=1)
    n_x = dydv * dzdu - dydu * dzdv
    n_y = dzdv * dxdu - dzdu * dxdv
    n_z = dxdv * dydu - dxdu * dydv
    n = jnp.stack([n_x, n_y, n_z], axis=1)
    norm = safe_norm(n, axis=1)
    if eps is None:
        eps = jnp.asarray(1e-12, n.dtype)
    return n / jnp.maximum(norm, eps)


def surface_normals_from_K_planar(depth_bhw, K, crop, shift=0.5, dtype=jnp.float32):
    """Intrinsics-based surface normals (``SurfaceNormals_new``), planar.

    depth_bhw: (B, H, W) in [-1, 1]; converted internally to [0, 1]
    (models/norms.py:103-108). Returns (B, 3, H, W) float32. The reference
    requires float64; `dtype` defaults to float32 for TPU speed — tests
    validate fp32 vs the fp64 oracle to < 2e-3 max component error.
    """
    d = (depth_bhw.astype(dtype) + 1.0) / 2.0
    pts = depth_to_points_planar(d, K, crop, shift=shift)
    return points_to_normals_planar(pts).astype(jnp.float32)


# NHWC wrappers (used by tests / external callers)

def depth_to_points(depth01, K, crop, shift=0.5):
    return jnp.moveaxis(depth_to_points_planar(depth01[..., 0], K, crop, shift), 1, -1)


def points_to_normals(coords, eps=None):
    return jnp.moveaxis(points_to_normals_planar(jnp.moveaxis(coords, -1, 1), eps), 1, -1)


def surface_normals_from_K(depth, K, crop, shift=0.5, dtype=jnp.float32):
    return jnp.moveaxis(
        surface_normals_from_K_planar(depth[..., 0], K, crop, shift, dtype), 1, -1)
