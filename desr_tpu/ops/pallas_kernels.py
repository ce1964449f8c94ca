"""Pallas TPU kernels for hot ops.

``masked_loss_sums``: the main model's loss zoo reads the same pred/target
tensors many times for its masked L1/L2 reductions (main_model.py:383-400).
This kernel computes, in ONE pass over HBM:

    s0 = sum |t*m1 - p*m1|          (masked L1 numerator)
    s1 = sum |t*m1*m2 - p*m1*m2|    (hole-masked L1 numerator)
    s2 = sum (t*m1*m2 - p*m1*m2)^2  (hole-masked L2 numerator)

The grid is a sequential loop on TPU, so partial sums accumulate in a VMEM
scratch accumulator and are written out on the last step. Inputs are flattened
and zero-padded to (8, 128)-aligned tiles (zero mask rows contribute nothing).

On non-TPU backends the kernel runs in interpreter mode (tests), and
``masked_loss_sums_reference`` provides the pure-jnp semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128
_SUBLANES = 8
_TILE_ROWS = 256  # rows of 128 lanes per grid step -> 128KiB/input tile (f32)


def masked_loss_sums_reference(pred, target, m1, m2):
    d1 = target * m1 - pred * m1
    d2 = target * m1 * m2 - pred * m1 * m2
    return (jnp.sum(jnp.abs(d1)), jnp.sum(jnp.abs(d2)), jnp.sum(jnp.square(d2)))


def _kernel(p_ref, t_ref, m1_ref, m2_ref, out_ref, acc_ref):
    # TPU VMEM stores must be >= row-shaped (no scalar stores), so each
    # quantity accumulates a (1, 128) lane-sum row; the caller reduces lanes.
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:]
    t = t_ref[:]
    m1 = m1_ref[:]
    m2 = m2_ref[:]
    d1 = t * m1 - p * m1
    d2 = d1 * m2  # (t*m1 - p*m1)*m2 == t*m1*m2 - p*m1*m2
    acc_ref[0:1, :] += jnp.sum(jnp.abs(d1), axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(jnp.abs(d2), axis=0, keepdims=True)
    acc_ref[2:3, :] += jnp.sum(d2 * d2, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _masked_loss_sums_impl(p, t, m1, m2, interpret=False):
    n = p.size
    tile = _TILE_ROWS * _LANES
    n_pad = -(-n // tile) * tile
    grid = n_pad // tile

    def prep(x):
        flat = jnp.ravel(x).astype(jnp.float32)
        flat = jnp.pad(flat, (0, n_pad - n))
        return flat.reshape(grid * _TILE_ROWS, _LANES)

    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((8, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
        interpret=interpret,
    )(prep(p), prep(t), prep(m1), prep(m2))
    sums = jnp.sum(out, axis=1)
    return sums[0], sums[1], sums[2]


def masked_loss_sums(pred, target, m1, m2, force_interpret=None):
    """Fused (L1, hole-L1, hole-L2) sums. Falls back to pure jnp off-TPU."""
    if not _HAS_PALLAS:
        return masked_loss_sums_reference(pred, target, m1, m2)
    if force_interpret is None:
        force_interpret = jax.default_backend() != "tpu"
    return _masked_loss_sums_impl(pred, target, m1, m2, interpret=force_interpret)


# -- differentiable wrapper -------------------------------------------------
#
# pallas_call has no autodiff rule, so the train path uses a custom_vjp: the
# forward is the fused one-pass kernel; the backward is the closed form
#
#   dL/dp = -(m1*sign(d1)*g0 + m1*m2*sign(d2)*g1 + 2*m1*m2*d2*g2)
#   dL/dt = +(same)
#
# which XLA fuses into a single elementwise pass of its own. Masks get zero
# cotangents (they are data-derived step functions; the reference's autograd
# likewise treats them as constants since sign()/where() kill those grads).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_loss_sums_diff(pred, target, m1, m2, force_interpret=None):
    return masked_loss_sums(pred, target, m1, m2, force_interpret)


def _mls_fwd(pred, target, m1, m2, force_interpret):
    out = masked_loss_sums(pred, target, m1, m2, force_interpret)
    return out, (pred, target, m1, m2)


def _mls_bwd(force_interpret, res, gs):
    p, t, m1, m2 = res
    g0, g1, g2 = gs
    f32 = jnp.float32
    d1 = (t * m1 - p * m1).astype(f32)
    d2 = d1 * m2
    gt = (jnp.sign(d1) * g0 + m1 * (jnp.sign(d2) * g1 + 2.0 * d2 * g2)) * m1
    return (-gt).astype(p.dtype), gt.astype(t.dtype), None, None


masked_loss_sums_diff.defvjp(_mls_fwd, _mls_bwd)


def fused_hole_means(pred, target, m1, m2, force_interpret=None):
    """The main/SR models' (task, holes, holes_l2) loss triplet in one HBM
    pass (main_model.py:383-400 reads these tensors ~6 times):

        task  = mean|t*m1 - p*m1|
        holes = mean|t*m1*m2 - p*m1*m2|
        l2    = mean((t*m1*m2 - p*m1*m2)^2) * 5
    """
    s0, s1, s2 = masked_loss_sums_diff(pred, target, m1, m2, force_interpret)
    n = pred.size
    return s0 / n, s1 / n, s2 / n * 5.0
