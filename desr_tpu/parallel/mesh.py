"""Data-parallel device mesh utilities.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(models/networks.py:113-116) — replicate nets, scatter the batch, gather
outputs. The TPU-native equivalent implemented here is a 1-D
``jax.sharding.Mesh('data')`` over all local chips:

- parameters + optimizer state are replicated (``P()``)
- batches are sharded on the leading axis (``P('data')``)
- the gradient all-reduce is inserted by XLA/GSPMD inside the single jitted
  train step and rides the ICI, with loss means computed globally — identical
  semantics to DataParallel's gathered loss up to batch-split rounding.

At reference scale (nets of 1-10M params, batch <= 12) a pure data mesh
saturates; no DCN or model parallelism is required (SURVEY.md §2.13). The
mesh axis is named so wider layouts (e.g. ('data', 'model')) can be layered
on later without touching the train steps.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data", spatial: int = 1) -> Mesh:
    """1-D data mesh, or a 2-D ('data', 'spatial') mesh when ``spatial`` > 1.

    The spatial axis shards the image-height dimension across chips: XLA/GSPMD
    inserts the conv halo exchanges automatically, so several chips cooperate
    on ONE large frame — a capability DataParallel (the reference's only
    strategy, networks.py:113-116) has no analog for. Validated numerically
    equal to the unsharded program in tests/test_parallel.py.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if spatial <= 1:
        return Mesh(np.array(devices), (axis_name,))
    if len(devices) % spatial:
        raise ValueError(f"{len(devices)} devices not divisible by spatial={spatial}")
    grid = np.array(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, (axis_name, "spatial"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put every array of a batch dict sharded on its leading axis.

    On a 2-D ('data', 'spatial') mesh, image-like arrays — ndim >= 3 with a
    large axis-1 (the H axis of both NHWC images and planar (B,H,W) depths) —
    are additionally sharded along H. Small axis-1 arrays (3x3 intrinsics,
    crop boxes) stay spatial-replicated.
    """
    spatial = "spatial" in mesh.axis_names
    n_data = mesh.shape[axis_name]
    n_sp = mesh.shape["spatial"] if spatial else 1
    rep = replicated_sharding(mesh)

    def put(x):
        if isinstance(x, jax.Array):
            return x  # already transferred (loader-side device prefetch)
        orig = x
        x = np.asarray(x)
        if not np.issubdtype(x.dtype, np.number) and x.dtype != np.bool_:
            return orig  # path strings etc. stay host-side
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            spec = [axis_name] + [None] * (x.ndim - 1)
            if (spatial and x.ndim >= 3 and x.shape[1] >= 32
                    and x.shape[1] % n_sp == 0):
                spec[1] = "spatial"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, rep)

    return {k: put(v) for k, v in batch.items()}


def shard_batch_steps(batches, mesh: Mesh, axis_name: str = "data"):
    """Stack N per-step batch dicts into [N, ...] arrays and device_put them.

    Input to the multi-step ``lax.scan`` train path (BaseModel.jit_train_scan):
    the leading axis is the scan (step) axis and stays unsharded; the per-step
    batch axis (now axis 1) is sharded over ``data``; on a 2-D
    ('data', 'spatial') mesh image-like arrays additionally shard H (axis 2).
    """
    spatial = "spatial" in mesh.axis_names
    n_data = mesh.shape[axis_name]
    n_sp = mesh.shape["spatial"] if spatial else 1
    keys = batches[0].keys()
    out = {}
    for k in keys:
        v0 = np.asarray(batches[0][k])
        if not (np.issubdtype(v0.dtype, np.number) or v0.dtype == np.bool_):
            continue  # path strings etc. are not scan inputs
        x = np.stack([np.asarray(b[k]) for b in batches], axis=0)
        spec = [None] * x.ndim
        if x.ndim >= 2 and x.shape[1] % n_data == 0:
            spec[1] = axis_name
            if (spatial and x.ndim >= 4 and x.shape[2] >= 32
                    and x.shape[2] % n_sp == 0):
                spec[2] = "spatial"
        out[k] = jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return out


def replicate(tree, mesh: Mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
