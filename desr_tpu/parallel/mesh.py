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


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put every array of a batch dict sharded on its leading axis."""
    sh = batch_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        # arrays whose leading axis is the batch axis get sharded, everything
        # else (scalars) is replicated
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return {k: put(v) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
