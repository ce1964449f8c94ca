"""Loader double-buffering and worker scaling (VERDICT weak #9).

The decode work is mocked with sleeps so worker-process scaling is provable
on any host (the 1-core dev VM included: sleeping workers overlap regardless
of core count); device prefetch is verified by checking that batches leave
the loader with their arrays already transferred/sharded.
"""

import os
import time

import numpy as np
import pytest


class SleepDataset:
    """Mock decode: each item costs a fixed wall-clock sleep."""

    def __init__(self, n=16, delay=0.05):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        return {"x": np.full((4, 4), i, np.float32), "path": f"p{i}"}


@pytest.mark.skipif(not hasattr(os, "fork"), reason="fork required")
def test_worker_processes_scale_mocked_decode():
    from desr_tpu.data.loader import DataLoader

    n, delay, bs = 16, 0.05, 4

    inline = DataLoader(SleepDataset(n, delay), batch_size=bs, shuffle=False,
                        num_threads=0)
    t0 = time.time()
    list(inline)
    t_inline = time.time() - t0

    pooled = DataLoader(SleepDataset(n, delay), batch_size=bs, shuffle=False,
                        num_threads=4)
    list(pooled)  # warm the fork pool
    t0 = time.time()
    batches = list(pooled)
    t_pooled = time.time() - t0
    pooled.close()

    assert len(batches) == n // bs
    # 4 sleeping workers must overlap: >= 2x faster than inline decode
    assert t_pooled < t_inline / 2, (t_pooled, t_inline)


def test_loader_device_prefetch_transfers_arrays():
    import jax

    from desr_tpu.data.loader import DataLoader
    from desr_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(jax.devices()[:4])
    put = lambda b: shard_batch(b, mesh)
    dl = DataLoader(SleepDataset(8, 0.0), batch_size=4, shuffle=False,
                    num_threads=0, device_put_fn=put)
    batches = list(dl)
    assert len(batches) == 2
    for b in batches:
        assert isinstance(b["x"], jax.Array), "array not device-prefetched"
        assert b["x"].sharding.spec[0] == "data"
        assert isinstance(b["path"], list)  # strings stay host-side

    # shard_batch must pass already-transferred arrays through untouched
    again = shard_batch(batches[0], mesh)
    assert again["x"] is batches[0]["x"]


def test_main_py_wires_device_prefetch():
    import inspect

    import main as driver

    src = inspect.getsource(driver.main)
    assert "device_put_fn=model.shard" in src
