"""Multi-process prefetching data loader (reference: data/__init__.py:48-96).

``--num_threads`` maps to worker PROCESSES, exactly like torch DataLoader's
``num_workers``: the decode+augment work is numpy/cv2-heavy and GIL-bound, so
threads give no speedup (measured: 8 threads == 1 thread). Workers are forked
with the dataset snapshot inherited (no per-item pickling of the dataset);
batches are prefetched two deep so the host pipeline overlaps device compute.
With ``num_threads <= 1`` (or where fork is unavailable) loading is inline.
"""

from __future__ import annotations

import multiprocessing
import os
from typing import Iterator

import numpy as np

# set by _init_worker in forked children
_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset
    try:
        import cv2

        cv2.setNumThreads(1)
    except ImportError:
        pass


def _worker_get(idx):
    return _WORKER_DS[int(idx)]


def collate(samples):
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings (paths)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=True, num_threads=4,
                 max_dataset_size=2 ** 31, drop_last=False, seed=0,
                 device_put_fn=None, device_finish_fn=None):
        """``device_put_fn`` (e.g. ``model.shard``) enables host->device
        double-buffering: the (async) device transfer of a batch is dispatched
        the moment its host decode completes — while the device is still
        executing the previous step — instead of at ``set_input`` time.

        ``device_finish_fn`` (e.g. ``dataset.device_finish``) runs on the
        transferred arrays in the parent process — the --device_aug hook that
        turns full-size tensors + parameter rows into cropped model inputs
        with one on-device warp (also dispatched async, so it overlaps the
        in-flight step exactly like the transfer)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(int(num_threads), 0)
        self.max_dataset_size = max_dataset_size
        self.drop_last = drop_last
        self.device_put_fn = device_put_fn
        self.device_finish_fn = device_finish_fn
        self._rng = np.random.default_rng(seed)
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            import atexit

            ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                                  initargs=(self.dataset,))
            atexit.register(self.close)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return min(len(self.dataset), self.max_dataset_size)

    def _batches(self):
        n = len(self)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [order[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def _finish(self, host_batch):
        # jax.device_put is async: dispatching here (right after host decode)
        # overlaps the transfer with the in-flight device step. Non-array
        # values (path strings) stay host-side.
        if self.device_put_fn is None and self.device_finish_fn is None:
            return host_batch
        arrays = {k: v for k, v in host_batch.items() if isinstance(v, np.ndarray)}
        if self.device_put_fn is not None:
            arrays = self.device_put_fn(arrays)
        if self.device_finish_fn is not None:
            arrays = self.device_finish_fn(arrays)
        out = {k: v for k, v in host_batch.items() if not isinstance(v, np.ndarray)}
        out.update(arrays)
        return out

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        use_procs = (self.num_workers > 1 and hasattr(os, "fork"))
        if not use_procs:
            for idxs in batches:
                yield self._finish(collate([self.dataset[int(i)] for i in idxs]))
            return

        pool = self._get_pool()  # persistent across epochs
        # keep 2 batches in flight
        pending = []
        bi = 0
        while bi < len(batches) or pending:
            while bi < len(batches) and len(pending) < 2:
                pending.append(pool.map_async(_worker_get, list(batches[bi])))
                bi += 1
            yield self._finish(collate(pending.pop(0).get()))


def create_dataset(opt, custom=None, stage="train", device_put_fn=None):
    """Mirror of reference create_dataset (data/__init__.py:48-60)."""
    if custom is None:
        from desr_tpu.data import dataset_for_model

        custom = dataset_for_model(opt)
    dataset = custom(opt, stage=stage)
    print(f"dataset [{type(dataset).__name__}] was created")
    bs = opt.batch_size if stage == "train" else opt.batch_size_val
    finish_fn = None
    if getattr(opt, "device_aug", False) and stage == "train":
        finish_fn = getattr(dataset, "device_finish", None)
    return DataLoader(
        dataset,
        batch_size=bs,
        shuffle=not opt.serial_batches,
        num_threads=int(opt.num_threads),
        max_dataset_size=getattr(opt, "max_dataset_size", 2 ** 31),
        seed=getattr(opt, "seed", 0),
        device_put_fn=device_put_fn,
        device_finish_fn=finish_fn,
    )
