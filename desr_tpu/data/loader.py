"""Multi-threaded prefetching data loader (reference: data/__init__.py:48-96).

Replaces torch DataLoader worker processes with a thread pool: PIL/cv2 decode
releases the GIL, so threads overlap decode with TPU compute, and the batch is
delivered as a dict of stacked numpy arrays ready for ``shard_batch``.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator

import numpy as np


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
                 max_dataset_size=2 ** 31, drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(int(num_threads), 1)
        self.max_dataset_size = max_dataset_size
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return min(len(self.dataset), self.max_dataset_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [order[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            pending = []
            bi = 0
            # keep 2 batches in flight
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < 2:
                    idxs = batches[bi]
                    pending.append(pool.map(self.dataset.__getitem__, idxs))
                    bi += 1
                yield collate(list(pending.pop(0)))


def create_dataset(opt, custom=None, stage="train"):
    """Mirror of reference create_dataset (data/__init__.py:48-60)."""
    if custom is None:
        from desr_tpu.data import dataset_for_model

        custom = dataset_for_model(opt)
    dataset = custom(opt, stage=stage)
    print(f"dataset [{type(dataset).__name__}] was created")
    bs = opt.batch_size if stage == "train" else opt.batch_size_val
    return DataLoader(
        dataset,
        batch_size=bs,
        shuffle=not opt.serial_batches,
        num_threads=int(opt.num_threads),
        max_dataset_size=getattr(opt, "max_dataset_size", 2 ** 31),
        seed=getattr(opt, "seed", 0),
    )
