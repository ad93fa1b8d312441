"""Host-side batching + device prefetch.

Replaces torch DataLoader worker processes (data/__init__.py:19-54) with a
background-thread loader and a double-buffered device prefetcher: while the
TPU runs step N, the host decodes/collates batch N+1 and ships it to HBM.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

import jax


def collate_stack(items: list[dict]) -> dict:
    """Default collate: stack matching keys (drops non-array metadata)."""
    out = {}
    for k in items[0]:
        v = items[0][k]
        if isinstance(v, np.ndarray):
            out[k] = np.stack([it[k] for it in items], 0)
        else:
            out[k] = [it[k] for it in items]
    return out


def collate_adobe_arbitrary(items: list[dict], lq_size: int = 64,
                            rng: random.Random | None = None,
                            size_buckets: int | None = 16) -> dict:
    """collate_function (data/__init__.py:91-131): batch-level random
    d_scale ∈ [2,4], GT crop of size floor(lq*d), MATLAB-bicubic LQ
    1/(2d) and GT 1/2 downsample, joint flip/rot augmentation.

    TPU note: the reference samples d_scale continuously, which under XLA
    would recompile the train step on every batch. size_buckets rounds the
    GT crop down to a multiple (16 → ~9 distinct shapes over the [2,4]
    sweep, one compile each); set None for exact reference behaviour."""
    from motif_tpu import native

    rng = rng or random
    d_scale = rng.uniform(2, 4)
    gt_size = int(np.floor(lq_size * d_scale))
    if size_buckets:
        gt_size = max(size_buckets, gt_size // size_buckets * size_buckets)
        d_scale = gt_size / lq_size

    ref = items[0]["gt_raw"][0]
    H, W = ref.shape[:2]
    x = rng.randint(0, max(0, H - gt_size))
    y = rng.randint(0, max(0, W - gt_size))

    def crop(img):
        return img[x:x + gt_size, y:y + gt_size]

    # MATLAB-bicubic LR synthesis via the native (C++/OpenMP) core
    lq_in = np.stack([np.stack([crop(f) for f in it["lq_raw"]], 0)
                      for it in items], 0) * 255.0
    gt_in = np.stack([np.stack([crop(f) for f in it["gt_raw"]], 0)
                      for it in items], 0) * 255.0
    B, NL = lq_in.shape[:2]
    NG = gt_in.shape[1]
    lqs = native.matlab_resize_batch(
        lq_in.reshape(B * NL, *lq_in.shape[2:]), 1 / (2 * d_scale)) / 255.0
    gts = native.matlab_resize_batch(
        gt_in.reshape(B * NG, *gt_in.shape[2:]), 0.5) / 255.0
    lqs = lqs.reshape(B, NL, *lqs.shape[1:])
    gts = gts.reshape(B, NG, *gts.shape[1:])

    hflip = rng.random() < 0.5
    vflip = rng.random() < 0.5
    rot90 = rng.random() < 0.5
    if hflip:
        lqs, gts = lqs[:, :, :, ::-1], gts[:, :, :, ::-1]
    if vflip:
        lqs, gts = lqs[:, :, ::-1], gts[:, :, ::-1]
    if rot90:
        lqs, gts = lqs.transpose(0, 1, 3, 2, 4), gts.transpose(0, 1, 3, 2, 4)

    return {"lq": np.ascontiguousarray(lqs, np.float32),
            "gt": np.ascontiguousarray(gts, np.float32),
            "times": np.stack([it["times"] for it in items], 0),
            "out_hw": (gts.shape[2], gts.shape[3])}


class Subset:
    """Index-restricted view of a dataset — used for per-host sharding of
    the sample list in multihost runs (the DistIterSampler rank striding,
    reference data/data_sampler.py:53-60)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self.indices[i])]


class BatchLoader:
    """Iterates a dataset in batches on a background thread."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 collate: Callable = collate_stack, seed: int = 0,
                 drop_last: bool = True, epoch_ratio: int = 1,
                 queue_size: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate = collate
        self.seed = seed
        self.drop_last = drop_last
        self.epoch_ratio = epoch_ratio
        self.queue_size = queue_size

    def __len__(self):
        n = len(self.dataset) * self.epoch_ratio
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        if self.shuffle:
            g = np.random.default_rng(self.seed + epoch)
            order = g.permutation(len(self.dataset) * self.epoch_ratio) % len(self.dataset)
        else:
            order = np.arange(len(self.dataset))
        q: queue.Queue = queue.Queue(maxsize=self.queue_size)
        n_batches = len(order) // self.batch_size if self.drop_last \
            else -(-len(order) // self.batch_size)

        def worker():
            try:
                for b in range(n_batches):
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    q.put(self.collate([self.dataset[int(i)] for i in idx]))
                q.put(None)
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item


def device_prefetch(it: Iterable[dict], sharding=None, size: int = 2) -> Iterator[dict]:
    """Double-buffer batches into HBM ahead of consumption."""
    buf: list[dict] = []
    it = iter(it)

    multiproc = jax.process_count() > 1

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if sharding is not None and multiproc:
            # multihost: each process holds its shard of the global batch;
            # assemble the distributed array without gathering to one host.
            arrays = {k: jax.make_array_from_process_local_data(sharding, v)
                      for k, v in arrays.items()}
        elif sharding is not None:
            arrays = jax.device_put(arrays, sharding)
        else:
            arrays = jax.device_put(arrays)
        return {**arrays, **rest}

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
