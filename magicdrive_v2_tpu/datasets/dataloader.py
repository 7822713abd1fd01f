"""Host-side prefetching dataloader (thread pool + bounded queue).

Replaces the reference's torch DataLoader + worker-process stack (reference
magicdrivedit/datasets/dataloader.py:27-136). On TPU the input pipeline is pure host
work (JPEG decode, homographies, rasterization) that must overlap with device steps;
a thread pool is the right shape because numpy/PIL release the GIL in the hot parts
and we avoid worker-process pickling of large arrays.

`prepare_dataloader` mirrors the reference's sampler selection: BucketSampler for
multi-res datasets, StatefulSampler otherwise. Batches from the bucket sampler are
lists of "idx-H-W-fps-T" string indices; items are collated with `collate_clips`.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

from .collate import collate_clips
from .sampler import BucketSampler, StatefulSampler

__all__ = ["DataLoader", "prepare_dataloader"]

_STOP = object()


class DataLoader:
    def __init__(self, dataset, batch_sampler, collate_fn: Callable = collate_clips,
                 num_workers: int = 2, prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.batch_sampler)

    def _produce(self, out_q: "queue.Queue", stop: threading.Event):
        try:
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending = []
                for batch_indices in self.batch_sampler:
                    if stop.is_set():
                        return
                    fut = pool.submit(self._load_batch, batch_indices)
                    pending.append(fut)
                    while len(pending) >= self.prefetch:
                        out_q.put(pending.pop(0).result())
                for fut in pending:
                    out_q.put(fut.result())
        except Exception as e:  # surface loader errors to the consumer
            out_q.put(e)
        finally:
            out_q.put(_STOP)

    def _load_batch(self, batch_indices) -> Dict[str, Any]:
        items = [self.dataset[i] for i in batch_indices]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        producer = threading.Thread(target=self._produce, args=(out_q, stop),
                                    daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is _STOP:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prepare_dataloader(dataset, *, bucket_config: Optional[Dict[str, int]] = None,
                       batch_size: int = 1, num_replicas: int = 1, rank: int = 0,
                       shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                       num_workers: int = 2, prefetch: int = 2,
                       collate_fn: Callable = collate_clips):
    """Build (loader, sampler). Bucketed path when the dataset exposes
    `as_buckets()` (multi-res), plain stateful sampling otherwise."""
    if hasattr(dataset, "as_buckets") and bucket_config is not None:
        sampler = BucketSampler(dataset.as_buckets(), bucket_config,
                                num_replicas=num_replicas, rank=rank,
                                shuffle=shuffle, seed=seed, drop_last=drop_last)
        loader = DataLoader(dataset, sampler, collate_fn=collate_fn,
                            num_workers=num_workers, prefetch=prefetch)
        return loader, sampler

    sampler = StatefulSampler(len(dataset), num_replicas=num_replicas, rank=rank,
                              shuffle=shuffle, seed=seed, drop_last=drop_last)

    class _Batches:
        def __iter__(self_inner):
            batch = []
            for idx in sampler:
                batch.append(idx)
                if len(batch) == batch_size:
                    yield batch
                    batch = []
            if batch and not drop_last:
                yield batch

        def __len__(self_inner):
            n = len(sampler)
            return n // batch_size if drop_last else -(-n // batch_size)

    loader = DataLoader(dataset, _Batches(), collate_fn=collate_fn,
                        num_workers=num_workers, prefetch=prefetch)
    return loader, sampler
