"""Data-loading samplers + prefetching loader.

Counterpart of `/root/reference/mmdet/datasets/loader/` (343 LoC):
`GroupSampler`/`DistributedGroupSampler` batch images of like aspect ratio
(sampler.py:45-150), `DistributedSampler` honours dataset-provided
video-aligned `indices_list` when `slices_set` (sampler.py:11-41), and
`build_dataloader` wires them with the collate that flattens per-item frame
lists (build_loader.py:19-56).  Here the torch DataLoader is replaced with a
thread-pool prefetcher feeding numpy batches to the jitted step.
"""
from __future__ import annotations

import math
import queue
import threading
from typing import Iterator, Optional

import numpy as np


class GroupSampler:
    """Aspect-ratio grouped sampling (reference sampler.py:45-85)."""

    def __init__(self, dataset, samples_per_gpu: int = 1, seed: int = 0):
        assert hasattr(dataset, "flag")
        self.dataset = dataset
        self.samples_per_gpu = samples_per_gpu
        self.flag = np.asarray(dataset.flag, np.int64)
        self.group_sizes = np.bincount(self.flag)
        self.num_samples = 0
        for size in self.group_sizes:
            self.num_samples += int(np.ceil(size / samples_per_gpu)) \
                * samples_per_gpu
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        indices = []
        for i, size in enumerate(self.group_sizes):
            if size == 0:
                continue
            idx = np.where(self.flag == i)[0]
            self.rng.shuffle(idx)
            extra = int(np.ceil(size / self.samples_per_gpu)
                        ) * self.samples_per_gpu - len(idx)
            idx = np.concatenate([idx, idx[:extra]])
            indices.append(idx)
        indices = np.concatenate(indices)
        batches = indices.reshape(-1, self.samples_per_gpu)
        self.rng.shuffle(batches)
        return iter(batches.reshape(-1).tolist())

    def __len__(self):
        return self.num_samples


class DistributedGroupSampler(GroupSampler):
    """Per-rank grouped sharding (reference sampler.py:87-150)."""

    def __init__(self, dataset, samples_per_gpu: int = 1, num_replicas: int = 1,
                 rank: int = 0, seed: int = 0):
        super().__init__(dataset, samples_per_gpu, seed)
        self.num_replicas = num_replicas
        self.rank = rank
        self.num_samples = int(math.ceil(
            super().__len__() / num_replicas / samples_per_gpu)) \
            * samples_per_gpu
        self.total_size = self.num_samples * num_replicas

    def __iter__(self):
        indices = list(super().__iter__())
        indices += indices[:self.total_size - len(indices)]
        offset = self.num_samples * self.rank
        return iter(indices[offset:offset + self.num_samples])

    def __len__(self):
        return self.num_samples


class DistributedSampler:
    """Video-aligned test sharding (reference sampler.py:11-41): consumes
    the dataset's per-rank `indices_list` when present."""

    def __init__(self, dataset, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = False):
        self.dataset = dataset
        self.rank = rank
        if getattr(dataset, "slices_set", False):
            self.indices = list(dataset.indices_list[rank])
        else:
            n = len(dataset)
            per = int(math.ceil(n / num_replicas))
            self.indices = list(range(rank * per, min((rank + 1) * per, n)))
        if shuffle:
            np.random.shuffle(self.indices)

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


class PrefetchLoader:
    """Thread-pool prefetcher: overlaps host decode/augment with device
    compute (the role of torch DataLoader workers)."""

    def __init__(self, sample_fn, index_iter: Iterator[int],
                 num_workers: int = 2, prefetch: int = 4):
        self.sample_fn = sample_fn
        self.indices = list(index_iter)
        self.num_workers = max(1, num_workers)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()

    def __iter__(self):
        todo = queue.Queue()
        for pos, idx in enumerate(self.indices):
            todo.put((pos, idx))
        results = {}
        lock = threading.Lock()

        def worker():
            while not self._stop.is_set():
                try:
                    pos, idx = todo.get_nowait()
                except queue.Empty:
                    return
                out = self.sample_fn(idx)
                with lock:
                    results[pos] = out

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        next_pos = 0
        import time
        while next_pos < len(self.indices):
            if next_pos in results:
                with lock:
                    out = results.pop(next_pos)
                yield out
                next_pos += 1
            else:
                time.sleep(0.001)
        self._stop.set()

    def __len__(self):
        return len(self.indices)


def build_dataloader(dataset, imgs_per_gpu: int = 1, workers_per_gpu: int = 2,
                     num_replicas: int = 1, rank: int = 0,
                     shuffle: bool = True, seed: int = 0, **kwargs):
    """reference build_loader.py:19 — returns (sampler, loader)."""
    if dataset_is_test(dataset):
        sampler = DistributedSampler(dataset, num_replicas, rank, shuffle=False)
    elif num_replicas > 1:
        sampler = DistributedGroupSampler(dataset, imgs_per_gpu, num_replicas,
                                          rank, seed)
    else:
        sampler = GroupSampler(dataset, imgs_per_gpu, seed)
    loader = PrefetchLoader(lambda i: dataset[i], iter(sampler),
                            num_workers=workers_per_gpu)
    return loader


def dataset_is_test(dataset) -> bool:
    return bool(getattr(dataset, "test_mode", False))
