"""Dataset factory base + host-side prefetching loader.

Replaces the reference's torch DataLoader machinery
(``datasets/Base_dataset.py:14-70``: batch_size=None, 10 workers,
prefetch_factor=10) with a thread-pool prefetcher: image decode/resize is
PIL/numpy (GIL-released), so threads keep the TPU fed without the process
overhead of torch DataLoader workers.
"""

from __future__ import annotations

import queue
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from ..utils.camera import Camera
from ..utils.config import Config
from ..utils.logger import Logger


class PrefetchLoader:
    """Iterates a map-style dataset in shuffled epochs with lookahead.

    ``cache_gb`` > 0 enables a device-resident item cache: each view's
    Camera (whose ``gt_image`` is already a device array, Camera.create)
    is kept after its first load, so every later epoch returns the cached
    pytree with ZERO host work and ZERO host->device transfer. The
    reference streams every image every epoch (torch DataLoader +
    pin_memory, Base_dataset.py:30-44) because PCIe makes that free; on a
    TPU — and especially through a remote-dispatch tunnel where a 3x800x800
    f32 upload is priced in hundreds of ms — re-uploading the training set
    every epoch is the difference between a 44 ms step and a 1.2 s step
    (PERF.md). Sets whose estimated footprint exceeds the budget (e.g.
    MatrixCity's 6000+ views) fall back to streaming automatically.
    """

    def __init__(self, dataset, num_workers: int = 8, prefetch: int = 16,
                 shuffle: bool = True, seed: int = 0, cache_gb: float = 4.0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = max(2, prefetch)
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self._futures: "queue.Queue" = queue.Queue()
        self._order: list[int] = []
        self._pos = 0
        self._cache_budget = int(cache_gb * (1 << 30))
        self._cache: Optional[dict] = {} if self._cache_budget > 0 else None
        self._cache_bytes = 0

    @staticmethod
    def _item_bytes(item) -> int:
        total = 0
        for leaf in (getattr(item, "gt_image", None),
                     getattr(item, "alpha_mask", None)):
            if leaf is not None:
                total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        return total

    def _maybe_cache(self, i: int, item) -> None:
        if self._cache is None:
            return
        per_view = max(self._item_bytes(item), 1)
        if per_view * len(self.dataset) > self._cache_budget:
            self._cache = None        # whole set won't fit: stream instead
            return
        if i not in self._cache:
            self._cache[i] = item
            self._cache_bytes += per_view

    def _refill(self):
        while self._futures.qsize() < self.prefetch:
            if self._pos >= len(self._order):
                idx = np.arange(len(self.dataset))
                if self.shuffle:
                    self.rng.shuffle(idx)
                self._order = idx.tolist()
                self._pos = 0
            i = self._order[self._pos]
            self._pos += 1
            if self._cache is not None and i in self._cache:
                self._futures.put((i, None))
            else:
                self._futures.put(
                    (i, self.pool.submit(self.dataset.__getitem__, i)))

    def next(self) -> Camera:
        self._refill()
        i, fut = self._futures.get()
        if fut is None and self._cache is not None and i in self._cache:
            item = self._cache[i]
        else:
            # fut can be None only for an entry enqueued as cached and then
            # invalidated by _maybe_cache dropping the cache — refetch.
            item = (fut.result() if fut is not None
                    else self.dataset[i])
            self._maybe_cache(i, item)
        self._refill()
        return item

    def close(self):
        import sys
        try:
            self.pool.shutdown(wait=False, cancel_futures=True)
        except Exception:
            # __del__-at-interpreter-shutdown path: concurrent.futures'
            # shutdown touches module globals (queue.Empty) that may
            # already be torn down. Nothing leaks — executor threads are
            # joined by its own atexit hook. During NORMAL operation a
            # shutdown failure is real news — re-raise it.
            if not sys.is_finalizing():
                raise


class BaseDatasetFactory:
    """ABC matching the reference factory surface (Base_dataset.py:14-70)."""

    def __init__(self, config: Config = None, logger: Logger = None):
        self._config = config or Config()
        self._logger = logger or Logger("dataset", output_dir=None)
        self._train_dataset = None
        self._test_dataset = None
        self._train_loader: Optional[PrefetchLoader] = None
        self._test_cache: Optional[dict] = None

    # -- iteration --------------------------------------------------------
    def nextTrainData(self) -> Camera:
        if self._train_loader is None:
            workers = self._config.num_workers or 8
            cache_gb = self._config.image_cache_gb
            if cache_gb is None:
                cache_gb = 4.0        # device-resident view cache (see above)
            self._train_loader = PrefetchLoader(self._train_dataset,
                                                num_workers=workers,
                                                cache_gb=float(cache_gb))
        return self._train_loader.next()

    def getTrainDataset(self):
        return self._train_dataset

    def getTestDataset(self) -> Iterator[Camera]:
        if self._test_cache is None:
            self._test_cache = {}
        budget = self._config.image_cache_gb
        budget = int((4.0 if budget is None else float(budget)) * (1 << 30))
        for i in range(len(self._test_dataset)):
            item = self._test_cache.get(i)
            if item is None:
                item = self._test_dataset[i]
                per_view = max(PrefetchLoader._item_bytes(item), 1)
                if per_view * len(self._test_dataset) <= budget:
                    self._test_cache[i] = item
            yield item

    def getTrainDatasetSize(self) -> int:
        return len(self._train_dataset)

    def getTestDatasetSize(self) -> int:
        return len(self._test_dataset)

    # -- scene ------------------------------------------------------------
    def getPointCloud(self):
        raise NotImplementedError

    def getSceneInfo(self) -> dict | None:
        return None

    def getGTGaussian(self):
        """Ground-truth gaussian set for Scaffold MLP distillation
        (reference Qijing_dataset.py:104-118, generalized: any dataset may
        point ``gt_gaussian_path`` at a 3DGS PLY)."""
        if getattr(self, "_gt_gaussian", None) is None:
            path = self._config.gt_gaussian_path
            if path is None:
                raise FileNotFoundError(
                    "dataset config has no gt_gaussian_path")
            from ..models.raw_gaussian import RawGaussian
            self._gt_gaussian = RawGaussian(ply_path=str(path))
        return self._gt_gaussian

    def __del__(self):
        # getattr: __init__ may raise before _train_loader is assigned.
        loader = getattr(self, "_train_loader", None)
        if loader is not None:
            loader.close()
