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
    """Iterates a map-style dataset in shuffled epochs with lookahead."""

    def __init__(self, dataset, num_workers: int = 8, prefetch: int = 16,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = max(2, prefetch)
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self._futures: "queue.Queue" = queue.Queue()
        self._order: list[int] = []
        self._pos = 0

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
            self._futures.put(self.pool.submit(self.dataset.__getitem__, i))

    def next(self) -> Camera:
        self._refill()
        item = self._futures.get().result()
        self._refill()
        return item

    def close(self):
        self.pool.shutdown(wait=False, cancel_futures=True)


class BaseDatasetFactory:
    """ABC matching the reference factory surface (Base_dataset.py:14-70)."""

    def __init__(self, config: Config = None, logger: Logger = None):
        self._config = config or Config()
        self._logger = logger or Logger("dataset", output_dir=None)
        self._train_dataset = None
        self._test_dataset = None
        self._train_loader: Optional[PrefetchLoader] = None

    # -- iteration --------------------------------------------------------
    def nextTrainData(self) -> Camera:
        if self._train_loader is None:
            workers = self._config.num_workers or 8
            self._train_loader = PrefetchLoader(self._train_dataset,
                                                num_workers=workers)
        return self._train_loader.next()

    def getTrainDataset(self):
        return self._train_dataset

    def getTestDataset(self) -> Iterator[Camera]:
        for i in range(len(self._test_dataset)):
            yield self._test_dataset[i]

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
