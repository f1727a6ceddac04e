"""PrefetchLoader device-resident view cache (datasets/base.py).

The reference re-streams every image every epoch (torch DataLoader,
Base_dataset.py:30-44) — free over PCIe, ~1 s/view through a remote TPU
tunnel. The loader here caches each view's Camera pytree after first load
(bounded by an HBM budget) so later epochs do zero decode/transfer.
"""

import numpy as np
import jax.numpy as jnp

from triangle_splatting_tpu.datasets.base import (BaseDatasetFactory,
                                                  PrefetchLoader)
from triangle_splatting_tpu.utils.camera import Camera
from triangle_splatting_tpu.utils.config import Config


class CountingDataset:
    def __init__(self, n=4, res=8):
        self.n = n
        self.res = res
        self.calls = np.zeros(n, np.int64)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls[i] += 1
        img = np.full((3, self.res, self.res), i / 10.0, np.float32)
        return Camera.create(R=np.eye(3), T=np.zeros(3), fovx=1.0,
                             gt_image=img, uid=i)


class TestPrefetchCache:
    def test_second_epoch_serves_from_cache(self):
        ds = CountingDataset(n=4)
        loader = PrefetchLoader(ds, num_workers=1, prefetch=2, shuffle=False,
                                cache_gb=1.0)
        items = [loader.next() for _ in range(12)]     # 3 epochs
        loader.close()
        assert (ds.calls <= 1).all(), ds.calls          # each view loaded once
        # cached pytrees are the SAME object across epochs
        assert items[0] is items[4] is items[8]
        assert float(jnp.mean(items[1].gt_image)) == float(
            jnp.mean(items[5].gt_image))

    def test_budget_overflow_streams(self):
        ds = CountingDataset(n=4, res=8)
        # budget below one epoch's footprint -> cache disabled, all epochs load
        loader = PrefetchLoader(ds, num_workers=1, prefetch=2, shuffle=False,
                                cache_gb=4 * 3 * 8 * 8 * 4 / 2 / (1 << 30))
        for _ in range(8):
            loader.next()
        loader.close()
        assert ds.calls.sum() >= 8                      # every fetch hit disk
        assert loader._cache is None

    def test_cache_disabled_by_zero_budget(self):
        ds = CountingDataset(n=2)
        loader = PrefetchLoader(ds, num_workers=1, prefetch=2, shuffle=False,
                                cache_gb=0.0)
        for _ in range(4):
            loader.next()
        loader.close()
        assert ds.calls.sum() >= 4      # lookahead may fetch a couple extra

    def test_factory_test_split_cache(self):
        f = BaseDatasetFactory(Config())
        f._test_dataset = CountingDataset(n=3)
        a = list(f.getTestDataset())
        b = list(f.getTestDataset())
        assert (f._test_dataset.calls == 1).all()
        assert a[0] is b[0]
