"""LPIPS architecture tests (random weights — metric properties only)."""

import numpy as np
import pytest

from triangle_splatting_tpu.trainers import lpips as LP


@pytest.fixture(scope="module")
def weights():
    return LP.random_weights(0)


class TestLpips:
    def test_zero_for_identical(self, weights):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(3, 64, 64)).astype(np.float32)
        d = float(LP.lpips(img, img, weights))
        assert abs(d) < 1e-6

    def test_positive_and_monotone_ish(self, weights):
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(3, 64, 64)).astype(np.float32)
        small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
        big = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
        d_small = float(LP.lpips(img, small, weights))
        d_big = float(LP.lpips(img, big, weights))
        assert 0 < d_small < d_big

    def test_batched(self, weights):
        rng = np.random.default_rng(2)
        a = rng.uniform(size=(2, 3, 32, 32)).astype(np.float32)
        b = rng.uniform(size=(2, 3, 32, 32)).astype(np.float32)
        d = np.asarray(LP.lpips(a, b, weights))
        assert d.shape == (2,)
        d0 = float(LP.lpips(a[0], b[0], weights))
        np.testing.assert_allclose(d[0], d0, rtol=1e-5)

    def test_missing_weights_raises(self, monkeypatch):
        monkeypatch.setattr(LP, "_CACHED", None)
        monkeypatch.setattr(LP, "_TRIED", False)
        monkeypatch.delenv("TS_LPIPS_WEIGHTS", raising=False)
        monkeypatch.setattr(LP, "_find_weights", lambda: None)
        with pytest.raises(FileNotFoundError):
            LP.lpips(np.zeros((3, 8, 8), np.float32),
                     np.zeros((3, 8, 8), np.float32))

    def test_weight_file_roundtrip(self, tmp_path, weights, monkeypatch):
        np.savez(tmp_path / "w.npz",
                 **{k: np.asarray(v) for k, v in weights.items()})
        monkeypatch.setattr(LP, "_CACHED", None)
        monkeypatch.setattr(LP, "_TRIED", False)
        monkeypatch.setenv("TS_LPIPS_WEIGHTS", str(tmp_path / "w.npz"))
        rng = np.random.default_rng(3)
        a = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        b = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        d1 = float(LP.lpips(a, b))
        d2 = float(LP.lpips(a, b, weights))
        np.testing.assert_allclose(d1, d2, rtol=1e-6)
        monkeypatch.setattr(LP, "_CACHED", None)
