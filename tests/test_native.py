"""Native C++ IO runtime vs the pure-Python parsers."""

import struct

import numpy as np
import pytest

from triangle_splatting_tpu import native
from triangle_splatting_tpu.utils.ply import read_ply, write_ply


def make_points3d_bin(path, n, rng):
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            track_len = int(rng.integers(0, 4))
            f.write(struct.pack("<qdddBBBdQ", i, *xyz[i], *rgb[i],
                                0.5 * i, track_len))
            f.write(b"\x00" * (8 * track_len))
    return xyz, rgb


def make_images_bin(path, n, rng):
    recs = []
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            q = rng.normal(size=4); q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            name = f"img_{i:04d}.png"
            npts = int(rng.integers(0, 3))
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 7))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", npts))
            f.write(b"\x00" * (24 * npts))
            recs.append((i + 1, q, t, name))
    return recs


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")


class TestNative:
    def test_points3d_matches_python(self, tmp_path, lib_available):
        rng = np.random.default_rng(0)
        xyz, rgb = make_points3d_bin(tmp_path / "points3D.bin", 50, rng)
        out = native.read_points3d_binary(tmp_path / "points3D.bin")
        assert out is not None
        nxyz, nrgb, nerr = out
        np.testing.assert_allclose(nxyz, xyz, rtol=1e-6)
        np.testing.assert_allclose(nrgb, rgb / 255.0, atol=1e-6)
        np.testing.assert_allclose(nerr, 0.5 * np.arange(50), rtol=1e-6)

    def test_images_matches_python(self, tmp_path, lib_available):
        rng = np.random.default_rng(1)
        recs = make_images_bin(tmp_path / "images.bin", 7, rng)
        out = native.read_images_binary(tmp_path / "images.bin")
        assert out is not None and len(out) == 7
        for iid, q, t, name in recs:
            nq, nt, cid, nname = out[iid]
            np.testing.assert_allclose(nq, q, rtol=1e-12)
            np.testing.assert_allclose(nt, t, rtol=1e-12)
            assert cid == 7 and nname == name

    def test_ply_fast_path(self, tmp_path, lib_available):
        rec = np.zeros(64, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                  ("red", "u1")])
        rng = np.random.default_rng(2)
        rec["x"] = rng.normal(size=64)
        rec["red"] = rng.integers(0, 255, 64)
        write_ply(tmp_path / "v.ply", {"vertex": rec})
        mat = native.read_ply_vertex_f32(tmp_path / "v.ply")
        assert mat is not None and mat.shape == (64, 4)
        np.testing.assert_allclose(mat[:, 0], rec["x"], rtol=1e-6)
        np.testing.assert_array_equal(mat[:, 3].astype(np.uint8), rec["red"])
        # and the transparent read_ply fast path returns identical records
        back = read_ply(tmp_path / "v.ply")["vertex"]
        np.testing.assert_array_equal(back["red"], rec["red"])
        np.testing.assert_allclose(back["x"], rec["x"], rtol=1e-6)

    def test_loader_integration(self, tmp_path, lib_available):
        from triangle_splatting_tpu.datasets.colmap_loader import (
            read_points3D_binary)
        rng = np.random.default_rng(3)
        xyz, rgb = make_points3d_bin(tmp_path / "p.bin", 20, rng)
        nxyz, nrgb, _ = read_points3D_binary(tmp_path / "p.bin")
        np.testing.assert_allclose(nxyz, xyz, rtol=1e-6)
