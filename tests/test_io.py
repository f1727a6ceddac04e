"""Serialization: PLY / GLB / point cloud / gaussian / checkpoint formats."""

import numpy as np
import pytest

from triangle_splatting_tpu.models.point_cloud import PointCloud
from triangle_splatting_tpu.models.raw_triangle import RawTriangle
from triangle_splatting_tpu.models.raw_gaussian import RawGaussian, morton_order
from triangle_splatting_tpu.utils.gltf import read_glb, write_glb
from triangle_splatting_tpu.utils.ply import read_ply, write_ply


def make_raw(n=16, k_rest=9, seed=0):
    rng = np.random.default_rng(seed)
    return RawTriangle(
        vertex=rng.normal(size=(n, 3, 3)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        shs=rng.normal(size=(n, 3 + k_rest)).astype(np.float32))


class TestPly:
    def test_roundtrip_structured(self, tmp_path):
        rec = np.zeros(5, dtype=[("x", "f4"), ("y", "f4"), ("c", "u1")])
        rec["x"] = np.arange(5)
        rec["c"] = [0, 50, 100, 200, 255]
        write_ply(tmp_path / "t.ply", {"vertex": rec})
        back = read_ply(tmp_path / "t.ply")["vertex"]
        np.testing.assert_array_equal(back["x"], rec["x"])
        np.testing.assert_array_equal(back["c"], rec["c"])

    def test_faces(self, tmp_path):
        rec = np.zeros(6, dtype=[("x", "f4")])
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        write_ply(tmp_path / "f.ply", {"vertex": rec}, faces=faces)
        back = read_ply(tmp_path / "f.ply")
        np.testing.assert_array_equal(back["face"], faces)


class TestRawTriangle:
    def test_ply_roundtrip(self, tmp_path):
        raw = make_raw()
        raw.savePLY(tmp_path / "tri.ply", save_extra=True)
        back = RawTriangle(ply_path=tmp_path / "tri.ply")
        np.testing.assert_allclose(back.vertex, raw.vertex, rtol=1e-6)
        np.testing.assert_allclose(back.opacity, raw.opacity, rtol=1e-6)
        np.testing.assert_allclose(back.shs, raw.shs, rtol=1e-6)

    def test_ply_without_extra(self, tmp_path):
        raw = make_raw()
        raw.savePLY(tmp_path / "tri.ply", save_extra=False)
        back = RawTriangle(ply_path=tmp_path / "tri.ply")
        np.testing.assert_allclose(back.shs, raw.shs[:, :3], rtol=1e-6)

    def test_glb_roundtrip(self, tmp_path):
        raw = make_raw(k_rest=0)
        raw.saveGLB(tmp_path / "m.glb", save_back=True)
        back = RawTriangle(glb_path=tmp_path / "m.glb")
        assert len(back) == len(raw)
        np.testing.assert_allclose(back.vertex, raw.vertex, atol=1e-5)
        # opacity roundtrips through sigmoid/logit (clipped at 1e-5)
        sig = 1 / (1 + np.exp(-raw.opacity))
        sig_back = 1 / (1 + np.exp(-back.opacity))
        np.testing.assert_allclose(sig_back, np.clip(sig, 1e-5, 1 - 1e-5), atol=1e-4)

    def test_glb_colors(self, tmp_path):
        raw = make_raw(k_rest=0, seed=3)
        raw.saveGLB(tmp_path / "m.glb", save_back=False)
        verts, faces, colors = read_glb(tmp_path / "m.glb")
        assert verts.shape == (len(raw) * 3, 3)
        assert faces.shape == (len(raw), 3)
        assert colors.shape == (len(raw) * 3, 4)
        assert (colors[:, 3] >= 0).all() and (colors[:, 3] <= 1).all()

    def test_set_subtraction(self, tmp_path):
        raw = make_raw(n=10)
        sub = RawTriangle(raw.vertex[:4], raw.opacity[:4], raw.shs[:4])
        raw -= sub
        assert len(raw) == 6


class TestPointCloud:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        pc = PointCloud(rng.normal(size=(20, 3)), rng.uniform(size=(20, 3)),
                        rng.normal(size=(20, 3)))
        pc.storePly(tmp_path / "pc.ply")
        back = PointCloud().fetchPly(tmp_path / "pc.ply")
        np.testing.assert_allclose(back.points, pc.points, rtol=1e-6)
        np.testing.assert_allclose(back.colors, pc.colors, atol=1 / 255)


class TestRawGaussian:
    def test_roundtrip_3dgs_schema(self, tmp_path):
        rng = np.random.default_rng(2)
        g = RawGaussian(xyz=rng.normal(size=(12, 3)),
                        opacity=rng.normal(size=(12, 1)),
                        shs=rng.normal(size=(12, 48)),
                        scale=rng.normal(size=(12, 3)),
                        rotation=rng.normal(size=(12, 4)))
        g.savePLY(tmp_path / "g.ply")
        back = RawGaussian(ply_path=tmp_path / "g.ply")
        np.testing.assert_allclose(back.xyz, g.xyz, rtol=1e-6)
        np.testing.assert_allclose(back.shs, g.shs, rtol=1e-6)
        np.testing.assert_allclose(back.scale, g.scale, rtol=1e-6)
        np.testing.assert_allclose(back.rotation, g.rotation, rtol=1e-6)

    def test_morton_locality(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(size=(1000, 3))
        order = morton_order(xyz)
        sorted_xyz = xyz[order]
        # Z-curve neighbors should be much closer than random order on average
        d_sorted = np.linalg.norm(np.diff(sorted_xyz, axis=0), axis=1).mean()
        d_orig = np.linalg.norm(np.diff(xyz, axis=0), axis=1).mean()
        assert d_sorted < 0.5 * d_orig


class TestCheckpointFormats:
    def _blob(self):
        from triangle_splatting_tpu.models import triangle as M
        rng = np.random.default_rng(0)
        params = M.TriangleParams(
            vertex=rng.normal(size=(8, 3, 3)).astype(np.float32),
            opacity=rng.normal(size=(8, 1)).astype(np.float32),
            f_dc=rng.normal(size=(8, 1, 3)).astype(np.float32),
            f_rest=np.zeros((8, 0, 3), np.float32))
        return dict(params=params, scene_bbox=[0.0, 0.0, 1.0, 1.0],
                    state=M.TriangleState.create(8))

    @pytest.mark.parametrize("fmt", ["pickle", "orbax"])
    def test_roundtrip(self, tmp_path, fmt):
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.utils.checkpoint import (load_ckpt,
                                                             save_ckpt)
        blob = self._blob()
        path = tmp_path / "ck" / "100.ckpt"
        save_ckpt(path, blob, fmt)
        back = load_ckpt(path)
        assert isinstance(back["params"], M.TriangleParams)
        np.testing.assert_array_equal(np.asarray(back["params"].vertex),
                                      np.asarray(blob["params"].vertex))
        assert list(np.asarray(back["scene_bbox"]).reshape(-1)) == \
            [0.0, 0.0, 1.0, 1.0]
        assert np.asarray(back["state"].alive).shape == (8,)
