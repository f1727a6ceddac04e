"""Qijing tile-split geometry + mirror-backed scene info."""

import json
import math

import numpy as np

from triangle_splatting_tpu.datasets.colmap_loader import CameraInfo
from triangle_splatting_tpu.datasets.qijing import (
    QijingDatasetFactory, frustum_ground_polygon, polygon_in_bbox)
from triangle_splatting_tpu.utils.config import dict_to_config


def make_info(x, y, z=10.0, fov=math.radians(60), name="img"):
    """Straight-down camera at (x, y, z): R maps camera +z to world -z."""
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    # cam_center = R @ (-T)  =>  T = -R^T cam_center
    T = -R.T @ np.array([x, y, z])
    return CameraInfo(camera_id=0, R=R, T=T, FovY=fov, FovX=fov,
                      image_path="", image_name=name, width=64, height=64)


class TestTileGeometry:
    def test_frustum_projection_down_camera(self):
        info = make_info(0.0, 0.0, z=10.0)
        poly = frustum_ground_polygon(info, ground_z=0.0)
        # straight-down 60deg camera from height 10: half-extent = 10*tan(30)
        ext = 10 * math.tan(math.radians(30))
        np.testing.assert_allclose(np.abs(poly).max(0), [ext, ext], rtol=1e-6)
        assert polygon_in_bbox(poly, [-10, -10, 10, 10])
        assert not polygon_in_bbox(poly, [-5, -5, 5, ext - 0.01])

    def test_split_train_test_views(self, tmp_path):
        # cameras on a line: only those near the center project inside
        infos = [make_info(x, 0.0, name=f"r_{i:03d}")
                 for i, x in enumerate(np.linspace(-50, 50, 21))]
        scene = {"bbox_xyz": [-20, -20, 20, 20], "ground_z": 0.0}

        factory = QijingDatasetFactory.__new__(QijingDatasetFactory)
        factory._config = dict_to_config({"n_test": 2})
        factory._scene_info = scene
        train, test = factory._split_train_test_views(infos)
        assert len(train) + len(test) == 21
        assert len(test) == 2
        ext = 10 * math.tan(math.radians(30))
        for c in test:
            cx = (c.R @ -c.T)[0]
            assert abs(cx) < 20 - ext          # strictly inside the tile

    def test_scene_info_and_gt_via_mirror(self, tmp_path):
        remote = tmp_path / "remote" / "tile_42"
        remote.mkdir(parents=True)
        (remote / "tile_bbox.json").write_text(
            json.dumps({"bbox_xyz": [0, 0, 1, 1], "ground_z": 0.5}))
        from triangle_splatting_tpu.models.raw_gaussian import RawGaussian
        rng = np.random.default_rng(0)
        g = RawGaussian(xyz=rng.normal(size=(5, 3)).astype(np.float32),
                        opacity=np.zeros((5, 1), np.float32),
                        shs=np.zeros((5, 3), np.float32),
                        scale=np.zeros((5, 3), np.float32),
                        rotation=np.tile([1, 0, 0, 0.0], (5, 1)))
        (remote / "models_z18").mkdir()
        g.savePLY(remote / "models_z18" / "tile_42.ply")

        factory = QijingDatasetFactory.__new__(QijingDatasetFactory)
        factory._config = dict_to_config({
            "remote_dir": str(tmp_path / "remote"),
            "local_dir": str(tmp_path / "cache"), "scene_id": "tile_42"})
        info = factory.getSceneInfo()
        assert info["ground_z"] == 0.5
        factory._file_handler = factory._get_file_handler()
        gt = factory.getGTGaussian()
        assert gt is not None and len(gt) == 5
        # fetched into the local cache
        assert (tmp_path / "cache" / "tile_42" / "models_z18"
                / "tile_42.ply").exists()
