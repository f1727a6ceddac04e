"""MatrixCity factory on a synthetic block_all layout (txt sparse models)."""

import math

import numpy as np
import pytest

from triangle_splatting_tpu.utils.config import dict_to_config

pytest.importorskip("PIL")


def write_sparse_txt(root, n_views, prefix, res=32):
    from PIL import Image
    sparse = root / "sparse"
    sparse.mkdir(parents=True)
    (sparse / "cameras.txt").write_text(
        "# Camera list\n"
        f"1 PINHOLE {res} {res} {res / 2} {res / 2} {res / 2} {res / 2}\n")
    lines = ["# Image list"]
    rng = np.random.default_rng(0)
    (root / "input").mkdir()
    for i in range(n_views):
        # identity rotation quats, spread translations
        tx = float(i)
        name = f"{prefix}_{i:04d}.png"
        lines.append(f"{i + 1} 1 0 0 0 {tx} 0.0 4.0 1 {name}")
        lines.append("")  # empty 2D-points line
        img = (rng.uniform(size=(res, res, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "input" / name)
    (sparse / "images.txt").write_text("\n".join(lines) + "\n")


@pytest.fixture()
def city(tmp_path):
    write_sparse_txt(tmp_path / "train" / "block_all", 6, "train")
    write_sparse_txt(tmp_path / "test" / "block_all_test", 2, "test")
    # tiny point cloud
    from triangle_splatting_tpu.models.point_cloud import PointCloud
    rng = np.random.default_rng(1)
    PointCloud(rng.normal(size=(50, 3)).astype(np.float32),
               rng.uniform(size=(50, 3)).astype(np.float32)).storePly(
        tmp_path / "pcd.ply")
    return tmp_path


class TestMatrixCity:
    def test_splits_and_cameras(self, city):
        from triangle_splatting_tpu.datasets.matrix_city import \
            MatrixCityDatasetFactory
        cfg = dict_to_config({
            "local_dir": str(city), "background": "white",
            "use_alpha_mask": False, "num_workers": 1,
            "pcd_path": "pcd.ply", "hold_test_set": True})
        factory = MatrixCityDatasetFactory(cfg)
        assert factory.getTrainDatasetSize() == 6
        assert factory.getTestDatasetSize() == 2

        # omitting hold_test_set merges test into train, like the reference
        # (Colmap_dataset.py:131-133)
        cfg2 = dict_to_config({
            "local_dir": str(city), "background": "white",
            "use_alpha_mask": False, "num_workers": 1,
            "pcd_path": "pcd.ply"})
        merged = MatrixCityDatasetFactory(cfg2)
        assert merged.getTrainDatasetSize() == 8
        cam = factory.getTrainDataset()[0]
        assert cam.image_width == 32 and cam.image_height == 32
        assert abs(float(cam.tan_fovx) - 1.0) < 1e-6
        assert cam.gt_image.shape == (3, 32, 32)
        test_cam = next(factory.getTestDataset())
        assert test_cam.image_name.startswith("test_")
        pcd = factory.getPointCloud()
        assert pcd.points.shape == (50, 3)
