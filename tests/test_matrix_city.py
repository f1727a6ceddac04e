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


class TestMatrixCityTrainE2E:
    @pytest.mark.slow
    def test_mesh_config_trains_on_city_layout(self, city, tmp_path):
        """Scaled-down MatrixCity_VanillaTS_mesh.yaml semantics end to end:
        MatrixCity split layout -> grid-sampled init (the 20M-point recipe's
        code path, reference MatrixCity_VanillaTS_mesh.yaml:29-34) -> 3D
        rasterizer -> a few train steps -> contribution pruning fires."""
        import jax.numpy as jnp
        from triangle_splatting_tpu.trainers import build_trainer
        iters = 24
        cfg = dict_to_config({
            "dataset": {"type": "MatrixCity", "local_dir": str(city),
                        "background": "white", "use_alpha_mask": False,
                        "num_workers": 1, "pcd_path": "pcd.ply",
                        "hold_test_set": True},
            "model": {
                "max_sh_degree": 0, "rasterizer_type": "3D",
                "gamma_rescale": True, "ste_threshold": 0.3,
                "sampling": {"sample_method": "grid", "n_sample_inside": 30,
                             "init_opacity": 0.1},
                "optimizer": {
                    "vertex": {"v_init": 2e-4, "v_final": 2e-5,
                               "max_steps": iters},
                    "opacity": {"v_init": 0.025, "v_final": 0.001,
                                "max_steps": iters},
                    "f_dc": {"v_init": 0.0025, "v_final": 5e-4,
                             "max_steps": iters},
                    "f_rest": {"v_init": 2e-4, "v_final": 2e-4,
                               "max_steps": iters},
                },
                "model_update": {
                    "statistic": {"start_iter": 0, "end_iter": iters},
                    "contribution_pruning": {
                        "start_iter": 8, "end_iter": iters,
                        "interval_iter": 8, "min_view_count": 1,
                        "target_point_num": 24, "contrib_max_ratio": 0.1,
                        "prune_ratio": 0.2},
                    "gamma_schedule": {"start_iter": 4, "end_iter": 16,
                                       "gamma_init": 1.0, "gamma_final": 20.0},
                },
            },
            "trainer": {
                "type": "VanillaTS", "output_dir": str(tmp_path / "out"),
                "iterations": iters, "initial_eval": False,
                "log_interval_iter": 8, "eval_interval_iter": 0,
                "histogram_interval_iter": 0, "save_iterations": [],
                "checkpoint_iterations": [], "train_background": "white",
                "eval_background": "white", "w_ssim": 0.2,
                "use_tensorboard": False, "seed": 0,
            },
        })
        trainer = build_trainer(cfg, impl="oracle", log_file=False)
        trainer.train()
        alive = int(trainer.state.alive.sum())
        assert 0 < alive <= 30
        assert float(trainer.state.gamma) > 10.0       # anneal advanced
        assert np.isfinite(np.asarray(trainer.params.vertex)).all()


@pytest.mark.slow
class TestMillionPrimitiveCapacity:
    """Device-side MatrixCity scale arithmetic: 1M padded capacity on the
    virtual 8-device mesh (the HBM axis the model shards divide). Visible
    geometry is kept small so the interpreted blend stays fast — the test
    validates capacity/pair-budget/sharding arithmetic, not throughput."""

    def _big_scene(self, per_shard, k, visible=1024):
        rng = np.random.default_rng(7)
        n = per_shard * k
        v = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.02
        centers = rng.uniform(-0.5, 0.5, size=(n, 1, 3)).astype(np.float32)
        v = v + centers
        v[visible:, :, 2] = -5.0          # behind the camera -> culled
        v[:visible, :, 2] = 2.0
        o = rng.uniform(0.3, 0.6, size=(n,)).astype(np.float32)
        c = rng.uniform(size=(n, 3)).astype(np.float32)
        return v, o, c

    def test_depth_sharded_render_1m(self):
        import jax
        import jax.numpy as jnp
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.parallel.depth_sharded import \
            make_depth_sharded_render
        from triangle_splatting_tpu.parallel.mesh import make_mesh
        from triangle_splatting_tpu.utils.testing import make_camera

        k = 8
        per_shard = 131_072                     # 1,048,576 total
        settings = RasterSettings(image_width=32, image_height=32,
                                  pairs_per_triangle=2)
        v, o, c = self._big_scene(per_shard, k)
        cam = make_camera(32, 32)
        mesh = make_mesh(k, axis="model")
        render = make_depth_sharded_render(mesh, settings, axis="model")
        vs = jnp.asarray(v).reshape(k, per_shard, 3, 3)
        os_ = jnp.asarray(o).reshape(k, per_shard)
        cs = jnp.asarray(c).reshape(k, per_shard, 3)
        alive = jnp.ones((k, per_shard), bool)
        pkg = jax.jit(render)(vs, os_, cs, alive, cam.strip_static(),
                              jnp.ones(3), 10.0, 1.0)
        img = np.asarray(pkg["render"])
        assert img.shape == (3, 32, 32) and np.isfinite(img).all()
        assert not bool(pkg["overflow"])        # 2 pairs/tri held at 1M
        assert int(pkg["n_contrib"].max()) > 0  # visible slab composited

    def test_hybrid_train_step_1m(self):
        import jax
        import jax.numpy as jnp
        from dataclasses import replace as dc_replace
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.parallel.hybrid import (
            make_hybrid_mesh, make_hybrid_train_step)
        from triangle_splatting_tpu.parallel.mesh import stack_cameras
        from triangle_splatting_tpu.trainers import losses as L
        from triangle_splatting_tpu.utils.testing import make_camera

        k_data, k_model = 4, 2
        n = 1_048_576
        cfg = M.ModelConfig(max_sh_degree=0)
        rng = np.random.default_rng(9)
        pts = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
        pts[1024:, 2] = -5.0                    # culled bulk
        pts[:1024, 2] = 2.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        params, state = M.create_from_points(pts, cols, None, cfg,
                                             init_opacity=0.4)
        assert params.capacity >= n
        opt = M.AdamState.create(params)
        settings = RasterSettings(image_width=32, image_height=32,
                                  max_sh_degree=0, pairs_per_triangle=2)
        cams = [dc_replace(make_camera(32, 32, fov, with_image=True),
                           gt_image=jnp.asarray(
                               rng.random((3, 32, 32), np.float32)))
                for fov in (50.0, 55.0, 60.0, 65.0)]

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        mesh = make_hybrid_mesh(k_data, k_model)
        step = make_hybrid_train_step(mesh, settings, loss_fn,
                                      interpret=True, donate=False)
        lrs = {key: np.float32(1e-3) for key in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        p2, o2, s2, loss, _ = step(params, opt, state, stack_cameras(cams),
                                   jnp.ones(3), lrs, {"l1": np.float32(1.0)})
        assert np.isfinite(float(loss))
        dv = np.asarray(jnp.abs(p2.vertex - params.vertex).max())
        assert np.isfinite(dv) and dv > 0
