"""End-to-end: synthetic NeRF-Synthetic dataset -> trainer -> PSNR improves.

Builds a tiny Blender-style dataset on disk by rendering a known triangle
scene with the oracle, then runs the full VanillaTSTrainer loop (config ->
datasets -> model init -> jitted train steps -> eval -> PLY/ckpt IO) on the
CPU backend with the oracle rasterizer.
"""

import json
import math
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triangle_splatting_tpu.models import triangle as M
from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.utils.camera import Camera
from triangle_splatting_tpu.utils.config import dict_to_config
from triangle_splatting_tpu.utils.testing import make_random_scene

RES = 48
N_TRI = 120


def build_synthetic_dataset(root):
    from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset
    return build_synthetic_nerf_dataset(root, res=RES, n_tri=N_TRI)


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    return build_synthetic_dataset(tmp_path_factory.mktemp("lego_mini"))


def make_config(root, out_dir, iters=60):
    return dict_to_config({
        "dataset": {"type": "NerfSynthetic", "local_dir": str(root),
                    "background": "white", "use_alpha_mask": False,
                    "num_workers": 2, "pcd_path": "point_cloud.ply",
                    "hold_test_set": True},
        "model": {
            "max_sh_degree": 1,
            "rasterizer_type": "2D",
            "sampling": {"sample_method": "direct", "init_opacity": 0.3},
            "optimizer": {
                "vertex": {"v_init": 0.002, "v_final": 0.0005, "max_steps": iters},
                "opacity": {"v_init": 0.05, "v_final": 0.05, "max_steps": iters},
                "f_dc": {"v_init": 0.02, "v_final": 0.01, "max_steps": iters},
                "f_rest": {"v_init": 0.001, "v_final": 0.001, "max_steps": iters},
            },
            "model_update": {"sh_schedule": {"one_up_iters": [10]}},
        },
        "trainer": {
            "output_dir": str(out_dir), "iterations": iters,
            "initial_eval": False, "log_interval_iter": 0,
            "eval_interval_iter": 0, "histogram_interval_iter": 0,
            "save_iterations": [iters], "checkpoint_iterations": [iters],
            "train_background": "white", "eval_background": "white",
            "w_ssim": 0.2, "use_tensorboard": False, "seed": 0,
        },
    })


class TestTrainerE2E:
    def test_loss_decreases_and_io(self, synthetic_dataset, tmp_path):
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        cfg = make_config(synthetic_dataset, tmp_path / "out", iters=60)
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)

        psnr0 = None
        trainer._init_model()
        psnr0 = trainer._evaluate(0)
        trainer.train()
        psnr1 = trainer._evaluate(1)
        assert psnr1 > psnr0 + 0.5, (psnr0, psnr1)

        # artifacts written
        assert (tmp_path / "out/point_cloud/60.ply").exists()
        assert (tmp_path / "out/ckpt/60.ckpt").exists()

        # checkpoint restores cleanly and evaluates the same
        t2 = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        t2.load_ckpt(tmp_path / "out/ckpt/60.ckpt")
        psnr2 = t2._evaluate(2)
        assert abs(psnr2 - psnr1) < 1e-3

        # PLY restores with same triangle count
        t3 = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        t3.loadPLY(tmp_path / "out/point_cloud/60.ply")
        assert int(t3.state.alive.sum()) == int(trainer.state.alive.sum())


class TestStatsOutputDCE:
    """Without a ``statistic`` config block, _train_step drops the
    statistics products (radii/contrib_sum/contrib_max/visible_mask) from
    the returned aux — unconsumed jit OUTPUTS are still materialized, so
    keeping them forces the contrib owner-sort + segment reduction every
    step (PERF.md r4). Lock the DCE in by counting sorts in the lowered
    step: binning's key sort + the pack-VJP owner sort stay, the
    contrib-stats sort appears only when statistics are tracked."""

    @staticmethod
    def _step_sort_count(trainer):
        import re
        trainer._init_model()
        trainer._track_stats = (trainer._mu is not None
                                and trainer._mu.statistic is not None)
        cam = trainer.dataset.nextTrainData().strip_static()
        settings = trainer._settings_for(cam)
        sched = trainer._pack.pack(trainer._loss_weights(1),
                                   trainer._lrs(1), jnp.zeros(3), 1)
        step = type(trainer)._train_step.__wrapped__
        fn = lambda p, o, s, c, sc, ni: step(trainer, settings, p, o, s,
                                             c, sc, ni)
        txt = jax.jit(fn).lower(trainer.params, trainer.opt, trainer.state,
                                cam, sched, None).as_text()
        return len(re.findall(r'"stablehlo\.sort"', txt))

    def test_contrib_stats_dced_without_statistic_block(
            self, synthetic_dataset, tmp_path):
        from triangle_splatting_tpu.trainers import build_trainer
        cfg = make_config(synthetic_dataset, tmp_path / "o1")
        base = self._step_sort_count(
            build_trainer(cfg, log_file=False, interpret=True))
        assert base == 2, base     # binning key sort + pack-VJP owner sort

        from triangle_splatting_tpu.utils.config import dict_to_config
        cfg2 = make_config(synthetic_dataset, tmp_path / "o2")
        cfg2.model.model_update.statistic = dict_to_config(
            {"start_iter": 0, "end_iter": 1000})
        tracked = self._step_sort_count(
            build_trainer(cfg2, log_file=False, interpret=True))
        assert tracked == base + 1, (base, tracked)   # + contrib-stats sort


class TestMeshTrainerE2E:
    def test_solidify_pipeline(self, synthetic_dataset, tmp_path):
        """Mesh-config path: 3D rasterizer, STE opacity, gamma anneal,
        opacity/scale ADC, GLB export (NerfSynthetic_VanillaTS_mesh shape)."""
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        cfg = make_config(synthetic_dataset, tmp_path / "out", iters=40)
        cfg.model.rasterizer_type = "3D"
        cfg.model.ste_threshold = 0.3
        cfg.model.gamma_rescale = True
        cfg.model.max_sh_degree = 0
        cfg.model.sampling.init_opacity = 0.5
        from triangle_splatting_tpu.utils.config import dict_to_config
        cfg.model.model_update = dict_to_config({
            "statistic": {"start_iter": 0, "end_iter": 40},
            "gamma_schedule": {"start_iter": 10, "end_iter": 30,
                               "gamma_init": 1.0, "gamma_final": 50.0},
            "opacity_pruning": {"start_iter": 5, "end_iter": 40,
                                "hold_iter": 40, "interval_iter": 20,
                                "opacity_threshold_init": 0.01,
                                "opacity_threshold_final": 0.05},
            "scale_clipping": {"start_iter": 5, "end_iter": 40,
                               "hold_iter": 40, "interval_iter": 20,
                               "scale_max_init": 2.0, "scale_max_final": 1.0},
        })
        cfg.trainer.save_glb_iterations = [40]
        cfg.trainer.w_opacity_reg = dict_to_config(
            {"quad_reg": 0.01, "linear_reg": 0.01,
             "quad_start_iter": 5, "linear_start_iter": 25})
        # exercise the on-device kNN vertex regularizer (ops/knn.py)
        cfg.trainer.vertex_reg = dict_to_config(
            {"w_vertex_reg": 0.1, "start_iter": 5, "interval_iter": 10})
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer.train()
        assert float(trainer.state.gamma) > 10.0       # anneal advanced
        glb = tmp_path / "out/glb/40.glb"
        assert glb.exists()
        from triangle_splatting_tpu.models.raw_triangle import RawTriangle
        raw = RawTriangle(glb_path=glb)
        assert len(raw) > 0
        # STE export forces opacity logits to 10 (opaque mesh)
        assert np.allclose(raw.opacity, 10.0, atol=0.2)


class TestGSTrainerE2E:
    def test_contribution_pruning_null_target_actionable(
            self, synthetic_dataset, tmp_path):
        """The shipped mesh YAMLs have target_point_num: null (the
        run_experiments presets inject per-scene targets); activating
        contribution pruning without one must raise an actionable error,
        not the reference's bare TypeError (VanillaTS_model.py:499)."""
        import pytest
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        from triangle_splatting_tpu.utils.config import dict_to_config
        cfg = make_config(synthetic_dataset, tmp_path / "out", iters=10)
        cfg.model.model_update = dict_to_config({
            "statistic": {"start_iter": 0, "end_iter": 10},
            "contribution_pruning": {
                "start_iter": 0, "end_iter": 10, "interval_iter": 5,
                "min_view_count": 1, "target_point_num": None,
                "prune_ratio": 0.15, "max_prune_ratio": 0.2,
                "contrib_max_ratio": 0.1, "sparsity_retain_ratio": 0.0},
        })
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        with pytest.raises(ValueError, match="target_point_num"):
            trainer._model_update(5)

    @pytest.mark.slow
    def test_gs_loss_decreases_and_io(self, synthetic_dataset, tmp_path):
        """VanillaGS loop: init from point cloud, densify + opacity prune
        cadences fire, PSNR improves, PLY reloads (3DGS schema)."""
        from triangle_splatting_tpu.trainers.vanilla_gs import VanillaGSTrainer
        iters = 50
        cfg = dict_to_config({
            "dataset": {"type": "NerfSynthetic", "local_dir": str(synthetic_dataset),
                        "background": "white", "use_alpha_mask": False,
                        "num_workers": 2, "pcd_path": "point_cloud.ply",
                        "hold_test_set": True},
            "model": {
                "max_sh_degree": 1,
                "sampling": {"init_opacity": 0.3},
                "optimizer": {
                    "xyz": {"v_init": 0.002, "v_final": 0.0005, "max_steps": iters},
                    "scaling": {"v_init": 0.005, "v_final": 0.005, "max_steps": iters},
                    "rotation": {"v_init": 0.001, "v_final": 0.001, "max_steps": iters},
                    "opacity": {"v_init": 0.05, "v_final": 0.05, "max_steps": iters},
                    "f_dc": {"v_init": 0.02, "v_final": 0.01, "max_steps": iters},
                    "f_rest": {"v_init": 0.001, "v_final": 0.001, "max_steps": iters},
                },
                "model_update": {
                    "statistic": {"start_iter": 0, "end_iter": iters},
                    "densification": {"start_iter": 5, "end_iter": iters,
                                      "interval_iter": 20,
                                      "grad_threshold_init": 0.0002,
                                      "grad_threshold_final": 0.0002,
                                      "min_view_count": 1,
                                      "split_scale_threshold": 0.5},
                    "opacity_pruning": {"start_iter": 5, "end_iter": iters,
                                        "hold_iter": iters, "interval_iter": 25,
                                        "opacity_threshold_init": 0.01,
                                        "opacity_threshold_final": 0.01},
                },
            },
            "trainer": {
                "output_dir": str(tmp_path / "out"), "iterations": iters,
                "initial_eval": False, "log_interval_iter": 25,
                "eval_interval_iter": 0, "w_ssim": 0.2,
                "save_iterations": [iters], "checkpoint_iterations": [iters],
                "train_background": "white", "eval_background": "white",
                "use_tensorboard": False, "seed": 0,
            },
        })
        trainer = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        psnr0 = trainer._evaluate(0)
        trainer.train()
        psnr1 = trainer._evaluate(1)
        assert psnr1 > psnr0, (psnr0, psnr1)

        ply = tmp_path / "out/point_cloud/50.ply"
        assert ply.exists()
        t2 = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        t2.loadPLY(ply)
        assert int(t2.state.alive.sum()) == int(trainer.state.alive.sum())
        t3 = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        t3.load_ckpt(tmp_path / "out/ckpt/50.ckpt")
        psnr2 = t3._evaluate(2)
        assert abs(psnr2 - psnr1) < 1e-3


class TestResume:
    def test_resume_from_checkpoint(self, synthetic_dataset, tmp_path):
        """trainer.start_checkpoint resumes mid-run: Adam moments and alive
        mask restored, iteration numbering continues, training keeps
        improving (reference VanillaTS_trainer.py:197-205)."""
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        cfg = make_config(synthetic_dataset, tmp_path / "out", iters=30)
        cfg.trainer.checkpoint_iterations = [15, 30]
        cfg.trainer.save_iterations = [30]
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer.train()
        psnr_full = trainer._evaluate(30)

        cfg2 = make_config(synthetic_dataset, tmp_path / "out", iters=30)
        cfg2.trainer.checkpoint_iterations = [15, 30]
        cfg2.trainer.save_iterations = [30]
        cfg2.trainer.start_checkpoint = 15
        t2 = VanillaTSTrainer(cfg2, impl="oracle", log_file=False)
        t2.train()                       # runs iterations 16..30 only
        psnr_resumed = t2._evaluate(31)
        # moments restored -> resumed run lands in the same quality range
        assert np.isfinite(psnr_resumed)
        assert psnr_resumed > psnr_full - 2.0, (psnr_full, psnr_resumed)
        assert int(t2.state.alive.sum()) > 0

    def test_resume_from_pointcloud(self, synthetic_dataset, tmp_path):
        """trainer.start_pointcloud reloads a saved PLY (fresh moments) and
        continues training from its iteration number."""
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        cfg = make_config(synthetic_dataset, tmp_path / "out", iters=20)
        cfg.trainer.save_iterations = [10, 20]
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer.train()

        cfg2 = make_config(synthetic_dataset, tmp_path / "out", iters=20)
        cfg2.trainer.save_iterations = [10, 20]
        cfg2.trainer.start_pointcloud = 10
        t2 = VanillaTSTrainer(cfg2, impl="oracle", log_file=False)
        t2.train()
        assert np.isfinite(t2._evaluate(21))
        assert int(t2.state.alive.sum()) == int(trainer.state.alive.sum())
