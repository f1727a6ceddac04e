"""trainers.smoke config builder (photo + mesh/solidify recipes)."""

from triangle_splatting_tpu.trainers.smoke import make_smoke_config


class TestSmokeConfig:
    def test_photo_defaults(self):
        cfg = make_smoke_config("/d", "/o", 400)
        assert cfg.model.rasterizer_type == "2D"
        assert cfg.model.ste_threshold is None
        assert cfg.model.model_update.densification is not None
        assert cfg.model.model_update.gamma_schedule is None
        assert cfg.trainer.iterations == 400

    def test_mesh_solidify(self):
        cfg = make_smoke_config("/d", "/o", 400, mesh=True)
        assert cfg.model.rasterizer_type == "3D"
        assert cfg.model.ste_threshold == 0.3
        assert cfg.model.gamma_rescale is True
        gs = cfg.model.model_update.gamma_schedule
        assert gs.gamma_init == 1.0 and gs.gamma_final == 50.0
        assert gs.start_iter == 100 and gs.end_iter == 300
        assert cfg.trainer.save_glb_iterations == [400]
        oreg = cfg.trainer.w_opacity_reg
        assert oreg.quad_start_iter == 100 and oreg.linear_start_iter == 200

    def test_no_densify(self):
        cfg = make_smoke_config("/d", "/o", 100, densify=False)
        assert cfg.model.model_update.densification is None

    def test_gs_model(self):
        cfg = make_smoke_config("/d", "/o", 200, model="gs")
        assert cfg.trainer.type == "VanillaGS"
        assert cfg.model.optimizer.xyz is not None
        assert cfg.model.optimizer.rotation is not None
        assert cfg.model.optimizer.vertex is None

    def test_gs_mesh_rejected(self):
        import pytest
        with pytest.raises(ValueError):
            make_smoke_config("/d", "/o", 200, model="gs", mesh=True)

    def test_scaffold_model(self):
        cfg = make_smoke_config("/d", "/o", 200, model="scaffold")
        assert cfg.trainer.type == "ScaffoldGS"
        assert cfg.model.optimizer.mlp_color is not None
        assert cfg.model.anchor_update is not None
        cfg2 = make_smoke_config("/d", "/o", 200, model="scaffold",
                                 densify=False)
        assert cfg2.model.anchor_update is None
