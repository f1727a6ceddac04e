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


class TestShippedConfigs:
    def test_reference_yaml_key_parity(self):
        """Every key tree in the reference's shipped YAMLs exists in the
        same-named YAML here (the config surface must stay byte-compatible,
        SURVEY.md §7); our only additions are the documented TPU knobs."""
        import pathlib
        import yaml

        allowed_extra = {"model.pairs_per_triangle",
                         "trainer.data_parallel", "trainer.ckpt_format",
                         "trainer.profile_start_iter",
                         "trainer.profile_end_iter"}

        def keys(d, p=""):
            out = set()
            if isinstance(d, dict):
                for k, v in d.items():
                    out.add(p + k)
                    out |= keys(v, p + k + ".")
            return out

        ref_dir = pathlib.Path("/root/reference/config")
        if not ref_dir.exists():
            import pytest
            pytest.skip("reference tree unavailable")
        ours_dir = pathlib.Path(__file__).resolve().parents[1] / "config"
        checked = 0
        for ref in sorted(ref_dir.glob("*.yaml")):
            mine = ours_dir / ref.name
            assert mine.exists(), f"missing shipped config {ref.name}"
            r = keys(yaml.safe_load(ref.read_text()))
            o = keys(yaml.safe_load(mine.read_text()))
            assert r - o == set(), (ref.name, sorted(r - o))
            assert (o - r) <= allowed_extra, (ref.name, sorted(o - r))
            checked += 1
        assert checked >= 5

    def test_shipped_yamls_parse_and_dispatch(self):
        """All shipped YAMLs load through Config and name a known trainer."""
        import pathlib
        from triangle_splatting_tpu.utils.config import loadConfig
        from triangle_splatting_tpu.trainers import TRAINER_TYPES

        ours_dir = pathlib.Path(__file__).resolve().parents[1] / "config"
        for f in sorted(ours_dir.glob("*.yaml")):
            cfg = loadConfig(f)
            assert cfg.dataset is not None and cfg.model is not None \
                and cfg.trainer is not None, f.name
            ttype = cfg.trainer.type or "VanillaTS"
            assert ttype in TRAINER_TYPES, (f.name, ttype)
