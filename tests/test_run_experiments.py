"""CLI preset wiring (reference run_experiments.py:19-111)."""

import argparse

import pytest

import run_experiments as RE


def _args(**kw):
    ns = argparse.Namespace(scenes=None, num_workers=1)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


class TestBuildJobs:
    def test_nerf_synthetic_photo(self):
        jobs = RE.build_jobs(_args(type="NerfSynthetic_VanillaTS",
                                   dataset_path="/d"))
        assert len(jobs) == 8
        scenes = [j[2] for j in jobs]
        assert scenes == RE.NERF_SYNTHETIC_SCENES
        # photo runs carry no target point count
        assert all(j[5] is None for j in jobs)
        assert jobs[0][0] == "config/NerfSynthetic_VanillaTS.yaml"

    def test_nerf_synthetic_mesh_targets(self):
        # mesh runs carry the reference's per-scene triangle targets
        # (run_experiments.py:54-58)
        jobs = RE.build_jobs(_args(type="NerfSynthetic_VanillaTS_mesh",
                                   dataset_path="/d", scenes=["lego", "ficus"]))
        assert [(j[2], j[5]) for j in jobs] == [("lego", 112_000),
                                                ("ficus", 41_000)]

    def test_mipnerf360_res_divisors(self):
        jobs = RE.build_jobs(_args(type="MipNerf360_VanillaTS",
                                   dataset_path="/d",
                                   scenes=["bicycle", "bonsai"]))
        # per-scene resolution divisors (run_experiments.py:60-66)
        assert [(j[2], j[4]) for j in jobs] == [("bicycle", 4), ("bonsai", 2)]

    def test_matrix_city_single_job(self):
        jobs = RE.build_jobs(_args(type="MatrixCity_VanillaTS_mesh",
                                   dataset_path="/d"))
        assert len(jobs) == 1 and jobs[0][3] == "matrix_city"

    def test_scene_filter(self):
        jobs = RE.build_jobs(_args(type="TanksAndBlending_VanillaTS",
                                   dataset_path="/d", scenes=["truck"]))
        assert [j[2] for j in jobs] == ["truck"]

    def test_reference_type_aliases(self):
        """The reference's short --type spellings (run_experiments.py:99-110)
        resolve through the REAL argparse path to the same presets."""
        for short, full in RE.TYPE_ALIASES.items():
            args_short = RE.parse_args(["--type", short,
                                        "--dataset_path", "/d"])
            assert args_short.type == full
            args_full = RE.parse_args(["--type", full,
                                       "--dataset_path", "/d"])
            assert RE.build_jobs(args_short) == RE.build_jobs(args_full)

    def test_unknown_type_rejected(self):
        with pytest.raises(SystemExit):
            RE.parse_args(["--type", "NotAPreset", "--dataset_path", "/d"])
