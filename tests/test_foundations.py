"""Foundations: config semantics, schedulers, SH math, camera matrices."""

import math

import numpy as np
import pytest

from triangle_splatting_tpu.utils.config import Config, dict_to_config, loadConfig, saveConfig
from triangle_splatting_tpu.utils.scheduler import (
    exponential_scheduler, exponential_scheduler_jnp, exponential_step_scheduler, step_scheduler)
from triangle_splatting_tpu.utils.camera import (
    Camera, projection_matrix, qvec2rotmat, rotmat2qvec, world_to_view_matrix)
from triangle_splatting_tpu.ops import sh as sh_mod


class TestConfig:
    def test_missing_attr_is_none(self):
        cfg = dict_to_config({"a": 1, "nested": {"b": 2}})
        assert cfg.a == 1
        assert cfg.nested.b == 2
        assert cfg.missing is None
        assert cfg.nested.missing is None

    def test_feature_gating_pattern(self):
        cfg = dict_to_config({"model_update": {"sh_schedule": {"one_up_iters": [1, 2]}}})
        assert cfg.model_update.densification is None
        assert cfg.model_update.sh_schedule.one_up_iters == [1, 2]

    def test_yaml_roundtrip(self, tmp_path):
        cfg = dict_to_config({"x": 1.5, "l": [1, 2], "n": {"s": "hi"}})
        saveConfig(cfg, tmp_path / "c.yaml")
        cfg2 = loadConfig(tmp_path / "c.yaml")
        assert cfg2.x == 1.5 and cfg2.l == [1, 2] and cfg2.n.s == "hi"

    def test_yaml_anchors(self, tmp_path):
        (tmp_path / "a.yaml").write_text("base: &B 30\nuse: *B\n")
        cfg = loadConfig(tmp_path / "a.yaml")
        assert cfg.use == 30


class TestSchedulers:
    def test_exponential_endpoints(self):
        s = exponential_scheduler(0.00016, 0.000016, 30000)
        assert s(0) == 0.00016
        assert s(30000) == 0.000016
        # Log-linear midpoint = geometric mean.
        mid = s(15000)
        assert abs(mid - math.sqrt(0.00016 * 0.000016)) / mid < 1e-6

    def test_delay_ramp(self):
        s = exponential_scheduler(1.0, 1.0, 100, delay_steps=10, delay_mult=0.1)
        # At step 1: delay_rate = 0.1 + 0.9*sin(0.05*pi)
        expected = 0.1 + 0.9 * math.sin(0.5 * math.pi * 0.1)
        assert abs(s(1) - expected) < 1e-9
        assert abs(s(50) - 1.0) < 1e-9  # past delay

    def test_step_scheduler(self):
        s = step_scheduler([1.0, 2.0, 3.0], [10, 20])
        assert s(5) == 1.0 and s(15) == 2.0 and s(25) == 3.0

    def test_exponential_step_matches_exponential_at_stages(self):
        exp = exponential_scheduler(1.0, 50.0, 100)
        stepped = exponential_step_scheduler(1.0, 50.0, 100, n_stage=4)
        # Reference semantics (utils/scheduler.py:26-42): value for step s is
        # v_list[i] for the first boundary with s < step_list[i].
        assert abs(stepped(0) - exp(25)) < 1e-9
        assert abs(stepped(30) - exp(50)) < 1e-9
        assert abs(stepped(100) - exp(100)) < 1e-9

    def test_jnp_matches_python(self):
        py = exponential_scheduler(0.025, 0.001, 30000, delay_steps=2000, delay_mult=0.1)
        jx = exponential_scheduler_jnp(0.025, 0.001, 30000, delay_steps=2000, delay_mult=0.1)
        for step in [0, 1, 500, 2000, 15000, 29999, 30000, 40000]:
            # jnp path runs in float32 — compare with relative tolerance.
            assert abs(py(step) - float(jx(step))) < 1e-5 * py(step), step


class TestSH:
    def test_degree0_constant(self):
        import jax.numpy as jnp
        sh = np.zeros((4, 1, 3), np.float32)
        sh[:, 0, :] = 1.0
        pos = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        rgb = sh_mod.eval_sh(jnp.asarray(sh), jnp.asarray(pos), jnp.zeros(3), 0, 0)
        expected = sh_mod.SH_C0 * 1.0 + 0.5
        np.testing.assert_allclose(np.asarray(rgb), expected, rtol=1e-6)

    def test_rgb2sh_roundtrip(self):
        rgb = np.random.default_rng(1).uniform(size=(10, 3))
        np.testing.assert_allclose(sh_mod.SH2RGB(sh_mod.RGB2SH(rgb)), rgb, rtol=1e-6)

    def test_band_mask_traced_degree(self):
        m = np.asarray(sh_mod.band_mask(1, 3))
        assert m.tolist() == [1, 1, 1, 1] + [0] * 12

    def test_clamp_at_zero(self):
        import jax.numpy as jnp
        sh = np.full((1, 1, 3), -10.0, np.float32)
        rgb = sh_mod.eval_sh(jnp.asarray(sh), jnp.ones((1, 3)), jnp.zeros(3), 0, 0)
        assert float(rgb.min()) == 0.0

    def test_degree3_matches_reference_formula(self):
        """Spot-check degree-3 basis against forward.cu:9-59 polynomial."""
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        d = rng.normal(size=(5, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
        K = 16
        sh = rng.normal(size=(5, K, 3)).astype(np.float32)
        rgb = sh_mod.eval_sh(jnp.asarray(sh), jnp.asarray(d * 2.0, jnp.float32),
                             jnp.zeros(3, jnp.float32), 3, 3)
        # manual: dir = normalize(2d - 0) = d
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        C2, C3 = sh_mod.SH_C2, sh_mod.SH_C3
        basis = np.stack([
            np.full_like(x, sh_mod.SH_C0),
            -sh_mod.SH_C1 * y, sh_mod.SH_C1 * z, -sh_mod.SH_C1 * x,
            C2[0] * x * y, C2[1] * y * z, C2[2] * (2 * z * z - x * x - y * y),
            C2[3] * x * z, C2[4] * (x * x - y * y),
            C3[0] * y * (3 * x * x - y * y), C3[1] * x * y * z,
            C3[2] * y * (4 * z * z - x * x - y * y),
            C3[3] * z * (2 * z * z - 3 * x * x - 3 * y * y),
            C3[4] * x * (4 * z * z - x * x - y * y),
            C3[5] * z * (x * x - y * y), C3[6] * x * (x * x - 3 * y * y),
        ], axis=-1)
        expected = np.maximum(np.einsum("pk,pkc->pc", basis, sh) + 0.5, 0.0)
        np.testing.assert_allclose(np.asarray(rgb), expected, rtol=1e-4, atol=1e-5)


class TestCamera:
    def test_projection_matrix_matches_reference(self):
        P = projection_matrix(1.0, 1000.0, math.radians(60), math.radians(60))
        t = math.tan(math.radians(30))
        assert abs(P[0, 0] - 1 / t) < 1e-6
        assert abs(P[2, 2] - 1000 / 999) < 1e-5
        assert abs(P[2, 3] + 1000 / 999) < 1e-5
        assert P[3, 2] == 1.0

    def test_camera_center(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        R = qvec2rotmat(q)
        T = rng.normal(size=3)
        cam = Camera.create(R=R, T=T, fovx=1.0, image_width=8, image_height=8)
        # camera center satisfies W2V @ [c, 1] = [0,0,0,1]
        c = np.asarray(cam.camera_center)
        w2v = np.asarray(cam.world_view)
        np.testing.assert_allclose(w2v[:3, :3] @ c + w2v[:3, 3], 0.0, atol=1e-5)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        np.testing.assert_allclose(rotmat2qvec(qvec2rotmat(q)), q, atol=1e-10)

    def test_fovy_derived_from_aspect(self):
        cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=1.0,
                            image_width=200, image_height=100)
        assert abs(float(cam.tan_fovy) - math.tan(1.0 / 2) * 0.5) < 1e-6

    def test_pytree_flatten(self):
        import jax
        cam = Camera.create(R=np.eye(3), T=np.zeros(3), fovx=1.0,
                            image_width=8, image_height=8)
        leaves = jax.tree_util.tree_leaves(cam)
        assert len(leaves) >= 5
        cam2 = jax.tree_util.tree_map(lambda x: x, cam)
        assert cam2.image_width == 8
