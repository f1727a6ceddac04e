"""Gaussian path: preprocess math, kernel parity, model ADC, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from triangle_splatting_tpu.models import gaussian_model as G
from triangle_splatting_tpu.ops.gaussian import (build_cov3d, quat_to_rotmat)
from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.ops.rasterize import rasterize_gaussian
from triangle_splatting_tpu.utils.testing import make_camera

SETTINGS = RasterSettings(image_width=64, image_height=64, max_sh_degree=0)
CAM = make_camera(64, 64)


def make_gs_scene(n=120, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 6, n)], -1).astype(np.float32)
    scale = rng.uniform(0.03, 0.15, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    rgb = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    return dict(xyz=xyz, scale=scale, rot=q, opacity=opac, rgb=rgb)


def render(scene, impl, gamma=1.0, **kw):
    return rasterize_gaussian(
        jnp.asarray(scene["xyz"]), jnp.asarray(scene["scale"]),
        jnp.asarray(scene["rot"]), jnp.asarray(scene["opacity"]), None, CAM,
        SETTINGS, gamma=gamma, background=jnp.ones(3), bg_depth=10.0,
        colors=jnp.asarray(scene["rgb"]), impl=impl, interpret=True, **kw)


class TestCov:
    def test_quat_identity(self):
        q = jnp.asarray([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(np.asarray(quat_to_rotmat(q))[0], np.eye(3),
                                   atol=1e-6)

    def test_cov3d_isotropic(self):
        cov = build_cov3d(jnp.full((1, 3), 2.0), jnp.asarray([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(np.asarray(cov)[0], 4.0 * np.eye(3),
                                   atol=1e-5)

    def test_cov3d_rotation_invariant_trace(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        s = rng.uniform(0.5, 2.0, (5, 3)).astype(np.float32)
        cov = np.asarray(build_cov3d(jnp.asarray(s), jnp.asarray(q)))
        np.testing.assert_allclose(np.trace(cov, axis1=1, axis2=2),
                                   (s ** 2).sum(1), rtol=1e-5)


class TestGSParity:
    @pytest.mark.parametrize("gamma", [1.0, 2.5])
    def test_forward(self, gamma):
        scene = make_gs_scene()
        o = render(scene, "oracle", gamma)
        p = render(scene, "pallas", gamma)
        np.testing.assert_allclose(np.asarray(p["render"]),
                                   np.asarray(o["render"]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(p["final_T"]),
                                   np.asarray(o["final_T"]), atol=1e-3)
        # last_contributor semantics (custom-gaussian forward.cu:588-589)
        np.testing.assert_array_equal(np.asarray(p["n_contrib"]),
                                      np.asarray(o["n_contrib"]))

    @pytest.mark.slow
    def test_backward(self):
        scene = make_gs_scene(seed=3)
        target = jnp.asarray(
            np.random.default_rng(5).uniform(size=(3, 64, 64)), jnp.float32)

        def loss(xyz, scale, q, opac, rgb, impl):
            out = rasterize_gaussian(xyz, scale, q, opac, None, CAM, SETTINGS,
                                     gamma=1.0, background=jnp.ones(3),
                                     bg_depth=10.0, colors=rgb, impl=impl,
                                     interpret=True)
            return jnp.abs(out["render"] - target).mean() + 0.01 * out["depth"].mean()

        args = tuple(jnp.asarray(scene[k]) for k in
                     ("xyz", "scale", "rot", "opacity", "rgb"))
        go = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, "oracle")
        gp = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, "pallas")
        for name, a, b in zip(("xyz", "scale", "rot", "opac", "rgb"), go, gp):
            ref = max(float(jnp.abs(a).max()), 1e-12)
            assert float(jnp.abs(a - b).max()) / ref < 5e-3, name
            assert np.isfinite(np.asarray(b)).all(), name


class TestGSModel:
    def test_create_and_forward(self):
        scene = make_gs_scene(64)
        cfg = G.GSModelConfig(max_sh_degree=0)
        params, state = G.create_from_points(scene["xyz"], scene["rgb"], cfg,
                                             init_opacity=0.5)
        assert int(state.alive.sum()) == 64
        pkg = G.forward(params, state, CAM, jnp.ones(3), cfg, SETTINGS,
                        impl="oracle")
        assert np.isfinite(np.asarray(pkg["render"])).all()

    def test_densify_and_prune(self):
        scene = make_gs_scene(32)
        cfg = G.GSModelConfig(max_sh_degree=0)
        params, state = G.create_from_points(scene["xyz"], scene["rgb"], cfg,
                                             init_opacity=0.5,
                                             capacity_factor=4.0)
        opt = G.GSAdamState.create(params)
        C = params.capacity
        state = replace(state,
                        gradient_accum=jnp.where(jnp.arange(C) < 16, 10.0, 0.0),
                        gradient_denom=jnp.where(state.alive, 5.0, 0.0))
        key = jax.random.PRNGKey(0)
        params, opt, state, n, overflow = G.densify(
            params, opt, state, key, np.float32(0.1), 1, np.float32(0.0))
        assert int(n) == 16 and not bool(overflow)
        assert int(state.alive.sum()) == 32 + 16  # 16 splits: +2 each, -1 orig

        params, opt, state, n = G.opacity_pruning(params, opt, state, 0.9)
        assert int(state.alive.sum()) == 0

    def test_training_improves(self):
        """Overfit a single view with the gaussian model (oracle impl)."""
        scene = make_gs_scene(96, seed=9)
        cfg = G.GSModelConfig(max_sh_degree=0)
        params, state = G.create_from_points(scene["xyz"], scene["rgb"], cfg,
                                             init_opacity=0.6)
        # target: render of the TRUE scene colors; init params use noisy rgb
        target = render(scene, "oracle")["render"]
        opt = G.GSAdamState.create(params)
        lrs = {"xyz": np.float32(2e-4), "scaling": np.float32(5e-3),
               "rotation": np.float32(1e-3), "opacity": np.float32(0.05),
               "f_dc": np.float32(0.02), "f_rest": np.float32(1e-3)}

        @jax.jit
        def step(params, opt, state):
            def loss_fn(p):
                pkg = G.forward(p, state, CAM, jnp.ones(3), cfg, SETTINGS,
                                impl="oracle")
                return jnp.abs(pkg["render"] - target).mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            params, opt = G.adam_update(params, opt, g, lrs)
            return params, opt, loss

        losses = []
        for _ in range(40):
            params, opt, loss = step(params, opt, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


class TestDeadSlotGradients:
    def test_no_nan_grads_from_dead_slots(self):
        """Dead capacity slots park at the origin == camera center in the
        default test camera; the SH view-direction normalize and the
        covariance build must keep their VJPs finite there (zero-direction
        norm backward is 0/0 without the in-sqrt eps; zero quats make
        singular covariances)."""
        import jax
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import make_camera

        rng = np.random.default_rng(5)
        n, cap = 30, 64
        cfg = G.GSModelConfig(max_sh_degree=1)
        params, state = G.create_from_points(
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32), cfg, capacity=cap)
        cam = make_camera(64, 64)
        settings = RasterSettings(image_width=64, image_height=64,
                                  max_sh_degree=1)

        def loss(p):
            return G.forward(p, state, cam, jnp.zeros(3), cfg, settings,
                             impl="oracle")["render"].mean()

        g = jax.grad(loss)(params)
        for name in ("xyz", "scaling", "rotation", "opacity", "f_dc",
                     "f_rest"):
            assert np.isfinite(np.asarray(getattr(g, name))).all(), name


@pytest.mark.slow
class TestGSEarlyTermination:
    """Kill-entry semantics deep in the pair list: the entry that would push
    T below 1e-4 is NOT composited and ends the pixel (custom-gaussian
    forward.cu:568-573). The kernel must carry the done flag across its
    128-pair slabs — without it, small-alpha entries in LATER slabs
    resurrect the pixel and n_contrib/backward misindex."""

    def _overdraw_scene(self, n=360, kill_at=250):
        rng = np.random.default_rng(7)
        xyz = np.stack([rng.uniform(-0.05, 0.05, n),
                        rng.uniform(-0.05, 0.05, n),
                        np.linspace(3.0, 6.0, n)], -1).astype(np.float32)
        scale = np.full((n, 3), 0.4, np.float32)   # covers the center tiles
        q = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        opac = np.full(n, 0.03, np.float32)        # slow decay: ~5e-4 at 250
        opac[kill_at] = 0.97                       # the killer
        rgb = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
        return dict(xyz=xyz, scale=scale, rot=q, opacity=opac, rgb=rgb)

    def test_cross_slab_kill_parity(self):
        scene = self._overdraw_scene()
        o = render(scene, "oracle")
        p = render(scene, "pallas")
        nc = np.asarray(o["n_contrib"])
        # the kill really fires at the center, past the first 128-pair slab
        # (peripheral pixels see weak falloffs and legitimately never kill)
        assert 128 < nc[32, 32] < len(scene["opacity"]), nc[32, 32]
        np.testing.assert_array_equal(np.asarray(p["n_contrib"]), nc)
        np.testing.assert_allclose(np.asarray(p["final_T"]),
                                   np.asarray(o["final_T"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p["render"]),
                                   np.asarray(o["render"]), atol=1e-3)

    def test_cross_slab_kill_backward_parity(self):
        scene = self._overdraw_scene()
        target = jnp.asarray(
            np.random.default_rng(5).uniform(size=(3, 64, 64)), jnp.float32)

        def loss(xyz, scale, q, opac, rgb, impl):
            out = rasterize_gaussian(xyz, scale, q, opac, None, CAM, SETTINGS,
                                     gamma=1.0, background=jnp.ones(3),
                                     bg_depth=10.0, colors=rgb, impl=impl,
                                     interpret=True)
            return jnp.abs(out["render"] - target).mean()

        args = tuple(jnp.asarray(scene[k]) for k in
                     ("xyz", "scale", "rot", "opacity", "rgb"))
        go = jax.grad(loss, argnums=(0, 3, 4))(*args, "oracle")
        gp = jax.grad(loss, argnums=(0, 3, 4))(*args, "pallas")
        for name, a, b in zip(("xyz", "opac", "rgb"), go, gp):
            ref = max(float(jnp.abs(a).max()), 1e-12)
            assert float(jnp.abs(a - b).max()) / ref < 5e-3, name
            assert np.isfinite(np.asarray(b)).all(), name


class TestGSADCStages:
    """The four ADC stages the reference GS model also runs
    (VanillaGS_model.py:358-464, model_update:504-513)."""

    def _model(self, n=32):
        scene = make_gs_scene(n)
        cfg = G.GSModelConfig(max_sh_degree=0)
        params, state = G.create_from_points(scene["xyz"], scene["rgb"], cfg,
                                             init_opacity=0.5,
                                             capacity_factor=2.0)
        return params, state, G.GSAdamState.create(params)

    def test_opacity_clipping(self):
        params, state, opt = self._model()
        params, opt, state, n = G.opacity_clipping(params, opt, state, 0.4)
        assert int(n) == 32                      # all at sigmoid 0.5 > 0.4
        alive = np.asarray(state.alive)
        np.testing.assert_allclose(
            np.asarray(params.opacity)[alive], 10.0)

    def test_scale_pruning_by_radii_and_scale(self):
        params, state, opt = self._model()
        state = replace(state, max_radii2d=jnp.where(
            jnp.arange(params.capacity) < 4, 100.0, 0.0))
        params, opt, state, n = G.scale_pruning(
            params, opt, state, np.float32(50.0), np.float32(1e9))
        assert int(n) == 4
        assert int(state.alive.sum()) == 28

    def test_scale_clipping(self):
        params, state, opt = self._model()
        big = jnp.where(jnp.arange(params.capacity)[:, None] < 5,
                        jnp.log(2.0), params.scaling)
        params = replace(params, scaling=big)
        expected = int((np.asarray(params.scaling).max(1) > np.log(1.0))
                       [np.asarray(state.alive)].sum())
        params, opt, state, n = G.scale_clipping(params, opt, state, 1.0)
        assert int(n) == expected and expected >= 5
        assert float(np.asarray(G.get_scaling(params))[
            np.asarray(state.alive)].max()) <= 1.0 + 1e-5

    def test_contribution_pruning(self):
        params, state, opt = self._model()
        C = params.capacity
        contrib = jnp.where(state.alive,
                            jnp.arange(C, dtype=jnp.float32) + 1.0, 0.0)
        state = replace(state, contrib_sum=contrib, contrib_max=contrib,
                        contrib_denom=jnp.where(state.alive, 5.0, 0.0))
        params, opt, state, n = G.contribution_pruning(
            params, opt, state, min_view_count=np.int32(1),
            target_point_num=np.int32(16), prune_ratio=np.float32(1.0),
            max_prune_ratio=np.float32(1.0), contrib_max_ratio=np.float32(0.5))
        assert int(n) > 0
        alive = np.asarray(state.alive)
        assert not alive[0] and not alive[1]     # lowest contributors pruned


class TestGrowCapacity:
    def test_gs_grow_restores_identity_quats(self, tmp_path):
        """Grown dead slots must keep the identity-quaternion invariant
        create_from_points establishes (zero quats make singular covs)."""
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_gs import VanillaGSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset
        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=60, n_train=4, n_test=2)
        cfg = make_smoke_config(root, tmp_path / "out", 10, model="gs")
        trainer = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        old = trainer.params.capacity
        trainer._grow_capacity()
        assert trainer.params.capacity > old
        rot = np.asarray(trainer.params.rotation)
        # every grown dead row is a unit identity quaternion, not zeros
        np.testing.assert_allclose(rot[old:, 0], 1.0)
        np.testing.assert_allclose(np.linalg.norm(rot[old:], axis=1), 1.0)


class TestGSEarlyExitDrain:
    def test_all_pixels_done_in_first_slab(self):
        """With every pixel killed early, the GS kernel's new early-exit
        must still drain in-flight DMAs and zero the skipped slabs'
        pair-contrib slots (far gaussians report exactly zero contrib)."""
        n = 300
        rng = np.random.default_rng(11)
        xyz = np.stack([rng.uniform(-0.3, 0.3, n),
                        rng.uniform(-0.3, 0.3, n),
                        np.linspace(3.0, 6.0, n)], -1).astype(np.float32)
        scene = dict(
            xyz=xyz, scale=np.full((n, 3), 2.0, np.float32),  # cover image
            rot=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
            opacity=np.full(n, 0.97, np.float32),
            rgb=rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32))
        o = render(scene, "oracle")
        p = render(scene, "pallas")
        # termination happened almost immediately everywhere
        assert int(np.asarray(o["n_contrib"]).max()) < 16
        np.testing.assert_array_equal(np.asarray(p["n_contrib"]),
                                      np.asarray(o["n_contrib"]))
        np.testing.assert_allclose(np.asarray(p["render"]),
                                   np.asarray(o["render"]), atol=1e-3)
        # far gaussians (past every pixel's kill) contributed nothing
        np.testing.assert_allclose(np.asarray(p["contrib_sum"])[-100:],
                                   0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(p["contrib_sum"]),
                                   np.asarray(o["contrib_sum"]),
                                   rtol=1e-3, atol=1e-5)
