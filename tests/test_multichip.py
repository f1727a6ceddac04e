"""Multi-chip data parallelism on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestMultichip:
    def test_dryrun_entrypoints(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 3
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge
        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)

    def test_make_mesh_rejects_too_few_devices(self):
        """A requested mesh larger than the device pool must raise, never
        silently shrink (round-1 MULTICHIP gate ran 'multichip' on one
        chip because of exactly that truncation)."""
        from triangle_splatting_tpu.parallel.mesh import make_mesh
        with pytest.raises(RuntimeError, match="requires"):
            make_mesh(len(jax.devices()) + 1)
        # and the no-arg form uses every device
        assert make_mesh().devices.size == len(jax.devices())

    @pytest.mark.slow
    def test_trainer_dp_e2e(self, tmp_path):
        """VanillaTSTrainer with trainer.data_parallel=2: full loop on the
        virtual mesh — cameras sharded, stats accumulated, PSNR finite."""
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset

        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)
        cfg = make_smoke_config(root, tmp_path / "out", 12)
        cfg.trainer.data_parallel = 2
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        v0 = np.asarray(trainer.params.vertex).copy()
        trainer.train()
        psnr = trainer._evaluate(12)        # device-parallel eval path
        assert np.isfinite(psnr)
        assert np.abs(np.asarray(trainer.params.vertex) - v0).max() > 0
        # per-view statistics accumulated across the mesh (2 views/step)
        assert float(trainer.state.gradient_denom.sum()) > 0
        # sharded eval scores == sequential single-device eval scores
        trainer._mesh = None
        psnr_seq = trainer._evaluate(13)
        assert abs(psnr - psnr_seq) < 1e-3, (psnr, psnr_seq)

    @pytest.mark.slow
    def test_gs_trainer_dp_e2e(self, tmp_path):
        """VanillaGSTrainer with trainer.data_parallel=2 trains on the mesh."""
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_gs import VanillaGSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset

        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)
        cfg = make_smoke_config(root, tmp_path / "out", 10, model="gs",
                                densify=False)
        cfg.trainer.data_parallel = 2
        trainer = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        x0 = np.asarray(trainer.params.xyz).copy()
        trainer.train()
        psnr_dp = trainer._evaluate(10)      # device-parallel eval path
        assert np.isfinite(psnr_dp)
        assert np.abs(np.asarray(trainer.params.xyz) - x0).max() > 0
        trainer._mesh = None
        assert abs(psnr_dp - trainer._evaluate(11)) < 1e-3

    @pytest.mark.slow
    def test_scaffold_trainer_dp_e2e(self, tmp_path):
        """ScaffoldGSTrainer with trainer.data_parallel=2: anchors + MLPs
        replicated, cameras sharded, per-view anchor statistics psum-med."""
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.scaffold_gs import ScaffoldGSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset

        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)
        cfg = make_smoke_config(root, tmp_path / "out", 10, model="scaffold")
        cfg.trainer.data_parallel = 2
        trainer = ScaffoldGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        f0 = np.asarray(trainer.params.anchor_feat).copy()
        trainer.train()
        psnr_dp = trainer._evaluate(10)      # device-parallel eval path
        assert np.isfinite(psnr_dp)
        assert np.abs(np.asarray(trainer.params.anchor_feat) - f0).max() > 0
        assert float(trainer.state.anchor_denom.sum()) > 0
        trainer._mesh = None
        assert abs(psnr_dp - trainer._evaluate(11)) < 1e-3

    @pytest.mark.slow
    def test_dp_eval_batched_matches_sequential(self, tmp_path):
        """dp_layout batching in EVAL: data_parallel=16 on the 8-device mesh
        gives B=2 local views per device; the batched sharded eval must
        score every test view identically to the sequential single-device
        path (including the pad-by-repetition tail: 3 views into one
        16-slot chunk)."""
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset

        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=16, n_test=3)
        cfg = make_smoke_config(root, tmp_path / "out", 4)
        cfg.trainer.data_parallel = 16
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer.train()
        assert trainer._dp_b == 2, trainer._dp_b
        psnr_dp = trainer._evaluate(4)
        trainer._mesh = None
        psnr_seq = trainer._evaluate(5)
        assert abs(psnr_dp - psnr_seq) < 1e-3, (psnr_dp, psnr_seq)

    @pytest.mark.slow
    def test_trainer_dp_step_matches_mean_gradient(self, tmp_path):
        """One _train_step_dp over 2 cameras == Adam on the mean of the two
        per-camera gradients, with per-VIEW statistics (grad norms summed,
        contrib/radii maxed) identical to two sequential single steps."""
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset

        root = build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)
        cfg = make_smoke_config(root, tmp_path / "out", 100)
        cfg.trainer.data_parallel = 2
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(2)

        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(2)]
        settings = trainer._settings_for(cams[0])
        weights = trainer._loss_weights(1)
        lrs = trainer._lrs(1)
        background = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        C = params.capacity

        # reference: per-camera grads -> mean -> one Adam step; stats applied
        # sequentially per view (the single-device semantics)
        grads, ref_state = [], state
        for cam in cams:
            (loss, aux), (gp, gc) = jax.value_and_grad(
                lambda p, c: trainer._camera_loss(
                    settings, p, c, state, cam, background, weights, None),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((C, 2), jnp.float32))
            grads.append((gp, gc))
            vis = aux["visible_mask"] & trainer._stat_gate(np.int32(1))
            ref_state = M.update_statistics(ref_state, gc, aux["radii"],
                                            aux["contrib_sum"],
                                            aux["contrib_max"], vis)
        mean_gp = jax.tree_util.tree_map(
            lambda a, b: None if a is None else (a + b) / 2.0, *[g[0] for g in grads])
        ref_params, ref_opt = M.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.array(x), t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(background), 1)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched, None)

        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_accum),
                                   np.asarray(s2.gradient_accum),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_denom),
                                   np.asarray(s2.gradient_denom))
        np.testing.assert_allclose(np.asarray(ref_state.contrib_max),
                                   np.asarray(s2.contrib_max), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.max_radii2d),
                                   np.asarray(s2.max_radii2d))

    @pytest.mark.slow
    def test_dp_grads_match_summed_single_device(self):
        """psum-med DP gradients == sum of per-camera gradients."""
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.parallel.mesh import (make_dp_train_step,
                                                          make_mesh,
                                                          stack_cameras)
        from triangle_splatting_tpu.trainers import losses as L
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

        n_dev = 4
        cfg = M.ModelConfig(max_sh_degree=0)
        settings = RasterSettings(image_width=32, image_height=32, max_sh_degree=0)
        s = make_random_scene(64, seed=0)
        params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"],
                                             None, cfg, init_opacity=0.5)
        opt = M.AdamState.create(params)
        cams = [make_camera(32, 32, with_image=True) for _ in range(n_dev)]

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        mesh = make_mesh(n_dev)
        step = make_dp_train_step(mesh, settings, cfg, loss_fn,
                                  interpret=True, donate=False)
        lrs = {k: np.float32(0.0) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        weights = {"l1": np.float32(1.0)}
        _, _, _, loss_dp, g_c2d = step(params, opt, state,
                                       stack_cameras(cams), jnp.ones(3),
                                       lrs, weights)

        # single-device reference: sum of per-camera losses
        total = 0.0
        for cam in cams:
            pkg = M.forward(params, state, cam, jnp.ones(3), cfg, settings,
                            impl="pallas", interpret=True)
            total += float(L.l1(pkg["render"], cam.gt_image))
        assert abs(float(loss_dp) - total) < 1e-4 * max(abs(total), 1)
        assert np.isfinite(np.asarray(g_c2d)).all()

    @pytest.mark.slow
    def test_dp_step_cameras_per_device(self):
        """make_dp_train_step with cameras_per_device=2: a 2-device x
        2-views-per-device step matches the 4-view sum (loss and the psum-ed
        c2d gradient) of the B=1 4-device step."""
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.parallel.mesh import (make_dp_train_step,
                                                          make_mesh,
                                                          stack_cameras)
        from triangle_splatting_tpu.trainers import losses as L
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)

        cfg = M.ModelConfig(max_sh_degree=0)
        settings = RasterSettings(image_width=32, image_height=32,
                                  max_sh_degree=0)
        s = make_random_scene(64, seed=1)
        params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"],
                                             None, cfg, init_opacity=0.5)
        opt = M.AdamState.create(params)
        cams = [make_camera(32, 32, with_image=True) for _ in range(4)]

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        lrs = {k: np.float32(1e-3) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        weights = {"l1": np.float32(1.0)}
        batch = stack_cameras(cams)

        step4 = make_dp_train_step(make_mesh(4), settings, cfg, loss_fn,
                                   interpret=True, donate=False)
        p4, _, _, loss4, g4 = step4(params, opt, state, batch, jnp.ones(3),
                                    lrs, weights)
        step2x2 = make_dp_train_step(make_mesh(2), settings, cfg, loss_fn,
                                     interpret=True, donate=False,
                                     cameras_per_device=2)
        p2, _, _, loss2, g2 = step2x2(params, opt, state, batch, jnp.ones(3),
                                      lrs, weights)

        np.testing.assert_allclose(float(loss2), float(loss4), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g4),
                                   rtol=1e-4, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(p4),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)


@pytest.mark.slow
class TestHybridDPMP:
    """2-D mesh: camera DP x depth-sharded MP (parallel/hybrid.py)."""

    def _setup(self):
        from dataclasses import replace as dc_replace
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)
        cfg = M.ModelConfig(max_sh_degree=1)
        settings = RasterSettings(image_width=32, image_height=32,
                                  max_sh_degree=1)
        s = make_random_scene(64, seed=3)
        params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"],
                                             None, cfg, init_opacity=0.5)
        opt = M.AdamState.create(params)
        rng = np.random.default_rng(11)
        cams = [dc_replace(make_camera(32, 32, fov, with_image=True),
                           gt_image=jnp.asarray(
                               rng.random((3, 32, 32), np.float32)))
                for fov in (55.0, 65.0)]
        return M, cfg, settings, params, state, opt, cams

    def test_hybrid_step_matches_single_device(self):
        """Loss, per-view c2d-gradient statistics, and the Adam update of a
        2x2 hybrid step match the single-device camera-mean reference."""
        from triangle_splatting_tpu.parallel.hybrid import (make_hybrid_mesh,
                                                            make_hybrid_train_step)
        from triangle_splatting_tpu.parallel.mesh import stack_cameras
        from triangle_splatting_tpu.ops.rasterize import rasterize
        from triangle_splatting_tpu.trainers import losses as L
        M, cfg, settings, params, state, opt, cams = self._setup()
        C = params.capacity

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        weights = {"l1": np.float32(1.0)}
        lrs = {k: np.float32(1e-3) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        mesh = make_hybrid_mesh(2, 2)
        step = make_hybrid_train_step(mesh, settings, loss_fn,
                                      interpret=True, donate=False)
        p2, o2, s2, loss_h, slim = step(params, opt, state,
                                        stack_cameras(cams), jnp.ones(3),
                                        lrs, weights)

        # single-device reference: mean loss/grads over the two cameras,
        # same facade-level rasterize path as the hybrid step
        def cam_loss(p, c2d, cam):
            dist = jnp.linalg.norm(
                cam.camera_center[None, None, :] - p.vertex, axis=-1)
            bgd = jnp.max(jnp.where(state.alive[:, None], dist, 0.0))
            out = rasterize(p.vertex, M.get_opacity(p)[:, 0],
                            M.get_features(p), cam, settings,
                            gamma=state.gamma, background=jnp.ones(3),
                            bg_depth=bgd,
                            active_sh_degree=state.active_sh_degree,
                            center2d_offset=c2d, alive_mask=state.alive,
                            impl="pallas", interpret=True)
            return loss_fn(out, cam, p, state, weights)

        losses, gps, gcs = [], [], []
        for cam in cams:
            l, (gp, gc) = jax.value_and_grad(cam_loss, argnums=(0, 1))(
                params, jnp.zeros((C, 2), jnp.float32), cam)
            losses.append(float(l))
            gps.append(gp)
            gcs.append(gc)
        mean_gp = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *gps)
        ref_p, ref_o = M.adam_update(params, opt, mean_gp, lrs)

        assert abs(float(loss_h) - np.mean(losses)) < 1e-4
        # Adam update parity; step-1 Adam is sign(g)-like, so mask to
        # components with non-negligible reference gradient
        for a, b, g in zip(jax.tree_util.tree_leaves(ref_p),
                           jax.tree_util.tree_leaves(p2),
                           jax.tree_util.tree_leaves(mean_gp)):
            m = np.abs(np.asarray(g)) > 1e-6
            np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                       rtol=1e-4, atol=2e-5)
        # per-view statistics: gradient_accum == sum of per-view gnorms
        # (invisible triangles receive zero c2d grad, so no mask needed)
        ref_acc = sum(np.asarray(jnp.linalg.norm(gc, axis=-1)) for gc in gcs)
        got = np.asarray(s2.gradient_accum)
        # visibility-masked in the hybrid step; compare where stats recorded
        rec = np.asarray(s2.gradient_denom) > 0
        np.testing.assert_allclose(got[rec], ref_acc[rec], rtol=1e-3,
                                   atol=1e-7)

    def test_hybrid_step_trains(self):
        """A few hybrid steps reduce the loss on a fixed camera pair."""
        from triangle_splatting_tpu.parallel.hybrid import (make_hybrid_mesh,
                                                            make_hybrid_train_step)
        from triangle_splatting_tpu.parallel.mesh import stack_cameras
        from triangle_splatting_tpu.trainers import losses as L
        M, cfg, settings, params, state, opt, cams = self._setup()

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        weights = {"l1": np.float32(1.0)}
        lrs = {"vertex": np.float32(2e-3), "opacity": np.float32(0.02),
               "f_dc": np.float32(0.01), "f_rest": np.float32(1e-3),
               "affine": np.float32(0.0)}
        mesh = make_hybrid_mesh(2, 2)
        step = make_hybrid_train_step(mesh, settings, loss_fn,
                                      interpret=True, donate=False)
        batch = stack_cameras(cams)
        first = None
        for _ in range(5):
            params, opt, state, loss, _ = step(params, opt, state, batch,
                                               jnp.ones(3), lrs, weights)
            if first is None:
                first = float(loss)
        assert float(loss) < first


class TestStackDPCameras:
    def test_mixed_resolution_rejected(self):
        from triangle_splatting_tpu.parallel.mesh import stack_dp_cameras
        from triangle_splatting_tpu.utils.testing import make_camera
        cams = [make_camera(32, 32, with_image=True),
                make_camera(64, 32, with_image=True)]
        with pytest.raises(ValueError, match="same-resolution|resolution"):
            stack_dp_cameras(cams)

    def test_same_resolution_stacks(self):
        from triangle_splatting_tpu.parallel.mesh import stack_dp_cameras
        from triangle_splatting_tpu.utils.testing import make_camera
        cams = [make_camera(32, 32, with_image=True) for _ in range(3)]
        batch = stack_dp_cameras(cams)
        assert batch.gt_image.shape == (3, 3, 32, 32)
        assert batch.world_view.shape == (3, 4, 4)


@pytest.mark.slow
class TestGSScaffoldDPStepParity:
    def _dataset(self, tmp_path):
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset
        return build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)

    def test_gs_dp_step_matches_mean_gradient(self, tmp_path):
        """VanillaGS _train_step_dp == Adam on the camera-mean gradient with
        sequential per-view statistics."""
        from triangle_splatting_tpu.models import gaussian_model as G
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_gs import VanillaGSTrainer

        root = self._dataset(tmp_path)
        cfg = make_smoke_config(root, tmp_path / "out", 100, model="gs")
        trainer = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(2)
        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(2)]
        settings = trainer._settings_for(cams[0])
        weights = {"l1": np.float32(0.8), "ssim": np.float32(0.2)}
        lrs = trainer._lrs(1)
        bg = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        C = params.capacity

        grads, ref_state = [], state
        for cam in cams:
            (l, aux), (gp, gm) = jax.value_and_grad(
                lambda p, m: trainer._camera_loss(settings, p, m, state, cam,
                                                  bg, weights),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((C, 2), jnp.float32))
            grads.append(gp)
            vis = aux["visible_mask"] & trainer._stat_gate(np.int32(1))
            ref_state = G.update_statistics(ref_state, gm, aux["radii"],
                                            aux["contrib_sum"],
                                            aux["contrib_max"], vis)
        mean_gp = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
        ref_params, _ = G.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(bg), 1)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_accum),
                                   np.asarray(s2.gradient_accum),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_denom),
                                   np.asarray(s2.gradient_denom))

    def test_scaffold_dp_step_matches_mean_gradient(self, tmp_path):
        """Scaffold _train_step_dp: anchors/MLP grads psum-med to the
        camera mean; per-view anchor statistics sum exactly."""
        from triangle_splatting_tpu.models import scaffold as S
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.scaffold_gs import ScaffoldGSTrainer

        root = self._dataset(tmp_path)
        cfg = make_smoke_config(root, tmp_path / "out", 100, model="scaffold")
        trainer = ScaffoldGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(2)
        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(2)]
        settings = trainer._settings_for(cams[0])
        weights = {"l1": np.float32(0.8), "ssim": np.float32(0.2),
                   "scaling": np.float32(0.01), "opacity": np.float32(0.01)}
        lrs = trainer._lrs(60)            # inside the anchor_update window
        bg = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        N = params.capacity * trainer.model_cfg.n_offsets

        grads, ref_state = [], state
        for cam in cams:
            (l, aux), (gp, gm) = jax.value_and_grad(
                lambda p, m: trainer._camera_loss(settings, p, m, state, cam,
                                                  bg, weights),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((N, 2), jnp.float32))
            grads.append(gp)
            ref_state = S.update_statistics(
                ref_state, gm, aux["pkg"], trainer.model_cfg.n_offsets,
                gate=trainer._stat_gate(np.int32(60)))
        mean_gp = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
        ref_params, _ = S.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(bg), 60)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.offset_grad_accum),
                                   np.asarray(s2.offset_grad_accum),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.opacity_accum),
                                   np.asarray(s2.opacity_accum),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.anchor_denom),
                                   np.asarray(s2.anchor_denom))


@pytest.mark.slow
class TestDPLocalMinibatch:
    """data_parallel > mesh size: B views scan-accumulated per device.

    16 cameras over the 8-device virtual mesh (B=2) must match the
    sequential mean-gradient + per-view-statistics reference exactly."""

    def _dataset(self, tmp_path):
        from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset
        return build_synthetic_nerf_dataset(tmp_path / "data", res=48,
                                            n_tri=100, n_train=6, n_test=2)

    def test_dp_layout(self):
        from triangle_splatting_tpu.parallel.mesh import dp_layout
        assert dp_layout(16, 8) == (8, 2)
        assert dp_layout(8, 8) == (8, 1)
        assert dp_layout(3, 8) == (3, 1)
        assert dp_layout(6, 4) == (3, 2)
        assert dp_layout(4, 1) == (1, 4)   # 1-device pool: local accumulate
        # prime > devices would idle >half the pool — must fail loudly,
        # not silently serialize a "data-parallel" run onto one chip
        with pytest.raises(ValueError, match="divisor"):
            dp_layout(7, 4)
        with pytest.raises(ValueError):
            dp_layout(0, 8)

    def test_ts_dp16_on_8dev_matches_sequential(self, tmp_path):
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer

        root = self._dataset(tmp_path)
        cfg = make_smoke_config(root, tmp_path / "out", 100)
        cfg.trainer.data_parallel = 16
        trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(8)
        trainer._dp_b = 2
        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(16)]
        settings = trainer._settings_for(cams[0])
        weights = trainer._loss_weights(1)
        lrs = trainer._lrs(1)
        bg = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        C = params.capacity

        grads, ref_state, ref_loss = [], state, 0.0
        for cam in cams:
            (loss, aux), (gp, gc) = jax.value_and_grad(
                lambda p, c: trainer._camera_loss(
                    settings, p, c, state, cam, bg, weights, None),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((C, 2), jnp.float32))
            grads.append(gp)
            ref_loss += float(loss) / 16.0
            vis = aux["visible_mask"] & trainer._stat_gate(np.int32(1))
            ref_state = M.update_statistics(ref_state, gc, aux["radii"],
                                            aux["contrib_sum"],
                                            aux["contrib_max"], vis)
        mean_gp = jax.tree_util.tree_map(
            lambda *gs: None if gs[0] is None else sum(gs) / 16.0, *grads)
        ref_params, _ = M.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.array(x), t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(bg), 1)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched, None)

        assert abs(float(loss_dp) - ref_loss) < 1e-4 * max(abs(ref_loss), 1)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_accum),
                                   np.asarray(s2.gradient_accum),
                                   rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_denom),
                                   np.asarray(s2.gradient_denom))
        np.testing.assert_allclose(np.asarray(ref_state.contrib_max),
                                   np.asarray(s2.contrib_max), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.max_radii2d),
                                   np.asarray(s2.max_radii2d))

    def test_gs_dp4_on_2dev_matches_sequential(self, tmp_path):
        from triangle_splatting_tpu.models import gaussian_model as G
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.vanilla_gs import VanillaGSTrainer

        root = self._dataset(tmp_path)
        cfg = make_smoke_config(root, tmp_path / "out", 100, model="gs")
        trainer = VanillaGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(2)
        trainer._dp_b = 2
        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(4)]
        settings = trainer._settings_for(cams[0])
        weights = {"l1": np.float32(0.8), "ssim": np.float32(0.2)}
        lrs = trainer._lrs(1)
        bg = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        C = params.capacity

        grads, ref_state = [], state
        for cam in cams:
            (l, aux), (gp, gm) = jax.value_and_grad(
                lambda p, m: trainer._camera_loss(settings, p, m, state, cam,
                                                  bg, weights),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((C, 2), jnp.float32))
            grads.append(gp)
            vis = aux["visible_mask"] & trainer._stat_gate(np.int32(1))
            ref_state = G.update_statistics(ref_state, gm, aux["radii"],
                                            aux["contrib_sum"],
                                            aux["contrib_max"], vis)
        mean_gp = jax.tree_util.tree_map(lambda *gs: sum(gs) / 4.0, *grads)
        ref_params, _ = G.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(bg), 1)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_accum),
                                   np.asarray(s2.gradient_accum),
                                   rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.gradient_denom),
                                   np.asarray(s2.gradient_denom))

    def test_scaffold_dp4_on_2dev_matches_sequential(self, tmp_path):
        from triangle_splatting_tpu.models import scaffold as S
        from triangle_splatting_tpu.parallel.mesh import make_mesh, stack_cameras
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        from triangle_splatting_tpu.trainers.scaffold_gs import ScaffoldGSTrainer

        root = self._dataset(tmp_path)
        cfg = make_smoke_config(root, tmp_path / "out", 100, model="scaffold")
        trainer = ScaffoldGSTrainer(cfg, impl="oracle", log_file=False)
        trainer._init_model()
        trainer._track_stats = True
        trainer._mesh = make_mesh(2)
        trainer._dp_b = 2
        cams = [trainer.dataset.nextTrainData().strip_static()
                for _ in range(4)]
        settings = trainer._settings_for(cams[0])
        weights = {"l1": np.float32(0.8), "ssim": np.float32(0.2),
                   "scaling": np.float32(0.01), "opacity": np.float32(0.01)}
        lrs = trainer._lrs(60)
        bg = jnp.ones(3)
        params, opt, state = trainer.params, trainer.opt, trainer.state
        N = params.capacity * trainer.model_cfg.n_offsets

        grads, ref_state = [], state
        for cam in cams:
            (l, aux), (gp, gm) = jax.value_and_grad(
                lambda p, m: trainer._camera_loss(settings, p, m, state, cam,
                                                  bg, weights),
                argnums=(0, 1), has_aux=True)(
                    params, jnp.zeros((N, 2), jnp.float32))
            grads.append(gp)
            ref_state = S.update_statistics(
                ref_state, gm, aux["pkg"], trainer.model_cfg.n_offsets,
                gate=trainer._stat_gate(np.int32(60)))
        mean_gp = jax.tree_util.tree_map(lambda *gs: sum(gs) / 4.0, *grads)
        ref_params, _ = S.adam_update(params, opt, mean_gp, lrs)

        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        sched = trainer._pack.pack(weights, lrs, np.asarray(bg), 60)
        p2, o2, s2, loss_dp, slim = trainer._train_step_dp(
            settings, copy(params), copy(opt), copy(state),
            stack_cameras(cams), sched)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_state.offset_grad_accum),
                                   np.asarray(s2.offset_grad_accum),
                                   rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_state.anchor_denom),
                                   np.asarray(s2.anchor_denom))
