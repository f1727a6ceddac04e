"""Scaffold-GS trainer (reference trainers/ScaffoldGS_trainer.py).

One jitted train step over the functional scaffold model
(models/scaffold.py): forward + loss + grads(params, mean2d) + per-group
Adam + statistics, with jitted anchor grow/prune on the reference cadence
and the MLP-distillation pretrain loop (ScaffoldGS_trainer.py:189-264).
"""

from __future__ import annotations

import functools
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import scaffold as S
from ..models.model_utils import get_color_tensor, inverse_sigmoid_np
from ..models.raw_gaussian import RawGaussian
from ..ops.projection import RasterSettings
from ..utils.camera import Camera
from ..utils.config import Config
from ..utils.scheduler import exponential_scheduler
from ..utils.timer import Timer
from . import losses as L
from .base import BaseTrainer

LR_GROUPS = ("anchor", "anchor_feat", "mlp_offset", "mlp_opacity",
             "mlp_cov", "mlp_color", "mlp_scaling")


def _f32(x):
    return np.float32(x)


class ScaffoldGSTrainer(BaseTrainer):
    def __init__(self, config: str | Config, exp_name: str | None = None,
                 log_file: bool = True, impl: str = "pallas",
                 interpret: bool = False):
        super().__init__(config, exp_name, log_file)
        mc = self.config.model
        self.model_cfg = S.ScaffoldConfig(
            feat_dim=mc.feat_dim or 32,
            hidden_dim=mc.hidden_dim or 32,
            n_offsets=mc.n_offsets or 10,
            max_offset_scale=mc.max_offset_scale
            if mc.max_offset_scale is not None else 1.0,
            max_scaling_scale=mc.max_scaling_scale
            if mc.max_scaling_scale is not None else 1.0,
            feat_init_std=mc.feat_init_std
            if mc.feat_init_std is not None else 0.1,
            outside_boundary_ratio=mc.outside_boundary_ratio
            if mc.outside_boundary_ratio is not None else 4.0,
            update_depth=(mc.anchor_update.update_depth or 3)
            if mc.anchor_update is not None else 3,
            update_init_factor=(mc.anchor_update.update_init_factor or 16)
            if mc.anchor_update is not None else 16,
            update_hierachy_factor=(
                mc.anchor_update.update_hierachy_factor or 4)
            if mc.anchor_update is not None else 4)
        self.impl = impl
        self.interpret = interpret
        # trainer.data_parallel: N cameras/step sharded over an N-device
        # mesh (same semantics as VanillaTSTrainer._train_step_dp).
        self._dp_n = int(self.config.trainer.data_parallel or 0)
        self._dp_b = 1   # local views per device (set by dp_layout)
        self._mesh = None
        self.params = None
        self.state = None
        self.opt = None
        self.scene_bbox = None
        info = self.dataset.getSceneInfo()
        if info is not None:
            self.scene_bbox = info.get("bbox_xyz")
        self._rng = np.random.default_rng(self.seed)
        self._prng = jax.random.PRNGKey(self.seed)
        self._setup_schedulers()
        self._j_grow = jax.jit(S.grow_anchors, static_argnums=(4,))
        self._j_prune = jax.jit(S.prune_anchors)

    def _setup_schedulers(self):
        oc = self.config.model.optimizer
        self.lr_schedulers = {}
        if oc is not None:
            for name in LR_GROUPS:
                sub = getattr(oc, name)
                if sub is None and name == "anchor_feat":
                    sub = oc.ancho_feat      # reference config typo kept
                if sub is not None:
                    self.lr_schedulers[name] = exponential_scheduler(
                        **vars(sub))
        u = self.config.model.anchor_update
        self._u = u
        # Set at construction (not in train()) so direct _train_step calls
        # (tests) see it. Scaffold's anchor statistics never consume the
        # rasterizer contribution products (S.forward need_stats=False).
        self._track_stats = u is not None
        if u is not None:
            if u.start_iter is None or u.end_iter is None:
                raise ValueError(
                    "model.anchor_update requires start_iter and end_iter "
                    "(the statistics window and grow/prune cadence both "
                    "derive from them)")
            steps = u.end_iter - u.start_iter
            self.grad_threshold_scheduler = exponential_scheduler(
                v_init=u.grad_threshold_init, v_final=u.grad_threshold_final,
                max_steps=steps)
            self.opacity_threshold_scheduler = exponential_scheduler(
                v_init=u.opacity_threshold_init,
                v_final=u.opacity_threshold_final, max_steps=steps)

    def _lrs(self, iteration: int) -> dict:
        lrs = {n: _f32(fn(iteration)) for n, fn in self.lr_schedulers.items()}
        for n in LR_GROUPS:
            lrs.setdefault(n, _f32(0.0))
        return lrs

    _PACK_WEIGHT_KEYS = ("l1", "ssim", "scaling", "opacity")
    _PACK_LR_DEFAULTS = LR_GROUPS            # _lrs setdefaults them

    def _log_vec(self, state, loss, aux):
        """Per-STEP log scalars stacked on-device (one d2h fetch per log
        step): [loss, n_gaussians, num_pairs, overflow]; num_pairs is -1
        when the aux dict doesn't carry it (DP slim aux). The anchor count
        is fetched separately via _count_vec AFTER _anchor_update (see
        vanilla_ts)."""
        np_used = aux.get("num_pairs")
        return jnp.stack([
            jnp.float32(loss),
            jnp.asarray(aux["n_gaussians"], jnp.float32),
            jnp.float32(-1.0) if np_used is None
            else np_used.astype(jnp.float32),
            aux["overflow"].astype(jnp.float32)])

    @functools.partial(jax.jit, static_argnums=(0,))
    def _count_vec(self, state):
        """Post-anchor-update log scalars: [anchor_count]."""
        return state.alive.sum().astype(jnp.float32)[None]

    def _settings_for(self, camera: Camera) -> RasterSettings:
        if not hasattr(self, "_ppt"):
            self._ppt = self.config.model.pairs_per_triangle or 6
        return RasterSettings(
            image_width=camera.image_width, image_height=camera.image_height,
            max_sh_degree=0,
            # neural-gaussian losses/stats never read depth/normal
            rich_info=False,
            pairs_per_triangle=self._ppt)

    def _camera_loss(self, settings, p, m2d, state, camera, background,
                     weights):
        """Per-camera loss (ScaffoldGS_trainer.py:28-42); shared by the
        single-device and data-parallel steps."""
        k = self.model_cfg.n_offsets
        pkg = S.forward(p, state, camera, background, self.model_cfg,
                        settings, mean2d_offset=m2d,
                        scene_bbox=None, impl=self.impl,
                        interpret=self.interpret)
        img = pkg["render"]
        gt = camera.gt_image
        if camera.alpha_mask is not None:
            img = img * camera.alpha_mask
            gt = gt * camera.alpha_mask
        sel = pkg["selection_mask"]
        n_sel = jnp.maximum(sel.sum(), 1.0)
        # scaling reg over SELECTED gaussians, opacity reg over all
        # offsets of visible anchors (ScaffoldGS_trainer.py:28-42)
        scaling_reg = (pkg["scaling"]
                       * sel[..., None]).sum() / (3.0 * n_sel)
        vis = pkg["anchor_visible_mask"][:, None]
        n_vis = jnp.maximum(vis.sum() * k, 1.0)
        op = pkg["gaussian_opacity"]
        opacity_reg = ((0.25 - (op - 0.5) ** 2) * vis).sum() / n_vis
        loss = weights["l1"] * L.l1(img, gt) \
            + weights["ssim"] * L.ssim_loss(img, gt) \
            + weights["scaling"] * scaling_reg \
            + weights["opacity"] * opacity_reg
        aux = dict(pkg=dict(
            anchor_visible_mask=pkg["anchor_visible_mask"],
            gaussian_visible_mask=pkg["gaussian_visible_mask"],
            gaussian_opacity=pkg["gaussian_opacity"]),
            n_gaussians=sel.sum(), overflow=pkg["overflow"],
            num_pairs=pkg["num_pairs"])
        return loss, aux

    def _stat_gate(self, iteration):
        """anchor_update statistics window (ScaffoldGS_model.py:217-219)."""
        u = self._u
        if u is None:
            return jnp.asarray(True)
        return ((iteration > (u.start_iter or 0))
                & (iteration <= (u.end_iter or 0)))

    @functools.partial(jax.jit, static_argnums=(0, 1),
                       donate_argnums=(2, 3, 4))
    def _train_step(self, settings, params, opt, state, camera, sched):
        """``sched`` is the HostScalarPack vector — one h2d buffer per step
        instead of ~15 scalar RPCs through the remote-dispatch tunnel."""
        weights, lrs, background, iteration = self._pack.unpack(sched)
        N = params.capacity * self.model_cfg.n_offsets

        def loss_fn(p, m2d):
            return self._camera_loss(settings, p, m2d, state, camera,
                                     background, weights)

        m2d = jnp.zeros((N, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d)
        g_params, g_m2d = grads
        params, opt = S.adam_update(params, opt, g_params, lrs)
        if self._track_stats:
            state = S.update_statistics(state, g_m2d, aux["pkg"],
                                        self.model_cfg.n_offsets,
                                        gate=self._stat_gate(iteration))
        aux["log_vec"] = self._log_vec(state, loss, aux)
        return params, opt, state, loss, aux

    @functools.partial(jax.jit, static_argnums=(0, 1),
                       donate_argnums=(2, 3, 4))
    def _train_step_dp(self, settings, params, opt, state, cameras, sched):
        """Camera-batch DP step over ``self._mesh`` (same semantics as
        VanillaTSTrainer._train_step_dp, including the B-views-per-device
        scan). Scaffold's anchor-update statistics
        (ScaffoldGS_model.py:243-386 cadence inputs) are all per-view sums,
        so the reduction is a plain sum over views + psum over the mesh."""
        from ..parallel.mesh import get_shard_map
        shard_map = get_shard_map()

        weights, lrs, background, iteration = self._pack.unpack(sched)
        mesh = self._mesh
        axis = "data"
        B = self._dp_b
        n_views = mesh.shape[axis] * B
        repl, shard = jax.sharding.PartitionSpec(), \
            jax.sharding.PartitionSpec(axis)
        k = self.model_cfg.n_offsets
        N = params.capacity * k

        def per_device(params, opt, state, cameras, background, lrs, weights,
                       iteration):
            def one_view(camera):
                def loss_fn(p, m2d):
                    loss, aux = self._camera_loss(settings, p, m2d, state,
                                                  camera, background, weights)
                    return loss / n_views, aux

                m2d = jnp.zeros((N, 2), jnp.float32)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(params, m2d)
                g_params, g_m2d = grads
                pkg = aux["pkg"]
                gate = self._stat_gate(iteration)
                vis_anchor = pkg["anchor_visible_mask"] & gate
                g_vis = pkg["gaussian_visible_mask"] & gate
                max_op = jnp.max(pkg["gaussian_opacity"], axis=1)
                gnorm = S.safe_norm(
                    (g_m2d * n_views)[:, :2]).reshape(params.capacity, k)
                stat = (jnp.where(vis_anchor, max_op, 0.0),
                        vis_anchor.astype(jnp.float32),
                        jnp.where(g_vis, gnorm, 0.0),
                        g_vis.astype(jnp.float32))
                slim = (aux["n_gaussians"], aux["overflow"].astype(jnp.int32))
                return loss, g_params, stat, slim

            if B == 1:
                camera = jax.tree_util.tree_map(lambda x: x[0], cameras)
                loss, g_params, stat, slim = one_view(camera)
            else:
                def body(carry, camera):
                    loss_a, gp_a, st_a, sl_a = carry
                    loss_i, gp_i, st_i, sl_i = one_view(camera)
                    st = jax.tree_util.tree_map(jnp.add, st_a, st_i)
                    sl = (sl_a[0] + sl_i[0], jnp.maximum(sl_a[1], sl_i[1]))
                    return (loss_a + loss_i,
                            jax.tree_util.tree_map(jnp.add, gp_a, gp_i),
                            st, sl), None

                zc = jnp.zeros((params.capacity,), jnp.float32)
                zo = jnp.zeros((params.capacity, k), jnp.float32)
                init = (jnp.float32(0.0),
                        jax.tree_util.tree_map(jnp.zeros_like, params),
                        (zc, zc, zo, zo),
                        (jnp.float32(0.0), jnp.int32(0)))
                (loss, g_params, stat, slim), _ = jax.lax.scan(
                    body, init, cameras)

            g_params = jax.lax.psum(g_params, axis)
            loss = jax.lax.psum(loss, axis)
            params, opt = S.adam_update(params, opt, g_params, lrs)

            if self._track_stats:
                d_op, d_aden, d_g, d_oden = (
                    jax.lax.psum(x, axis) for x in stat)
                state = replace(
                    state,
                    opacity_accum=state.opacity_accum + d_op,
                    anchor_denom=state.anchor_denom + d_aden,
                    offset_grad_accum=state.offset_grad_accum + d_g,
                    offset_denom=state.offset_denom + d_oden)

            slim = dict(
                # mean selected count/view, comparable to single-device logs
                n_gaussians=jax.lax.psum(slim[0], axis) / n_views,
                overflow=jax.lax.pmax(slim[1], axis) > 0)
            return params, opt, state, loss, slim

        smapped = shard_map(
            per_device, mesh=mesh,
            in_specs=(repl, repl, repl, shard, repl, repl, repl, repl),
            out_specs=(repl, repl, repl, repl, repl),
            check_vma=False)
        params, opt, state, loss, slim = smapped(
            params, opt, state, cameras, background, lrs, weights, iteration)
        slim["log_vec"] = self._log_vec(state, loss, slim)
        return params, opt, state, loss, slim

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _eval_step(self, settings, params, state, camera, background):
        pkg = S.forward(params, state, camera, background, self.model_cfg,
                        settings, is_training=False, impl=self.impl,
                        interpret=self.interpret)
        img = pkg["render"]
        return img, L.psnr(img, camera.gt_image), L.ssim(
            jnp.clip(img, 0, 1), camera.gt_image)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _eval_step_dp(self, settings, params, state, cameras, background):
        """B test views per mesh device (forward-only DP; B = the incoming
        batch's local camera count, dp_layout's cameras_per_device)."""
        from ..parallel.mesh import get_shard_map
        repl = jax.sharding.PartitionSpec()
        shard = jax.sharding.PartitionSpec("data")

        def per_device(params, state, cameras, background):
            def one(_, camera):
                return None, self._eval_step.__wrapped__(
                    self, settings, params, state, camera, background)

            _, (imgs, ps, ss) = jax.lax.scan(one, None, cameras)
            return imgs, ps, ss

        smapped = get_shard_map()(
            per_device, mesh=self._mesh,
            in_specs=(repl, repl, shard, repl),
            out_specs=(shard, shard, shard), check_vma=False)
        return smapped(params, state, cameras, background)

    def _init_model(self):
        if self.params is not None:
            return
        pcd = self.dataset.getPointCloud()
        self.params, self.state = S.create_from_points(
            pcd.points, self.model_cfg,
            voxel_size=self.config.model.voxel_size
            if self.config.model.voxel_size is not None else 0.001,
            scene_bbox=self.scene_bbox, seed=self.seed,
            capacity_factor=self.config.model.capacity_factor or 4.0,
            logger=self.logger)
        self.opt = S.ScaffoldAdamState.create(self.params)
        self.logger.info(
            f"Initialized {int(self.state.alive.sum())} anchors "
            f"(capacity {self.params.capacity}, "
            f"{self.model_cfg.n_offsets} offsets each)")

    def _maintain_constraints(self, iteration: int):
        """Scheduled opacity threshold (ScaffoldGS_model.py:214-215)."""
        u = self._u
        if u is None:
            return
        thr = self.opacity_threshold_scheduler(
            iteration - (u.start_iter or 0))
        self.state = replace(self.state,
                             opacity_threshold=jnp.float32(thr))

    def _anchor_update(self, iteration: int):
        u = self._u
        if u is None:
            return
        inside = (u.start_iter or 0) < iteration <= (u.end_iter or 0)
        if not (inside and (u.interval_iter or 0) > 0
                and iteration % u.interval_iter == 0):
            return
        self._prng, key = jax.random.split(self._prng)
        thr = self.grad_threshold_scheduler(iteration - (u.start_iter or 0))
        self.params, self.opt, self.state, n_add, overflow = self._j_grow(
            self.params, self.opt, self.state, key, self.model_cfg,
            _f32(thr), _f32(u.grad_min_view_count or 0))
        if bool(overflow):
            self.logger.warning("anchor capacity full; raise capacity_factor")
        opacity_thr = self.opacity_threshold_scheduler(
            iteration - (u.start_iter or 0))
        self.params, self.opt, self.state, n_rm = self._j_prune(
            self.params, self.opt, self.state, _f32(opacity_thr),
            _f32(u.opacity_min_view_count or 0))
        self.logger.info(f"[ITER {iteration}] grad threshold: {thr:.5f}, "
                         f"added {int(n_add)} anchors, removed {int(n_rm)}")

    def train(self):
        cfgt = self.config.trainer
        self._init_model()
        if self._dp_n > 1:
            from ..parallel.mesh import dp_layout, make_mesh
            n_dev, self._dp_b = dp_layout(self._dp_n)
            self._mesh = make_mesh(n_dev)
            self.logger.info(
                f"Camera-batch data parallelism: {self._dp_n} views per "
                f"step over {n_dev} devices ({self._dp_b} per device)")
        if cfgt.initial_eval:
            self._evaluate(0)
        timer = Timer("Training")
        for iteration in range(1, (cfgt.iterations or 30000) + 1):
            timer.log("data loading")
            camera = self.dataset.nextTrainData()
            dp_cameras = None
            if self._dp_n > 1:
                dp_cameras = [camera] + [self.dataset.nextTrainData()
                                         for _ in range(self._dp_n - 1)]
            settings = self._settings_for(camera)
            camera = camera.strip_static()
            self._profile_hooks(iteration)
            timer.log("train step")
            weights = {"l1": _f32(1.0 - (cfgt.w_ssim or 0.0)),
                       "ssim": _f32(cfgt.w_ssim or 0.0),
                       "scaling": _f32(cfgt.w_scaling_reg or 0.0),
                       "opacity": _f32(cfgt.w_opacity_reg or 0.0)}
            sched = self._pack.pack(
                weights, self._lrs(iteration),
                get_color_tensor(cfgt.train_background or "black",
                                 self._rng), iteration)
            if dp_cameras is not None:
                from ..parallel.mesh import stack_dp_cameras
                batch = stack_dp_cameras(dp_cameras)
                self.params, self.opt, self.state, loss, aux = \
                    self._train_step_dp(
                        settings, self.params, self.opt, self.state, batch,
                        sched)
            else:
                self.params, self.opt, self.state, loss, aux = \
                    self._train_step(
                        settings, self.params, self.opt, self.state, camera,
                        sched)
            self._maintain_constraints(iteration)
            if cfgt.eval_interval_iter and \
                    iteration % cfgt.eval_interval_iter == 0:
                timer.log("evaluation")
                self._evaluate(iteration)
            # primitive-array length at STEP time — _anchor_update may grow
            # capacity, and num_pairs was measured against the pre-growth
            # max_pairs
            n_prim_step = self.params.capacity * self.model_cfg.n_offsets
            timer.log("statistic + anchor update")
            self._anchor_update(iteration)
            if cfgt.log_interval_iter and \
                    iteration % cfgt.log_interval_iter == 0:
                # the log-vec fetch drains every queued step — bill that
                # wait as device compute (see vanilla_ts.py)
                timer.log("device drain")
                lv = np.asarray(aux["log_vec"])
                timer.log("logging")
                # second d2h fetch: post-update [anchors] (scalar_pack.py)
                anchors = int(np.asarray(self._count_vec(self.state))[0])
                self.logger.info(
                    f"[ITER {iteration}] Loss: {lv[0]:.5f}, Anchor "
                    f"Count: {anchors}, Gaussian Count: {int(lv[1])}")
                self.logger.add_scalar("Loss", float(lv[0]), iteration)
                self.logger.add_scalar("Anchor Count", anchors, iteration)
                from .adc_utils import adapt_pair_budget
                np_used = int(lv[2])   # -1 when DP (slim aux is grow-only)
                # denominator = C * k, the primitive array length rasterize
                # sizes max_pairs against — NOT the per-view selected count
                # (which inflates per-primitive need ~(C*k)/n_sel x and
                # defeats the shrink path under heavy culling)
                # Cold-start sizing shrinks fully; hysteresis thereafter;
                # an overflow window doesn't consume the one-shot flag
                # (see vanilla_ts).
                first_sizing = (np_used >= 0
                                and not getattr(self, "_ppt_sized", False))
                if np_used >= 0 and not bool(lv[3]):
                    self._ppt_sized = True
                new_ppt = adapt_pair_budget(
                    self._ppt,
                    np_used if np_used >= 0 else None,
                    n_prim_step, bool(lv[3]),
                    shrink_if_below=1.0 if first_sizing else 0.5)
                if new_ppt != self._ppt:
                    self._ppt = new_ppt
                    self.logger.warning(
                        "pair budget re-sized: pairs_per_triangle -> "
                        f"{self._ppt} (one-time recompile)")
            if iteration in (cfgt.save_iterations or []):
                timer.log("saving")
                self.savePLY(f"{self.output_dir}/point_cloud/{iteration}.ply")
            if iteration in (cfgt.checkpoint_iterations or []):
                self.save_ckpt(f"{self.output_dir}/ckpt/{iteration}.ckpt")
            timer.stop()
        self.logger.info(timer.message())

    def _evaluate(self, iteration: int, log_name: str = ""):
        cfgt = self.config.trainer
        bg = jnp.asarray(get_color_tensor(cfgt.eval_background or "black",
                                          self._rng))
        psnrs, ssims = [], []
        test_cams = list(self.dataset.getTestDataset())
        dp_ok = (self._mesh is not None and len(test_cams) > 1 and
                 len({(c.image_width, c.image_height)
                      for c in test_cams}) == 1)
        if dp_ok:
            from ..parallel.mesh import dp_eval_scores
            for _, _, _, p, s in dp_eval_scores(
                    self._mesh, self._eval_step_dp,
                    self._settings_for(test_cams[0]), self.params,
                    self.state, test_cams, bg,
                    cameras_per_device=self._dp_b):
                psnrs.append(float(p))
                ssims.append(float(s))
            test_cams = []
        for camera in test_cams:
            settings = self._settings_for(camera)
            img, p, s = self._eval_step(settings, self.params, self.state,
                                        camera.strip_static(), bg)
            psnrs.append(float(p))
            ssims.append(float(s))
        self.logger.info(f"[ITER {iteration}] {log_name} Eval PSNR: "
                         f"{np.mean(psnrs):.3f}, SSIM: {np.mean(ssims):.3f}")
        self.logger.add_scalar(f"{log_name} Average PSNR",
                               float(np.mean(psnrs)), iteration)
        return float(np.mean(psnrs))

    # -- MLP pretraining (ScaffoldGS_trainer.py:189-264) ---------------------
    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _pretrain_step(self, params, opt, gt_pkg, alive, lrs):
        def loss_fn(p):
            raw = S.get_raw_output(p, self.model_cfg)
            m = alive.reshape((-1,) + (1,) * 2)
            n = jnp.maximum(alive.sum(), 1.0)

            def masked_l1(a, b, dims):
                return (jnp.abs(a - b) * m).sum() / (n * dims)

            k = self.model_cfg.n_offsets
            return (masked_l1(raw["g_offset"], gt_pkg["g_offset"], 3 * k)
                    + masked_l1(raw["g_opacity"], gt_pkg["g_opacity"], k)
                    + masked_l1(raw["g_cov"], gt_pkg["g_cov"], 7 * k)
                    + masked_l1(raw["g_color"], gt_pkg["g_color"], 3 * k))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = S.adam_update(params, opt, grads, lrs)
        return params, opt, loss

    def mlp_pretrain(self):
        """Distill the MLP heads onto a ground-truth gaussian set."""
        gt = self.dataset.getGTGaussian()
        voxel_size = self.config.model.voxel_size or 0.001
        pkg = S.gt_gaussian_to_gt_pkg(
            gt.xyz, gt.opacity, gt.scale, gt.rotation, gt.shs,
            voxel_size, self.model_cfg.n_offsets, logger=self.logger)

        anchor = pkg["anchor"]
        n = anchor.shape[0]
        cap = (n + 255) // 256 * 256

        def pad(x):
            return np.concatenate(
                [x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])

        rng = np.random.default_rng(self.seed)
        feat = rng.normal(0, self.model_cfg.feat_init_std,
                          (cap, self.model_cfg.feat_dim)).astype(np.float32)
        self.params = S.ScaffoldParams(
            anchor=jnp.asarray(pad(anchor)), anchor_feat=jnp.asarray(feat),
            mlps=S.init_mlps(self.model_cfg, self.seed))
        self.state = S.ScaffoldState.create(cap, self.model_cfg.n_offsets,
                                            voxel_size)
        self.state = replace(
            self.state, alive=jnp.asarray(np.arange(cap) < n),
            anchor_scaling=jnp.full((cap, 3),
                                    self.model_cfg.max_offset_scale,
                                    jnp.float32))
        self.opt = S.ScaffoldAdamState.create(self.params)

        gt_dev = {key: jnp.asarray(pad(np.asarray(val, np.float32)))
                  for key, val in pkg.items() if key.startswith("g_")}
        pc = self.config.trainer.pretrain or Config()
        self.logger.info("Pretraining started")
        for iteration in range(1, (pc.iterations or 1000) + 1):
            self.params, self.opt, loss = self._pretrain_step(
                self.params, self.opt, gt_dev, self.state.alive,
                self._lrs(iteration))
            if pc.log_interval_iter and \
                    iteration % pc.log_interval_iter == 0:
                self.logger.info(
                    f"[ITER {iteration}] Loss: {float(loss):.5f}")
                self.logger.add_scalar("Pretrain Loss", float(loss),
                                       iteration)
            if iteration in (pc.save_iterations or []):
                self.savePLY(
                    f"{self.output_dir}/point_cloud/pt_{iteration}.ply")
            if iteration in (pc.checkpoint_iterations or []):
                self.save_ckpt(f"{self.output_dir}/ckpt/pt_{iteration}.ckpt")
        self.logger.info("Pretraining finished")

    # -- IO ------------------------------------------------------------------
    def savePLY(self, path, tile_filtering: bool = True):
        dec = jax.jit(S.generate_gaussians, static_argnums=(2,))(
            self.params, self.state, self.model_cfg)
        C, k = self.params.capacity, self.model_cfg.n_offsets
        sel = np.asarray((dec["opacity"] > self.state.opacity_threshold)
                         & self.state.alive[:, None]).reshape(-1)
        xyz = np.asarray(dec["xyz"]).reshape(-1, 3)
        if tile_filtering and self.scene_bbox is not None:
            from ..models.model_utils import get_inside_mask
            sel &= np.asarray(get_inside_mask(xyz, self.scene_bbox))
        eps = 1e-10
        opacity = np.asarray(dec["opacity"]).reshape(-1, 1)[sel]
        scale = np.asarray(dec["scale"]).reshape(-1, 3)[sel]
        color = np.asarray(dec["color"]).reshape(-1, 3)[sel]
        from ..ops.sh import SH_C0
        g = RawGaussian(
            xyz=xyz[sel],
            opacity=inverse_sigmoid_np(np.clip(opacity, eps, 1 - eps)),
            shs=(color - 0.5) / SH_C0,
            scale=np.log(np.maximum(scale, eps)),
            rotation=np.asarray(dec["rot"]).reshape(-1, 4)[sel])
        self.logger.info(f"Saving {len(g)} gaussians to {path}")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        g.savePLY(path)

    def save_ckpt(self, path):
        from ..utils.checkpoint import save_ckpt
        blob = dict(
            params=jax.tree_util.tree_map(np.asarray, self.params),
            opt=jax.tree_util.tree_map(np.asarray, self.opt),
            state=jax.tree_util.tree_map(np.asarray, self.state),
            scene_bbox=self.scene_bbox)
        save_ckpt(path, blob, self.config.trainer.ckpt_format or "pickle")

    def load_ckpt(self, path):
        from ..utils.checkpoint import load_ckpt
        blob = load_ckpt(path)
        to_dev = lambda x: jnp.asarray(x)
        self.params = jax.tree_util.tree_map(to_dev, blob["params"])
        self.opt = jax.tree_util.tree_map(to_dev, blob["opt"])
        self.state = jax.tree_util.tree_map(to_dev, blob["state"])
        self.scene_bbox = blob.get("scene_bbox")
