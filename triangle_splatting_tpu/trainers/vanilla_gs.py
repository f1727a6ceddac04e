"""VanillaGS trainer (reference trainers/VanillaGS_trainer.py).

Structurally a sibling of VanillaTSTrainer with the gaussian model: one
jitted train step, jitted ADC cadences, PSNR/SSIM eval, 3DGS-compatible
PLY IO (raw_gaussian.py schema).
"""

from __future__ import annotations

import functools
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussian_model as G
from ..models.model_utils import get_color_tensor
from ..models.raw_gaussian import RawGaussian
from ..ops.projection import RasterSettings
from ..utils.camera import Camera
from ..utils.config import Config
from ..utils.scheduler import exponential_scheduler
from ..utils.timer import Timer
from . import losses as L
from .base import BaseTrainer


def _f32(x):
    return np.float32(x)


class VanillaGSTrainer(BaseTrainer):
    def __init__(self, config: str | Config, exp_name: str | None = None,
                 log_file: bool = True, impl: str = "pallas",
                 interpret: bool = False):
        super().__init__(config, exp_name, log_file)
        mc = self.config.model
        self.model_cfg = G.GSModelConfig(
            max_sh_degree=mc.max_sh_degree if mc.max_sh_degree is not None else 3)
        self.impl = impl
        self.interpret = interpret
        # trainer.data_parallel: N cameras/step sharded over an N-device mesh
        # (same semantics as VanillaTSTrainer._train_step_dp).
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
        self._sh_degree_host = 0
        self._setup_schedulers()
        self._j_densify = jax.jit(G.densify, static_argnums=(5, 7))
        self._j_opacity_pruning = jax.jit(G.opacity_pruning)
        self._j_opacity_reset = jax.jit(G.opacity_reset)
        self._j_opacity_clipping = jax.jit(G.opacity_clipping)
        self._j_scale_pruning = jax.jit(G.scale_pruning)
        self._j_scale_clipping = jax.jit(G.scale_clipping)
        self._j_contribution_pruning = jax.jit(
            G.contribution_pruning, static_argnames=("sparsity_retain_ratio",))

    def _setup_schedulers(self):
        oc = self.config.model.optimizer
        self.lr_schedulers = {}
        names = ("xyz", "scaling", "rotation", "opacity", "f_dc", "f_rest")
        if oc is not None:
            for name in names:
                sub = getattr(oc, name)
                if sub is not None:
                    self.lr_schedulers[name] = exponential_scheduler(**vars(sub))
        mu = self.config.model.model_update
        self._mu = mu
        # Set at construction (not in _train) so direct _train_step calls
        # (tests) and the need_stats kernel gating see it.
        self._track_stats = (mu is not None and mu.statistic is not None)
        if mu is not None and mu.densification is not None:
            d = mu.densification
            self.grad_threshold_scheduler = exponential_scheduler(
                v_init=d.grad_threshold_init, v_final=d.grad_threshold_final,
                max_steps=d.end_iter - d.start_iter)
        if mu is not None and mu.opacity_pruning is not None:
            op = mu.opacity_pruning
            self.opacity_pruning_scheduler = exponential_scheduler(
                v_init=op.opacity_threshold_init,
                v_final=op.opacity_threshold_final,
                max_steps=op.end_iter - op.start_iter)
        if mu is not None and mu.opacity_clipping is not None:
            oc = mu.opacity_clipping
            self.opacity_clipping_scheduler = exponential_scheduler(
                v_init=oc.opacity_threshold_init,
                v_final=oc.opacity_threshold_final,
                max_steps=oc.end_iter - oc.start_iter)
        if mu is not None and mu.scale_clipping is not None:
            sc = mu.scale_clipping
            self.scale_max_scheduler = exponential_scheduler(
                v_init=sc.scale_max_init, v_final=sc.scale_max_final,
                max_steps=sc.end_iter - sc.start_iter)

    def _lrs(self, iteration: int) -> dict:
        lrs = {n: _f32(fn(iteration)) for n, fn in self.lr_schedulers.items()}
        for n in ("xyz", "scaling", "rotation", "opacity", "f_dc", "f_rest"):
            lrs.setdefault(n, _f32(0.0))
        return lrs

    _PACK_WEIGHT_KEYS = ("l1", "ssim")
    _PACK_LR_DEFAULTS = ("xyz", "scaling", "rotation", "opacity", "f_dc",
                         "f_rest")          # _lrs setdefaults them

    def _settings_for(self, camera: Camera) -> RasterSettings:
        if not hasattr(self, "_ppt"):
            self._ppt = self.config.model.pairs_per_triangle or 6
        return RasterSettings(
            image_width=camera.image_width, image_height=camera.image_height,
            max_sh_degree=self.model_cfg.max_sh_degree,
            # no GS loss/stat consumes depth or normal (contrib stats come
            # from the pair-contrib stream, not rich outputs) — skip the
            # rich accumulation work in both kernels
            rich_info=False,
            pairs_per_triangle=self._ppt)

    def _camera_loss(self, settings, p, m2d, state, camera, background,
                     weights):
        """Per-camera L1+SSIM loss (VanillaGS_trainer.py); shared by the
        single-device and data-parallel steps."""
        pkg = G.forward(p, state, camera, background, self.model_cfg,
                        settings, mean2d_offset=m2d, impl=self.impl,
                        interpret=self.interpret,
                        need_stats=self._track_stats)
        img = pkg["render"]
        gt = camera.gt_image
        if camera.alpha_mask is not None:
            img = img * camera.alpha_mask
            gt = gt * camera.alpha_mask
        loss = weights["l1"] * L.l1(img, gt) \
            + weights["ssim"] * L.ssim_loss(img, gt)
        aux = dict(radii=pkg["radii"], contrib_sum=pkg["contrib_sum"],
                   contrib_max=pkg["contrib_max"],
                   visible_mask=pkg["visible_mask"],
                   overflow=pkg["overflow"], num_pairs=pkg["num_pairs"])
        return loss, aux

    def _stat_gate(self, iteration):
        """Statistic accumulation window (VanillaGS_model._training_statistic
        gates on args.start_iter < iteration <= args.end_iter)."""
        st = self._mu.statistic if self._mu is not None else None
        if st is None:
            return jnp.asarray(True)
        return (iteration > st.start_iter) & (iteration <= st.end_iter)

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
    def _train_step(self, settings, params, opt, state, camera, sched):
        """``sched`` is the HostScalarPack vector — one h2d buffer per step
        instead of ~10 scalar RPCs through the remote-dispatch tunnel."""
        weights, lrs, background, iteration = self._pack.unpack(sched)
        C = params.capacity

        def loss_fn(p, m2d):
            return self._camera_loss(settings, p, m2d, state, camera,
                                     background, weights)

        m2d = jnp.zeros((C, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(params, m2d)
        g_params, g_m2d = grads
        params, opt = G.adam_update(params, opt, g_params, lrs)
        if self._track_stats:
            state = G.update_statistics(
                state, g_m2d, aux["radii"], aux["contrib_sum"],
                aux["contrib_max"],
                aux["visible_mask"] & self._stat_gate(iteration))
        else:
            # Unconsumed jit outputs are still materialized — drop the
            # statistics products so XLA DCEs the contrib owner-sort +
            # segment reduction when no statistic block exists (see
            # vanilla_ts._train_step).
            for k in ("radii", "contrib_sum", "contrib_max", "visible_mask"):
                del aux[k]
        aux["log_vec"] = self._log_vec(state, loss, aux)
        return params, opt, state, loss, aux

    def _log_vec(self, state, loss, aux):
        """Per-STEP log scalars stacked on-device (one d2h fetch per log
        step): [loss, num_pairs, overflow]; num_pairs is -1 when the aux
        dict doesn't carry it (DP slim aux). The alive count is fetched
        separately via _count_vec AFTER _model_update (see vanilla_ts)."""
        np_used = aux.get("num_pairs")
        return jnp.stack([
            jnp.float32(loss),
            jnp.float32(-1.0) if np_used is None
            else np_used.astype(jnp.float32),
            aux["overflow"].astype(jnp.float32)])

    @functools.partial(jax.jit, static_argnums=(0,))
    def _count_vec(self, state):
        """Post-model-update log scalars: [alive_count]."""
        return state.alive.sum().astype(jnp.float32)[None]

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
    def _train_step_dp(self, settings, params, opt, state, cameras, sched):
        """Camera-batch DP step over ``self._mesh``: mean-gradient psum,
        replicated Adam, per-VIEW statistics reduced across views and the
        mesh (identical semantics to VanillaTSTrainer._train_step_dp,
        including the B-views-per-device scan when data_parallel exceeds
        the mesh size)."""
        from ..parallel.mesh import (accumulate_view_stat_locals,
                                     get_shard_map,
                                     reduce_view_statistics_local,
                                     view_stat_locals, zero_view_stat_locals)

        weights, lrs, background, iteration = self._pack.unpack(sched)
        mesh = self._mesh
        axis = "data"
        B = self._dp_b
        n_views = mesh.shape[axis] * B
        repl, shard = jax.sharding.PartitionSpec(), \
            jax.sharding.PartitionSpec(axis)
        C = params.capacity

        def per_device(params, opt, state, cameras, background, lrs, weights,
                       iteration):
            def one_view(camera):
                def loss_fn(p, m2d):
                    loss, aux = self._camera_loss(settings, p, m2d, state,
                                                  camera, background, weights)
                    return loss / n_views, aux

                m2d = jnp.zeros((C, 2), jnp.float32)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(params, m2d)
                g_params, g_m2d = grads
                stat = view_stat_locals(
                    aux["visible_mask"] & self._stat_gate(iteration),
                    G.safe_norm(g_m2d * n_views),   # per-view grad norm
                    aux["contrib_sum"], aux["contrib_max"], aux["radii"])
                return loss, g_params, stat, aux["overflow"].astype(jnp.int32)

            if B == 1:
                camera = jax.tree_util.tree_map(lambda x: x[0], cameras)
                loss, g_params, stat, ovf = one_view(camera)
            else:
                def body(carry, camera):
                    loss_a, gp_a, st_a, ov_a = carry
                    loss_i, gp_i, st_i, ov_i = one_view(camera)
                    return (loss_a + loss_i,
                            jax.tree_util.tree_map(jnp.add, gp_a, gp_i),
                            accumulate_view_stat_locals(st_a, st_i),
                            jnp.maximum(ov_a, ov_i)), None

                init = (jnp.float32(0.0),
                        jax.tree_util.tree_map(jnp.zeros_like, params),
                        zero_view_stat_locals(C), jnp.int32(0))
                (loss, g_params, stat, ovf), _ = jax.lax.scan(
                    body, init, cameras)

            g_params = jax.lax.psum(g_params, axis)
            loss = jax.lax.psum(loss, axis)
            params, opt = G.adam_update(params, opt, g_params, lrs)

            if self._track_stats:
                state = reduce_view_statistics_local(state, stat, axis)

            slim = dict(overflow=jax.lax.pmax(ovf, axis) > 0)
            return params, opt, state, loss, slim

        smapped = get_shard_map()(
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
        pkg = G.forward(params, state, camera, background, self.model_cfg,
                        settings, is_training=False, impl=self.impl,
                        interpret=self.interpret, need_stats=False)
        img = pkg["render"]
        return img, L.psnr(img, camera.gt_image), L.ssim(jnp.clip(img, 0, 1),
                                                         camera.gt_image)

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
            return 0
        pcd = self.dataset.getPointCloud()
        sampling = self.config.model.sampling or Config()
        has_densify = (self._mu is not None and self._mu.densification is not None)
        self.params, self.state = G.create_from_points(
            pcd.points, pcd.colors, self.model_cfg,
            init_opacity=sampling.init_opacity if sampling.init_opacity is not None else 0.1,
            capacity_factor=4.0 if has_densify else 1.0)
        self.opt = G.GSAdamState.create(self.params)
        self.logger.info(f"Initialized {int(self.state.alive.sum())} gaussians "
                         f"(capacity {self.params.capacity})")
        return 0

    def _model_update(self, iteration: int):
        mu = self._mu
        if mu is None:
            return
        d = mu.densification
        if d is not None and d.start_iter < iteration <= d.end_iter \
                and iteration % d.interval_iter == 0:
            thr = self.grad_threshold_scheduler(iteration - d.start_iter)
            self._prng, key = jax.random.split(self._prng)
            self.params, self.opt, self.state, n, overflow = self._j_densify(
                self.params, self.opt, self.state, key, _f32(thr),
                d.min_view_count, _f32(d.split_scale_threshold),
                d.split_num or 2)
            if bool(overflow):
                self._grow_capacity()
            self.logger.info(f"[ITER {iteration}] densified {int(n)}")
        op = mu.opacity_pruning
        if op is not None and op.start_iter < iteration <= (op.hold_iter or op.end_iter) \
                and iteration % op.interval_iter == 0:
            thr = self.opacity_pruning_scheduler(iteration - op.start_iter)
            self.params, self.opt, self.state, n = self._j_opacity_pruning(
                self.params, self.opt, self.state, _f32(thr))
            self.logger.info(f"[ITER {iteration}] opacity-pruned {int(n)}")
        oc = mu.opacity_clipping
        if oc is not None and oc.start_iter < iteration <= (oc.hold_iter or oc.end_iter) \
                and iteration % oc.interval_iter == 0:
            thr = self.opacity_clipping_scheduler(iteration - oc.start_iter)
            self.params, self.opt, self.state, n = self._j_opacity_clipping(
                self.params, self.opt, self.state, _f32(thr))
            self.logger.info(f"[ITER {iteration}] opacity-clipped {int(n)}")
        sp = mu.scale_pruning
        if sp is not None and sp.start_iter < iteration <= sp.end_iter \
                and iteration % sp.interval_iter == 0:
            self.params, self.opt, self.state, n = self._j_scale_pruning(
                self.params, self.opt, self.state,
                _f32(sp.radii_threshold), _f32(sp.scale_threshold))
            self.logger.info(f"[ITER {iteration}] scale-pruned {int(n)}")
        sc = mu.scale_clipping
        if sc is not None and sc.start_iter < iteration <= (sc.hold_iter or sc.end_iter) \
                and iteration % sc.interval_iter == 0:
            mx = self.scale_max_scheduler(iteration - sc.start_iter)
            self.params, self.opt, self.state, n = self._j_scale_clipping(
                self.params, self.opt, self.state, _f32(mx))
            self.logger.info(f"[ITER {iteration}] scale-clipped {int(n)}")
        cp = mu.contribution_pruning
        if cp is not None and cp.start_iter < iteration <= cp.end_iter \
                and iteration % cp.interval_iter == 0:
            from .adc_utils import (alive_inter_point_dist,
                                    resolve_contribution_pruning)
            target, ratio, prune_ratio, retain = \
                resolve_contribution_pruning(cp, iteration)
            if target is None:
                raise ValueError(
                    "model.model_update.contribution_pruning.target_point_"
                    "num is null — set it (run_experiments.py mesh presets "
                    "provide per-scene targets) or add a downsample "
                    "schedule before contribution pruning activates.")
            ipd = None
            if retain > 0:
                ipd = alive_inter_point_dist(self.params.xyz,
                                             self.state.alive)
            self.params, self.opt, self.state, n = self._j_contribution_pruning(
                self.params, self.opt, self.state,
                min_view_count=np.int32(cp.min_view_count
                                        if cp.min_view_count is not None else 1),
                target_point_num=np.int32(target),
                prune_ratio=_f32(prune_ratio),
                max_prune_ratio=_f32(cp.max_prune_ratio
                                     if cp.max_prune_ratio is not None else 0.2),
                contrib_max_ratio=_f32(ratio), scene_bbox=self.scene_bbox,
                inter_point_dist=ipd, sparsity_retain_ratio=retain)
            self.logger.info(f"[ITER {iteration}] contribution-pruned {int(n)}")
        orr = mu.opacity_reset
        if orr is not None and orr.start_iter < iteration <= orr.end_iter \
                and iteration % orr.interval_iter == 0:
            self.params, self.opt, self.state = self._j_opacity_reset(
                self.params, self.opt, self.state, _f32(orr.reset_value))
            self.logger.info(f"[ITER {iteration}] opacity reset")
        shs = mu.sh_schedule
        if shs is not None:
            deg = min(sum(1 for it in shs.one_up_iters if iteration > it),
                      self.model_cfg.max_sh_degree)
            if deg != self._sh_degree_host:
                self._sh_degree_host = deg
                self.state = replace(self.state, active_sh_degree=jnp.int32(deg))

    def _grow_capacity(self):
        """Host-side capacity reallocation (pad by 50%, recompile) — splits
        deferred by a full re-run on the grown buffers next round."""
        from .adc_utils import grow_capacity
        old = self.params.capacity
        self.params, self.opt, self.state = grow_capacity(
            self.params, self.opt, self.state, self.logger)
        # restore the dead-slot identity-quaternion invariant the zero-pad
        # broke (create_from_points sets w=1 so dead covariances stay
        # non-singular, gaussian_model.py create_from_points)
        self.params = replace(
            self.params,
            rotation=self.params.rotation.at[old:, 0].set(1.0))

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
                       "ssim": _f32(cfgt.w_ssim or 0.0)}
            sched = self._pack.pack(
                weights, self._lrs(iteration),
                get_color_tensor(cfgt.train_background or "random",
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
            if cfgt.eval_interval_iter and iteration % cfgt.eval_interval_iter == 0:
                timer.log("evaluation")
                self._evaluate(iteration)
            # capacity at STEP time — _model_update may grow it, and
            # num_pairs was measured against the pre-growth max_pairs
            cap_step = self.params.capacity
            timer.log("model update")
            self._model_update(iteration)
            if cfgt.log_interval_iter and iteration % cfgt.log_interval_iter == 0:
                # the log-vec fetch drains every queued step — bill that
                # wait as device compute (see vanilla_ts.py)
                timer.log("device drain")
                lv = np.asarray(aux["log_vec"])
                timer.log("logging")
                # second d2h fetch: post-update [alive] (scalar_pack.py)
                count = int(np.asarray(self._count_vec(self.state))[0])
                self.logger.info(f"[ITER {iteration}] Loss: {lv[0]:.5f}, "
                                 f"Gaussians: {count}")
                self.logger.add_scalar("Loss", float(lv[0]), iteration)
                from .adc_utils import adapt_pair_budget
                np_used = int(lv[1])   # -1 when DP (slim aux is grow-only)
                # denominator = padded capacity (== rasterize's max_pairs
                # P), not the alive count — see vanilla_ts
                # Cold-start sizing shrinks fully; hysteresis thereafter;
                # an overflow window doesn't consume the one-shot flag
                # (see vanilla_ts).
                first_sizing = (np_used >= 0
                                and not getattr(self, "_ppt_sized", False))
                if np_used >= 0 and not bool(lv[2]):
                    self._ppt_sized = True
                new_ppt = adapt_pair_budget(
                    self._ppt,
                    np_used if np_used >= 0 else None,
                    cap_step, bool(lv[2]),
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

    def _evaluate(self, iteration: int):
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
        self.logger.info(f"[ITER {iteration}] Eval PSNR: {np.mean(psnrs):.3f}, "
                         f"SSIM: {np.mean(ssims):.3f}")
        self.logger.add_scalar("Average PSNR", float(np.mean(psnrs)), iteration)
        return float(np.mean(psnrs))

    # -- IO (3DGS-compatible schema) ---------------------------------------
    def savePLY(self, path):
        from ..models.raw_gaussian import pack_sh_features
        alive = np.asarray(self.state.alive)
        g = RawGaussian(
            xyz=np.asarray(self.params.xyz)[alive],
            opacity=np.asarray(self.params.opacity)[alive],
            shs=pack_sh_features(np.asarray(G.get_features(self.params))[alive]),
            scale=np.asarray(self.params.scaling)[alive],
            rotation=np.asarray(self.params.rotation)[alive])
        self.logger.info(f"Saving {len(g)} gaussians to {path}")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        g.savePLY(path)

    def loadPLY(self, path):
        from ..models.raw_gaussian import unpack_sh_features
        g = RawGaussian(ply_path=str(path))
        n = len(g)
        K = (self.model_cfg.max_sh_degree + 1) ** 2
        feats = unpack_sh_features(g.shs, K)
        f_dc, f_rest = feats[:, :1], feats[:, 1:]
        cap = (n + 255) // 256 * 256

        def pad(x):
            return np.concatenate([x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])

        self.params = G.GaussianParams(
            xyz=jnp.asarray(pad(g.xyz)), scaling=jnp.asarray(pad(g.scale)),
            rotation=jnp.asarray(pad(g.rotation)),
            opacity=jnp.asarray(pad(g.opacity)),
            f_dc=jnp.asarray(pad(f_dc)), f_rest=jnp.asarray(pad(f_rest)))
        self.state = G.GaussianState.create(cap)
        self.state = replace(self.state, alive=jnp.asarray(np.arange(cap) < n))
        self.opt = G.GSAdamState.create(self.params)

    def save_ckpt(self, path):
        from ..utils.checkpoint import save_ckpt
        blob = dict(
            params=jax.tree_util.tree_map(np.asarray, self.params),
            opt=jax.tree_util.tree_map(np.asarray, self.opt),
            state=jax.tree_util.tree_map(np.asarray, self.state))
        save_ckpt(path, blob, self.config.trainer.ckpt_format or "pickle")

    def load_ckpt(self, path):
        from ..utils.checkpoint import load_ckpt
        blob = load_ckpt(path)
        to_dev = lambda x: jnp.asarray(x)
        self.params = jax.tree_util.tree_map(to_dev, blob["params"])
        self.opt = jax.tree_util.tree_map(to_dev, blob["opt"])
        self.state = jax.tree_util.tree_map(to_dev, blob["state"])
