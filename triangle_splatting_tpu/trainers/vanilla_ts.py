"""VanillaTS trainer: the main train/eval loop
(reference trainers/VanillaTS_trainer.py:14-293).

Functional-JAX redesign: the entire hot iteration (forward + loss + backward
+ Adam + statistics) is ONE jitted ``train_step`` with donated params/opt
buffers; schedules and loss weights enter as traced scalars so nothing
recompiles across iterations. Adaptive density control ops run as separate
jitted functions on their configured cadences (shapes stay fixed — see
models/triangle.py).
"""

from __future__ import annotations

import functools
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import triangle as M
from ..models.model_utils import get_color_tensor
from ..models.raw_triangle import RawTriangle
from ..ops.projection import RasterSettings
from ..utils.camera import Camera
from ..utils.config import Config
from ..utils.scheduler import exponential_scheduler, exponential_step_scheduler
from ..utils.timer import Timer
from . import losses as L
from .base import BaseTrainer


def _f32(x):
    return np.float32(x)


class VanillaTSTrainer(BaseTrainer):
    def __init__(self, config: str | Config, exp_name: str | None = None,
                 log_file: bool = True, impl: str = "pallas",
                 interpret: bool = False):
        super().__init__(config, exp_name, log_file)
        mc = self.config.model
        self.model_cfg = M.ModelConfig(
            max_sh_degree=mc.max_sh_degree if mc.max_sh_degree is not None else 0,
            use_color_affine=bool(mc.use_color_affine),
            back_culling=bool(mc.back_culling),
            back_culling_prob=mc.back_culling_prob if mc.back_culling_prob is not None else 1.0,
            ste_threshold=mc.ste_threshold,
            gamma_rescale=bool(mc.gamma_rescale),
            render_up_scale=mc.render_up_scale,
            rasterizer_type=mc.rasterizer_type or "2D",
        )
        self.impl = impl
        self.interpret = interpret
        # trainer.data_parallel: N shards a batch of N cameras per step
        # across an N-device mesh (no upstream equivalent; SURVEY.md §2.3).
        self._dp_n = int(self.config.trainer.data_parallel or 0)
        self._dp_b = 1   # local views per device (set by dp_layout)
        self._mesh = None
        self.scene_bbox = None
        scene_info = self.dataset.getSceneInfo()
        if scene_info is not None:
            self.scene_bbox = scene_info.get("bbox_xyz")

        self.params: M.TriangleParams | None = None
        self.state: M.TriangleState | None = None
        self.opt: M.AdamState | None = None
        self._nearest_cache = None
        self._setup_schedulers()
        self._rng = np.random.default_rng(self.seed)
        self._sh_degree_host = 0

        # Jitted ADC ops (eager per-op dispatch is pathologically slow on the
        # remote-compile TPU path; these run every few hundred iterations).
        self._j_densify = jax.jit(M.densify, static_argnums=(4,))

        def _densify_stats(state, min_view_count):
            """[p50, p99, max, n_eligible] of the per-view center2D
            gradient-norm means the densify threshold is compared against
            — logged so thresholds can be set from data, not guessed."""
            ok = state.alive & (state.gradient_denom >= min_view_count)
            g = jnp.where(ok, state.gradient_accum
                          / jnp.maximum(state.gradient_denom, 1.0), 0.0)
            srt = jnp.sort(g)
            cnt = ok.sum()
            C = g.shape[0]
            at = lambda q: srt[jnp.clip(C - 1 - (cnt * q).astype(jnp.int32),
                                        0, C - 1)]
            return jnp.stack([at(0.5), at(0.01), srt[-1],
                              cnt.astype(jnp.float32)])

        self._j_densify_stats = jax.jit(_densify_stats, static_argnums=(1,))
        self._j_opacity_pruning = jax.jit(M.opacity_pruning)
        self._j_opacity_clipping = jax.jit(M.opacity_clipping)
        self._j_scale_pruning = jax.jit(M.scale_pruning)
        self._j_scale_clipping = jax.jit(M.scale_clipping)
        self._j_opacity_reset = jax.jit(M.opacity_reset)
        # sparsity_retain_ratio / ste_threshold gate Python branches and are
        # static — each retain-ratio bump at a downsample crossing retraces
        # once (a handful per run); counts/ratios are traced.
        self._j_contribution_pruning = jax.jit(
            M.contribution_pruning,
            static_argnames=("sparsity_retain_ratio", "ste_threshold"))

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _setup_schedulers(self):
        oc = self.config.model.optimizer
        self.lr_schedulers = {}
        if oc is not None:
            for name in ("vertex", "opacity", "f_dc", "f_rest"):
                sub = getattr(oc, name)
                if sub is not None:
                    self.lr_schedulers[name] = exponential_scheduler(**vars(sub))
            if oc.color_affine is not None:
                self.lr_schedulers["affine"] = exponential_scheduler(**vars(oc.color_affine))
            if oc.vertex_scale_up_iter is not None and oc.vertex_scale_up is not None:
                base = self.lr_schedulers["vertex"]
                it0, mult = oc.vertex_scale_up_iter, oc.vertex_scale_up
                self.lr_schedulers["vertex"] = (
                    lambda it, base=base, it0=it0, mult=mult:
                    base(it) * (1.0 if it <= it0 else mult))

        mu = self.config.model.model_update
        self._mu = mu
        # Set at construction (not in _train) so direct _train_step calls
        # (tests) and the need_stats kernel gating see it.
        self._track_stats = (mu is not None and mu.statistic is not None)
        if mu is not None:
            d = mu.densification
            if d is not None:
                self.grad_threshold_scheduler = exponential_scheduler(
                    v_init=d.grad_threshold_init, v_final=d.grad_threshold_final,
                    max_steps=d.end_iter - d.start_iter)
            op = mu.opacity_pruning
            if op is not None:
                self.opacity_pruning_scheduler = exponential_scheduler(
                    v_init=op.opacity_threshold_init, v_final=op.opacity_threshold_final,
                    max_steps=op.end_iter - op.start_iter)
            oc2 = mu.opacity_clipping
            if oc2 is not None:
                self.opacity_clipping_scheduler = exponential_scheduler(
                    v_init=oc2.opacity_threshold_init, v_final=oc2.opacity_threshold_final,
                    max_steps=oc2.end_iter - oc2.start_iter)
            sc = mu.scale_clipping
            if sc is not None:
                self.scale_max_scheduler = exponential_scheduler(
                    v_init=sc.scale_max_init, v_final=sc.scale_max_final,
                    max_steps=sc.end_iter - sc.start_iter)
            g = mu.gamma_schedule
            if g is not None:
                mk = exponential_step_scheduler if g.step_scheduler else exponential_scheduler
                kw = dict(v_init=g.gamma_init, v_final=g.gamma_final,
                          max_steps=g.end_iter - g.start_iter)
                if g.step_scheduler:
                    kw["n_stage"] = g.n_stage
                self.gamma_scheduler = mk(**kw)

    def _lrs(self, iteration: int) -> dict:
        lrs = {name: _f32(fn(iteration)) for name, fn in self.lr_schedulers.items()}
        lrs.setdefault("affine", _f32(0.0))
        return lrs

    _PACK_WEIGHT_KEYS = ("l1", "ssim", "dog", "smooth", "geometry", "scaling",
                         "opacity_quad", "opacity_linear", "vertex", "affine")
    _PACK_LR_DEFAULTS = ("affine",)          # _lrs setdefaults it

    def _settings_for(self, camera: Camera) -> RasterSettings:
        if not hasattr(self, "_ppt"):
            self._ppt = self.config.model.pairs_per_triangle or 6
            # Depth/normal accumulation (rich_info) costs real kernel time
            # but only the depth-normal-consistency loss consumes it; every
            # shipped config except MatrixCity_mesh sets w_geometry 0. The
            # reference always runs rich during training
            # (VanillaTS_model.py:639 rich_info=is_training) — skipping
            # dead work is free speedup, and eval/stats only read color/
            # contribs. Static per run, so no extra jit variants.
            geo = self.config.trainer.geometry_loss
            self._rich = bool(geo is not None and (geo.w_geometry or 0) > 0)
        return RasterSettings(
            image_width=camera.image_width, image_height=camera.image_height,
            max_sh_degree=self.model_cfg.max_sh_degree,
            back_culling=self.model_cfg.back_culling,
            rasterizer_type=self.model_cfg.rasterizer_type,
            rich_info=self._rich,
            pairs_per_triangle=self._ppt)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _camera_loss(self, settings: RasterSettings, p, c2d, state,
                     camera: Camera, background, weights, nearest_idx):
        """Per-camera training loss (VanillaTS_trainer.py:43-117). Shared by
        the single-device step and the data-parallel shard_map step."""
        cfg = self.model_cfg
        # need_stats tracks the statistic window: without one, the kernel's
        # contribution-statistics stream is dead work (its consumers are
        # dropped from aux below and DCE'd anyway).
        pkg = M.forward(p, state, camera, background, cfg, settings,
                        is_training=True, center2d_offset=c2d,
                        impl=self.impl, interpret=self.interpret,
                        need_stats=self._track_stats)
        img = pkg["render"]
        gt = camera.gt_image
        if camera.alpha_mask is not None:
            img = img * camera.alpha_mask
            gt = gt * camera.alpha_mask

        w = weights
        loss = 0.0
        loss += w["l1"] * L.l1(img, gt)
        loss += w["ssim"] * L.ssim_loss(img, gt)
        if self._w_dog > 0:
            loss += w["dog"] * L.dog_loss(img, gt, freq=self._dog_freq)
        if self._w_smooth > 0:
            loss += w["smooth"] * L.smoothness_loss(img, gt)
        if self._w_geometry > 0:
            geo = L.depth_normal_loss(pkg["depth"], pkg["normal"],
                                      camera.tan_fovx, camera.tan_fovy,
                                      self._geo_scale_factor)
            loss += w["geometry"] * geo
        else:
            geo = jnp.float32(0.0)

        alive_f = state.alive.astype(jnp.float32)
        n_alive = jnp.maximum(alive_f.sum(), 1.0)
        scaling_reg = (pkg["scaling"] * alive_f).sum() / n_alive
        loss += w["scaling"] * scaling_reg

        op = pkg["opacity"][:, 0]
        quad = ((0.25 - (op - 0.5) ** 2) * alive_f).sum() / n_alive
        lin = ((1.0 - op) * alive_f).sum() / n_alive
        loss += w["opacity_quad"] * quad + w["opacity_linear"] * lin

        if self._w_vertex > 0 and nearest_idx is not None:
            pts = p.vertex.reshape(-1, 3)
            d2 = ((pts - pts[nearest_idx]) ** 2).sum(-1)
            mask3 = jnp.repeat(alive_f, 3)
            vloss = (d2 * mask3).sum() / jnp.maximum(mask3.sum(), 1.0)
            loss += w["vertex"] * vloss
        else:
            vloss = jnp.float32(0.0)

        if "render_original" in pkg and self._w_affine > 0:
            orig = pkg["render_original"]
            if camera.alpha_mask is not None:
                orig = orig * camera.alpha_mask
            loss += w["affine"] * L.l1(img, orig)

        aux = dict(radii=pkg["radii"], contrib_sum=pkg["contrib_sum"],
                   contrib_max=pkg["contrib_max"],
                   visible_mask=pkg["visible_mask"],
                   overflow=pkg["overflow"], num_pairs=pkg["num_pairs"],
                   geo_loss=geo, vertex_loss=vloss)
        return loss, aux

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
    def _train_step(self, settings: RasterSettings, params, opt, state,
                    camera: Camera, sched, nearest_idx):
        """One full training iteration (forward/loss/backward/Adam/stats).

        ``sched`` is the HostScalarPack vector (weights/lrs/background/
        iteration) — ONE h2d buffer per step instead of ~20 scalar RPCs
        through the remote-dispatch tunnel (see trainers/scalar_pack.py).
        """
        weights, lrs, background, iteration = self._pack.unpack(sched)
        C = params.capacity

        def loss_fn(p, c2d):
            return self._camera_loss(settings, p, c2d, state, camera,
                                     background, weights, nearest_idx)

        c2d = jnp.zeros((C, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                has_aux=True)(params, c2d)
        g_params, g_c2d = grads
        params, opt = M.adam_update(params, opt, g_params, lrs)

        if self._track_stats:
            state = M.update_statistics(state, g_c2d, aux["radii"],
                                        aux["contrib_sum"], aux["contrib_max"],
                                        aux["visible_mask"] & self._stat_gate(iteration))
        else:
            # Every aux entry is a jit OUTPUT, materialized even if the host
            # never reads it. With no statistic block (the photo configs)
            # nothing consumes the statistics products — dropping them here
            # lets XLA DCE their producers, in particular the contrib
            # owner-sort + streaming segment reduction in rasterize's
            # _contrib_stats (~1 ms/step @800²/100k).
            for k in ("radii", "contrib_sum", "contrib_max", "visible_mask"):
                del aux[k]
        aux["log_vec"] = self._log_vec(params, state, loss, aux)
        return params, opt, state, loss, aux

    def _log_vec(self, params, state, loss, aux):
        """Per-STEP log scalars stacked on-device (one d2h fetch per log
        step): [loss, num_pairs, overflow]. Model-state scalars
        (count/gamma/SH) are fetched separately via _count_vec AFTER
        _model_update so densify/prune/anneal effects are not logged one
        update late (they were computed post-update in the host logic this
        replaces)."""
        return jnp.stack([
            jnp.float32(loss), aux["num_pairs"].astype(jnp.float32),
            aux["overflow"].astype(jnp.float32)])

    @functools.partial(jax.jit, static_argnums=(0,))
    def _count_vec(self, params, state):
        """Post-model-update log scalars: [count, gamma, sh_degree].
        ``count`` is the opacity-thresholded triangle count when
        ste_threshold is set (mesh configs), else the alive count."""
        if self.model_cfg.ste_threshold is not None:
            cnt = ((M.get_opacity(params)[:, 0] > self.model_cfg.ste_threshold)
                   & state.alive).sum()
        else:
            cnt = state.alive.sum()
        return jnp.stack([cnt.astype(jnp.float32), jnp.float32(state.gamma),
                          state.active_sh_degree.astype(jnp.float32)])

    def _stat_gate(self, iteration):
        st = self._mu.statistic if self._mu is not None else None
        if st is None:
            return jnp.asarray(True)
        return (iteration > st.start_iter) & (iteration <= st.end_iter)

    @functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
    def _train_step_dp(self, settings: RasterSettings, params, opt, state,
                       cameras: Camera, sched, nearest_idx):
        """Camera-batch data-parallel train step over ``self._mesh``.

        The reference's only multi-GPU mechanism is independent per-scene
        processes (SURVEY.md §2.3); here one scene trains a batch of
        ``data_parallel`` cameras per step: the batch is sharded across the
        mesh (``B = batch / mesh_size`` views per chip, scan-accumulated
        locally when B > 1). Parameters are replicated, every chip
        rasterizes its own camera(s), and the MEAN gradient is ``psum``-med
        over ICI before a replicated Adam step — so learning-rate/Adam
        hyperparameters keep their single-camera meaning and one DP step
        averages the batch's views. Densification statistics keep per-VIEW
        semantics (VanillaTS_model.py:347-363): per-camera ``center2D``
        gradient norms and view counts are summed across views and the
        mesh, contribution/radius maxima are max-ed — identical to running
        the batch through sequential single-device steps.
        """
        from ..parallel.mesh import (accumulate_view_stat_locals,
                                     get_shard_map,
                                     reduce_view_statistics_local,
                                     view_stat_locals, zero_view_stat_locals)

        weights, lrs, background, iteration = self._pack.unpack(sched)
        mesh = self._mesh
        axis = "data"
        n_views = mesh.shape[axis] * self._dp_b
        B = self._dp_b
        repl, shard = jax.sharding.PartitionSpec(), \
            jax.sharding.PartitionSpec(axis)
        C = params.capacity

        def per_device(params, opt, state, cameras, background, lrs, weights,
                       nearest_idx, iteration):
            def one_view(camera):
                def loss_fn(p, c2d):
                    loss, aux = self._camera_loss(settings, p, c2d, state,
                                                  camera, background, weights,
                                                  nearest_idx)
                    return loss / n_views, aux   # mean over the camera batch

                c2d = jnp.zeros((C, 2), jnp.float32)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(params, c2d)
                g_params, g_c2d = grads
                # NOTE: g_c2d is the LOCAL view's grad (pre-psum, un-meaned
                # by * n_views) — the statistic is the per-view grad norm,
                # not the norm of the batch-summed grad.
                stat = view_stat_locals(
                    aux["visible_mask"] & self._stat_gate(iteration),
                    jnp.linalg.norm(g_c2d * n_views, axis=-1),
                    aux["contrib_sum"], aux["contrib_max"], aux["radii"])
                slim = dict(overflow=aux["overflow"].astype(jnp.int32),
                            num_pairs=aux["num_pairs"],
                            geo_loss=aux["geo_loss"],
                            vertex_loss=aux["vertex_loss"])
                return loss, g_params, stat, slim

            if B == 1:
                camera = jax.tree_util.tree_map(lambda x: x[0], cameras)
                loss, g_params, stat, slim = one_view(camera)
            else:
                def body(carry, camera):
                    loss_a, gp_a, st_a, sl_a = carry
                    loss_i, gp_i, st_i, sl_i = one_view(camera)
                    sl = dict(
                        overflow=jnp.maximum(sl_a["overflow"],
                                             sl_i["overflow"]),
                        num_pairs=jnp.maximum(sl_a["num_pairs"],
                                              sl_i["num_pairs"]),
                        geo_loss=sl_a["geo_loss"] + sl_i["geo_loss"],
                        vertex_loss=sl_a["vertex_loss"] + sl_i["vertex_loss"])
                    return (loss_a + loss_i,
                            jax.tree_util.tree_map(jnp.add, gp_a, gp_i),
                            accumulate_view_stat_locals(st_a, st_i), sl), None

                init = (jnp.float32(0.0),
                        jax.tree_util.tree_map(jnp.zeros_like, params),
                        zero_view_stat_locals(C),
                        dict(overflow=jnp.int32(0), num_pairs=jnp.int32(0),
                             geo_loss=jnp.float32(0.0),
                             vertex_loss=jnp.float32(0.0)))
                (loss, g_params, stat, slim), _ = jax.lax.scan(
                    body, init, cameras)

            g_params = jax.lax.psum(g_params, axis)
            loss = jax.lax.psum(loss, axis)
            params, opt = M.adam_update(params, opt, g_params, lrs)

            if self._track_stats:
                state = reduce_view_statistics_local(state, stat, axis)

            slim = dict(
                overflow=jax.lax.pmax(slim["overflow"], axis) > 0,
                num_pairs=jax.lax.pmax(slim["num_pairs"], axis),
                geo_loss=jax.lax.psum(slim["geo_loss"], axis) / n_views,
                vertex_loss=jax.lax.psum(slim["vertex_loss"], axis) / n_views)
            return params, opt, state, loss, slim

        smapped = get_shard_map()(
            per_device, mesh=mesh,
            in_specs=(repl, repl, repl, shard, repl, repl, repl, repl, repl),
            out_specs=(repl, repl, repl, repl, repl),
            check_vma=False)
        params, opt, state, loss, slim = smapped(
            params, opt, state, cameras, background, lrs, weights,
            nearest_idx, iteration)
        slim["log_vec"] = self._log_vec(params, state, loss, slim)
        return params, opt, state, loss, slim

    @functools.partial(jax.jit, static_argnums=(0, 1, 6))
    def _eval_step(self, settings, params, state, camera, background, eval_mask: bool):
        pkg = M.forward(params, state, camera, background, self.model_cfg,
                        settings, is_training=False, apply_color_affine=False,
                        impl=self.impl, interpret=self.interpret,
                        need_stats=False)
        img = pkg["render"]
        gt = camera.gt_image
        mask = camera.alpha_mask if eval_mask else None
        psnr = L.psnr(img, gt, mask)
        ssim_val = L.ssim(jnp.clip(img, 0, 1), gt)
        return img, psnr, ssim_val

    @functools.partial(jax.jit, static_argnums=(0, 1, 6))
    def _eval_step_dp(self, settings, params, state, cameras, background,
                      eval_mask: bool):
        """Render/score B test views per mesh device (forward-only DP):
        the test set evaluates in ceil(n_views / (n_devices * B)) passes,
        B = the local camera count of the incoming batch (dp_layout's
        cameras_per_device — same layout logic as the train step)."""
        from ..parallel.mesh import get_shard_map
        repl = jax.sharding.PartitionSpec()
        shard = jax.sharding.PartitionSpec("data")

        def per_device(params, state, cameras, background):
            def one(_, camera):
                return None, self._eval_step.__wrapped__(
                    self, settings, params, state, camera, background,
                    eval_mask)

            _, (imgs, ps, ss) = jax.lax.scan(one, None, cameras)
            return imgs, ps, ss

        smapped = get_shard_map()(
            per_device, mesh=self._mesh,
            in_specs=(repl, repl, shard, repl),
            out_specs=(shard, shard, shard), check_vma=False)
        return smapped(params, state, cameras, background)

    # ------------------------------------------------------------------
    # loop
    # ------------------------------------------------------------------
    def _init_model(self):
        cfgt = self.config.trainer
        first_iter = 0
        if cfgt.start_checkpoint:
            self.load_ckpt(f"{self.output_dir}/ckpt/{cfgt.start_checkpoint}.ckpt")
            first_iter = int(cfgt.start_checkpoint)
        elif cfgt.start_pointcloud:
            self.loadPLY(f"{self.output_dir}/point_cloud/{cfgt.start_pointcloud}.ply")
            first_iter = int(cfgt.start_pointcloud)
        if self.params is None:
            self.logger.info("Initializing triangles from point cloud")
            pcd = self.dataset.getPointCloud()
            sampling = self.config.model.sampling or Config()
            pts, cols, nrm = self._sample_points(pcd)
            has_densify = (self._mu is not None and self._mu.densification is not None)
            self.params, self.state = M.create_from_points(
                pts, cols, nrm, self.model_cfg,
                init_opacity=sampling.init_opacity if sampling.init_opacity is not None else 0.1,
                capacity_factor=2.0 if has_densify else 1.0,
                duplicate_count=sampling.duplicate_count or 1,
                seed=self.seed)
            if self.model_cfg.use_color_affine:
                self.params = M.setup_color_affine(
                    self.params, self.dataset.getTrainDatasetSize())
            self.opt = M.AdamState.create(self.params)
            self.logger.info(
                f"Initialized {int(self.state.alive.sum())} triangles "
                f"(capacity {self.params.capacity})")
        return first_iter

    def _sample_points(self, pcd):
        """inside/outside bbox split + sampling (VanillaTS_model.py:830-862)."""
        from ..models.model_utils import grid_sampling, grid_size_search
        sampling = self.config.model.sampling or Config()
        pts = np.asarray(pcd.points, np.float32)
        cols = np.asarray(pcd.colors, np.float32)
        nrm = np.asarray(pcd.normals, np.float32)
        if len(pts) == 0:
            raise ValueError("Empty point cloud and no random_init support yet")

        if self.scene_bbox is None:
            groups = [(pts, cols, nrm, "inside")]
        else:
            bbox = np.asarray(self.scene_bbox, np.float32).reshape(-1)
            if bbox.size == 4:
                inside = np.all((pts[:, :2] >= bbox[:2]) & (pts[:, :2] <= bbox[2:]), -1)
            else:
                inside = np.all((pts >= bbox[:3]) & (pts <= bbox[3:]), -1)
            groups = [(pts[inside], cols[inside], nrm[inside], "inside"),
                      (pts[~inside], cols[~inside], nrm[~inside], "outside")]

        out_p, out_c, out_n = [], [], []
        for p, c, n, name in groups:
            method = sampling.sample_method or "direct"
            n_sample = getattr(sampling, f"n_sample_{name}", None)
            grid_size = getattr(sampling, f"grid_size_{name}", None)
            if method == "random" and n_sample and 0 < n_sample < len(p):
                idx = self._rng.permutation(len(p))[:n_sample]
                p, c, n = p[idx], c[idx], n[idx]
            elif method == "grid" and len(p):
                gs = grid_size or grid_size_search(p, n_sample)
                p, c, n = grid_sampling(p, c, n, gs)
                norms = np.linalg.norm(n, axis=1, keepdims=True)
                n = n / np.maximum(norms, 1e-12)
            self.logger.info(f"Sampled {len(p)} {name} points ({method})")
            out_p.append(p); out_c.append(c); out_n.append(n)
        return (np.concatenate(out_p), np.concatenate(out_c), np.concatenate(out_n))

    def _model_update(self, iteration: int):
        """Adaptive density control cadence (VanillaTS_model.py:567-581)."""
        mu = self._mu
        if mu is None:
            return

        def active(args, end_attr="end_iter"):
            return (args is not None
                    and args.start_iter < iteration <= getattr(args, end_attr)
                    and iteration % args.interval_iter == 0)

        d = mu.densification
        if active(d):
            thr = self.grad_threshold_scheduler(iteration - d.start_iter)
            stats = np.asarray(self._j_densify_stats(
                self.state, d.min_view_count))   # before densify resets them
            self.params, self.opt, self.state, n, overflow = self._j_densify(
                self.params, self.opt, self.state, _f32(thr),
                d.min_view_count, _f32(d.split_scale_threshold))
            if bool(overflow):
                self._grow_capacity()
            self.logger.info(
                f"[ITER {iteration}, densification] grew {int(n)} points, "
                f"threshold {thr:.3e} (grad-stat p50 {stats[0]:.2e} "
                f"p99 {stats[1]:.2e} max {stats[2]:.2e}, {int(stats[3])} "
                "eligible)")

        op = mu.opacity_pruning
        if op is not None and op.start_iter < iteration <= (op.hold_iter or op.end_iter) \
                and iteration % op.interval_iter == 0:
            thr = self.opacity_pruning_scheduler(iteration - op.start_iter)
            self.params, self.opt, self.state, n = self._j_opacity_pruning(
                self.params, self.opt, self.state, _f32(thr))
            self.logger.info(f"[ITER {iteration}, opacity pruning] pruned {int(n)}, "
                             f"threshold {thr:.5f}")

        oc = mu.opacity_clipping
        if oc is not None and oc.start_iter < iteration <= (oc.hold_iter or oc.end_iter) \
                and iteration % oc.interval_iter == 0:
            thr = self.opacity_clipping_scheduler(iteration - oc.start_iter)
            self.params, self.opt, self.state, n = self._j_opacity_clipping(
                self.params, self.opt, self.state, _f32(thr))
            self.logger.info(f"[ITER {iteration}, opacity clipping] clipped {int(n)}")

        sp = mu.scale_pruning
        if active(sp):
            self.params, self.opt, self.state, n = self._j_scale_pruning(
                self.params, self.opt, self.state,
                _f32(sp.radii_threshold), _f32(sp.scale_threshold))
            self.logger.info(f"[ITER {iteration}, scale pruning] pruned {int(n)}")

        sc = mu.scale_clipping
        if sc is not None and sc.start_iter < iteration <= (sc.hold_iter or sc.end_iter) \
                and iteration % sc.interval_iter == 0:
            mx = self.scale_max_scheduler(iteration - sc.start_iter)
            self.params, self.opt, self.state, n = self._j_scale_clipping(
                self.params, self.opt, self.state, _f32(mx))
            self.logger.info(f"[ITER {iteration}, scale clipping] clipped {int(n)}, "
                             f"max {mx:.4f}")

        cp = mu.contribution_pruning
        if active(cp):
            # defaults from the reference mesh configs
            # (NerfSynthetic_VanillaTS_mesh.yaml:123-134)
            from .adc_utils import (alive_inter_point_dist,
                                    resolve_contribution_pruning)
            target, ratio, prune_ratio, retain = \
                resolve_contribution_pruning(cp, iteration)
            if target is None:
                # The reference crashes here too (None * 0.99,
                # VanillaTS_model.py:499): its mesh YAMLs ship
                # target_point_num: null as a placeholder that
                # run_experiments.py's per-scene presets always override
                # (lego 112k etc.). Fail with the fix spelled out.
                raise ValueError(
                    "model.model_update.contribution_pruning.target_point_"
                    "num is null — set it (run_experiments.py mesh presets "
                    "provide per-scene targets, e.g. --point_num) or add a "
                    "downsample schedule before contribution pruning "
                    "activates.")
            ipd = None
            if retain > 0:
                ipd = alive_inter_point_dist(M.get_xyz(self.params),
                                             self.state.alive)
            self.params, self.opt, self.state, n = self._j_contribution_pruning(
                self.params, self.opt, self.state,
                min_view_count=np.int32(cp.min_view_count
                                        if cp.min_view_count is not None else 1),
                target_point_num=np.int32(target),
                prune_ratio=_f32(prune_ratio),
                max_prune_ratio=_f32(cp.max_prune_ratio
                                     if cp.max_prune_ratio is not None
                                     else 0.2),
                contrib_max_ratio=_f32(ratio), scene_bbox=self.scene_bbox,
                ste_threshold=self.model_cfg.ste_threshold,
                inter_point_dist=ipd, sparsity_retain_ratio=retain)
            self.logger.info(f"[ITER {iteration}, contribution pruning] pruned {int(n)}")

        orr = mu.opacity_reset
        if active(orr):
            self.params, self.opt, self.state = self._j_opacity_reset(
                self.params, self.opt, self.state, _f32(orr.reset_value))
            self.logger.info(f"[ITER {iteration}, opacity reset] -> {orr.reset_value}")

        g = mu.gamma_schedule
        if g is not None and g.start_iter < iteration <= g.end_iter:
            gamma = self.gamma_scheduler(iteration - g.start_iter)
            self.state = replace(self.state, gamma=jnp.float32(gamma))

        shs = mu.sh_schedule
        if shs is not None:
            deg = sum(1 for it in shs.one_up_iters if iteration > it)
            deg = min(deg, self.model_cfg.max_sh_degree)
            # host-side mirror avoids a device sync every iteration
            if deg != self._sh_degree_host:
                self._sh_degree_host = deg
                self.state = replace(self.state, active_sh_degree=jnp.int32(deg))

    def _grow_capacity(self):
        """Host-side capacity reallocation (pad by 50%, recompile)."""
        from .adc_utils import grow_capacity
        self.params, self.opt, self.state = grow_capacity(
            self.params, self.opt, self.state, self.logger)
        # the cached vertex-reg kNN indices are sized to the old capacity
        self._nearest_stale = True

    def _loss_weights(self, iteration: int) -> dict:
        t = self.config.trainer
        w_ssim = t.w_ssim or 0.0
        self._w_dog = t.w_dog or 0.0
        self._w_smooth = t.w_smoothness or 0.0
        self._dog_freq = 90
        geo = t.geometry_loss
        self._w_geometry = geo.w_geometry if geo is not None else 0.0
        self._geo_scale_factor = geo.scale_factor if geo is not None else 0.5
        w_geo = self._w_geometry if (geo is not None and iteration > (geo.start_iter or 0)) else 0.0
        vr = t.vertex_reg
        self._w_vertex = (vr.w_vertex_reg or 0.0) if vr is not None else 0.0
        w_v = self._w_vertex if (vr is not None and iteration > (vr.start_iter or 0)) else 0.0
        self._w_affine = t.w_affine_reg or 0.0

        oreg = t.w_opacity_reg
        w_quad = w_lin = 0.0
        if oreg is not None:
            if iteration > (oreg.linear_start_iter or 0):
                w_lin = oreg.linear_reg or 0.0
            elif iteration > (oreg.quad_start_iter or 0):
                w_quad = oreg.quad_reg or 0.0

        w_l1 = 1.0 - w_ssim - self._w_dog - self._w_smooth
        return {k: _f32(v) for k, v in dict(
            l1=w_l1, ssim=w_ssim, dog=self._w_dog, smooth=self._w_smooth,
            geometry=w_geo, scaling=t.w_scaling_reg or 0.0,
            opacity_quad=w_quad, opacity_linear=w_lin,
            vertex=w_v, affine=self._w_affine).items()}

    def train(self):
        try:
            self._train()
        except Exception as e:
            self.logger.error(f"Training failed: {e}")
            raise

    def _train(self):
        cfgt = self.config.trainer
        first_iter = self._init_model()

        if self._dp_n > 1:
            from ..parallel.mesh import dp_layout, make_mesh
            n_dev, self._dp_b = dp_layout(self._dp_n)
            self._mesh = make_mesh(n_dev)
            self.logger.info(
                f"Camera-batch data parallelism: {self._dp_n} views per "
                f"step over {n_dev} devices ({self._dp_b} per device, "
                "mean-gradient psum)")

        if cfgt.initial_eval:
            self._evaluate(first_iter)

        self.logger.info("Training started")
        timer = Timer("Training")
        vr = cfgt.vertex_reg
        nearest_idx = None

        for iteration in range(first_iter + 1, (cfgt.iterations or 30000) + 1):
            timer.log("data loading")
            camera = self.dataset.nextTrainData()
            dp_cameras = None
            if self._dp_n > 1:
                dp_cameras = [camera] + [self.dataset.nextTrainData()
                                         for _ in range(self._dp_n - 1)]
            settings = self._settings_for(camera)
            if self.model_cfg.back_culling \
                    and self.model_cfg.back_culling_prob < 1.0:
                # training randomly disables back-culling per step with
                # p = 1 - back_culling_prob (VanillaTS_model.py:600-606);
                # only two jit variants exist, both cached
                settings = replace(
                    settings, back_culling=bool(
                        self._rng.random() < self.model_cfg.back_culling_prob))
            camera = camera.strip_static()

            self._profile_hooks(iteration)
            timer.log("train step")
            bg_name = cfgt.train_background or "random"
            sched = self._pack.pack(
                self._loss_weights(iteration), self._lrs(iteration),
                get_color_tensor(bg_name, self._rng), iteration)

            if self._w_vertex > 0 and iteration > (vr.start_iter or 0) and \
                    ((iteration - 1) % (vr.interval_iter or 10) == 0
                     or nearest_idx is None
                     or getattr(self, "_nearest_stale", False)):
                self._nearest_stale = False
                # on-device exact kNN (ops/knn.py) — no host roundtrip;
                # restrict targets to alive triangles' vertices
                from ..ops.knn import nearest_neighbor
                pts = self.params.vertex.reshape(-1, 3)
                nearest_idx = nearest_neighbor(
                    pts, 3, jnp.repeat(self.state.alive, 3))

            if dp_cameras is not None:
                from ..parallel.mesh import stack_dp_cameras
                batch = stack_dp_cameras(dp_cameras)
                self.params, self.opt, self.state, loss, aux = \
                    self._train_step_dp(
                        settings, self.params, self.opt, self.state, batch,
                        sched, nearest_idx)
            else:
                self.params, self.opt, self.state, loss, aux = \
                    self._train_step(
                        settings, self.params, self.opt, self.state, camera,
                        sched, nearest_idx)

            if cfgt.eval_interval_iter and iteration % cfgt.eval_interval_iter == 0:
                timer.log("evaluation")
                self._evaluate(iteration)

            # capacity AT STEP TIME: num_pairs in log_vec was measured
            # against this P (max_pairs = ppt * capacity); _model_update may
            # grow it below, and mixing pre-update pairs with post-growth
            # capacity would underestimate need and spuriously shrink
            cap_step = self.params.capacity
            timer.log("model update")
            self._model_update(iteration)

            if cfgt.log_interval_iter and iteration % cfgt.log_interval_iter == 0:
                # The log-vector fetch is the loop's SYNC POINT: it blocks
                # until every step queued since the last log completes, so
                # that wait is device compute, not logging work — bill it to
                # its own channel or the report misreads (r2 full run:
                # "logging 59.7%" was queued train steps draining).
                timer.log("device drain")
                lv = np.asarray(aux["log_vec"])
                timer.log("logging")
                # TWO d2h fetches for all log scalars: the step's
                # [loss, num_pairs, overflow] plus post-update
                # [count, gamma, SH] (trainers/scalar_pack.py)
                cv = np.asarray(self._count_vec(self.params, self.state))
                loss_val, count, gamma = float(lv[0]), int(cv[0]), float(cv[1])
                self.logger.info(
                    f"[ITER {iteration}] Loss: {loss_val:.5f}, Triangles: {count}, "
                    f"Gamma: {gamma:.3f}, SH: {int(cv[2])}")
                self.logger.add_scalar("Loss", loss_val, iteration)
                self.logger.add_scalar("Triangle Count", count, iteration)
                self.logger.add_scalar("Training Time (min)",
                                       timer.total_duration() / 60, iteration)
                # adaptive pair budget: the reference reallocates its
                # binning buffers dynamically (rasterizer_impl resize); we
                # re-quantize the static budget to measured need and pay
                # one retrace (sort/pack/scatter costs scale with it)
                from .adc_utils import adapt_pair_budget
                # denominator = padded capacity at step time: max_pairs is
                # sized as ppt * capacity in rasterize, so need must be
                # measured against the same P (alive count would inflate
                # ppt and defeat the shrink path)
                # First sizing after cold start shrinks all the way to
                # margin*need (the config default is a roomy guess and the
                # 0.5 hysteresis would pin it there for the whole run —
                # ~1.7x of pair-scaled sort/pack cost every step); later
                # windows keep the anti-thrash hysteresis. An overflow
                # window takes the grow branch without running the
                # full-shrink sizing — don't consume the one-shot flag on
                # it, or the cold-start opportunity is lost for the run.
                first_sizing = not getattr(self, "_ppt_sized", False)
                if not bool(lv[2]):
                    self._ppt_sized = True
                new_ppt = adapt_pair_budget(
                    self._ppt, int(lv[1]), cap_step, bool(lv[2]),
                    shrink_if_below=1.0 if first_sizing else 0.5)
                if new_ppt != self._ppt:
                    self._ppt = new_ppt
                    self.logger.warning(
                        "pair budget re-sized: pairs_per_triangle -> "
                        f"{self._ppt} (one-time recompile)")

            if cfgt.histogram_interval_iter and iteration % cfgt.histogram_interval_iter == 0:
                timer.log("histogram")
                alive = np.asarray(self.state.alive)
                self.logger.add_histogram(
                    "Opacity", np.asarray(M.get_opacity(self.params))[alive, 0], iteration)
                self.logger.add_histogram(
                    "Scaling", np.asarray(M.get_scaling(self.params))[alive], iteration)

            save_iters = cfgt.save_iterations or []
            if iteration in save_iters or (cfgt.save_interval_iter
                                           and iteration % cfgt.save_interval_iter == 0):
                timer.log("point cloud saving")
                self.savePLY(f"{self.output_dir}/point_cloud/{iteration}.ply")

            ckpt_iters = cfgt.checkpoint_iterations or []
            if iteration in ckpt_iters or (cfgt.ckpt_interval_iter
                                           and iteration % cfgt.ckpt_interval_iter == 0):
                timer.log("checkpoint saving")
                self.save_ckpt(f"{self.output_dir}/ckpt/{iteration}.ckpt")

            if iteration in (cfgt.save_glb_iterations or []):
                timer.log("GLB saving")
                self.saveGLB(f"{self.output_dir}/glb/{iteration}.glb")

            timer.stop()

        self.logger.info(timer.message())
        self.logger.info("Training finished")

    # ------------------------------------------------------------------
    # eval
    # ------------------------------------------------------------------
    def _evaluate(self, iteration: int, compute_lpips: bool | None = None):
        cfgt = self.config.trainer
        bg_name = cfgt.eval_background or "black"
        background = jnp.asarray(get_color_tensor(bg_name, self._rng))
        eval_mask = True if cfgt.eval_alpha_mask is None else bool(cfgt.eval_alpha_mask)
        if compute_lpips is None:
            compute_lpips = bool(cfgt.eval_lpips)

        psnrs, ssims, lpips_vals = [], [], []
        test_cams = list(self.dataset.getTestDataset())
        n_img = self.config.trainer.eval_save_img_count or 3

        def score(i, camera, img, psnr, ssim_val):
            psnrs.append(float(psnr))
            ssims.append(float(ssim_val))
            if compute_lpips:
                lpips_vals.append(self._lpips(np.asarray(img),
                                              np.asarray(camera.gt_image)))
            if i < n_img:
                self.logger.add_image(f"Pred {i}", np.asarray(img), iteration)

        dp_ok = (self._mesh is not None and len(test_cams) > 1 and
                 len({(c.image_width, c.image_height) for c in test_cams}) == 1)
        if dp_ok:
            from ..parallel.mesh import dp_eval_scores
            for i, cam, img, psnr, ssim_val in dp_eval_scores(
                    self._mesh, self._eval_step_dp,
                    self._settings_for(test_cams[0]), self.params,
                    self.state, test_cams, background, eval_mask,
                    cameras_per_device=self._dp_b):
                score(i, cam, img, psnr, ssim_val)
        else:
            for i, camera in enumerate(test_cams):
                settings = self._settings_for(camera)
                img, psnr, ssim_val = self._eval_step(
                    settings, self.params, self.state, camera.strip_static(),
                    background, eval_mask)
                score(i, camera, img, psnr, ssim_val)

        msg = (f"[ITER {iteration}] Eval PSNR: {np.mean(psnrs):.3f}, "
               f"SSIM: {np.mean(ssims):.3f}")
        if lpips_vals:
            msg += f", LPIPS: {np.mean(lpips_vals):.3f}"
        msg += (f", views: {len(psnrs)}, "
                f"triangles: {int(self.state.alive.sum())}")
        self.logger.info(msg)
        self.logger.add_scalar("Average PSNR", float(np.mean(psnrs)), iteration)
        self.logger.add_scalar("Average SSIM", float(np.mean(ssims)), iteration)
        if lpips_vals:
            self.logger.add_scalar("Average LPIPS", float(np.mean(lpips_vals)), iteration)
        return float(np.mean(psnrs))

    _lpips_model = None

    def _lpips(self, img: np.ndarray, gt: np.ndarray) -> float:
        """VGG LPIPS in JAX (trainers/lpips.py); requires pretrained weights
        exported to npz (reference metric: trainer_utils.py:349-352)."""
        try:
            from .lpips import lpips
            return float(lpips(jnp.clip(jnp.asarray(img), 0, 1), gt))
        except Exception as e:  # pragma: no cover - environment dependent
            self.logger.warnOnce(f"LPIPS unavailable: {e}")
            return float("nan")

    def evaluate(self):
        return self._evaluate(0)

    # ------------------------------------------------------------------
    # IO
    # ------------------------------------------------------------------
    def _alive_arrays(self):
        alive = np.asarray(self.state.alive)
        vertex = np.asarray(self.params.vertex)[alive]
        opacity = np.asarray(self.params.opacity)[alive]
        shs = np.asarray(M.get_features(self.params))[alive]
        return vertex, opacity, shs.reshape(len(vertex), -1)

    def toRawTriangle(self, bbox_filtering: bool = True) -> RawTriangle:
        vertex, opacity, shs = self._alive_arrays()
        if bbox_filtering and self.scene_bbox is not None:
            bbox = np.asarray(self.scene_bbox, np.float32).reshape(-1)
            xyz = vertex.mean(1)
            if bbox.size == 4:
                keep = np.all((xyz[:, :2] >= bbox[:2]) & (xyz[:, :2] <= bbox[2:]), -1)
            else:
                keep = np.all((xyz >= bbox[:3]) & (xyz <= bbox[3:]), -1)
            vertex, opacity, shs = vertex[keep], opacity[keep], shs[keep]
        thr = self.model_cfg.ste_threshold
        if thr is not None:
            sig = 1 / (1 + np.exp(-opacity[:, 0]))
            keep = sig > thr
            vertex, shs = vertex[keep], shs[keep]
            opacity = np.full((keep.sum(), 1), 10.0, np.float32)
        return RawTriangle(vertex, opacity, shs)

    def savePLY(self, path, bbox_filtering: bool = True):
        self.logger.info(f"Saving triangles to {path}")
        self.toRawTriangle(bbox_filtering).savePLY(path, save_extra=True)

    def saveGLB(self, path, bbox_filtering: bool = True):
        self.logger.info(f"Saving mesh to {path}")
        self.toRawTriangle(bbox_filtering).saveGLB(
            path, save_back=not self.model_cfg.back_culling)

    def loadPLY(self, path):
        raw = RawTriangle(ply_path=path)
        n = len(raw)
        K = (self.model_cfg.max_sh_degree + 1) ** 2
        shs = raw.shs.reshape(n, -1, 3)
        feats = np.zeros((n, K, 3), np.float32)
        take = min(K, shs.shape[1])
        feats[:, :take] = shs[:, :take]
        cap = M._round_up(n, 256)

        def pad(x):
            return np.concatenate([x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])

        self.params = M.TriangleParams(
            vertex=jnp.asarray(pad(raw.vertex)),
            opacity=jnp.asarray(pad(raw.opacity)),
            f_dc=jnp.asarray(pad(feats[:, :1])),
            f_rest=jnp.asarray(pad(feats[:, 1:])))
        if self.model_cfg.use_color_affine:
            self.params = M.setup_color_affine(
                self.params, self.dataset.getTrainDatasetSize())
        self.state = M.TriangleState.create(cap)
        self.state = replace(self.state, alive=jnp.asarray(np.arange(cap) < n))
        self.opt = M.AdamState.create(self.params)
        self.logger.info(f"Loaded {n} triangles from {path}")

    def save_ckpt(self, path):
        self.logger.info(f"Saving checkpoint to {path}")
        from ..utils.checkpoint import save_ckpt
        blob = dict(
            params=jax.tree_util.tree_map(lambda x: None if x is None else np.asarray(x), self.params),
            opt=jax.tree_util.tree_map(lambda x: None if x is None else np.asarray(x), self.opt),
            state=jax.tree_util.tree_map(lambda x: None if x is None else np.asarray(x), self.state),
            scene_bbox=self.scene_bbox)
        save_ckpt(path, blob, self.config.trainer.ckpt_format or "pickle")

    def load_ckpt(self, path):
        from ..utils.checkpoint import load_ckpt
        blob = load_ckpt(path)
        to_dev = lambda x: None if x is None else jnp.asarray(x)
        self.params = jax.tree_util.tree_map(to_dev, blob["params"])
        self.opt = jax.tree_util.tree_map(to_dev, blob["opt"])
        self.state = jax.tree_util.tree_map(to_dev, blob["state"])
        self.scene_bbox = blob.get("scene_bbox")
        self.logger.info(f"Restored checkpoint {path} "
                         f"({int(self.state.alive.sum())} triangles)")
