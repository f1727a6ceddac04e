"""Full-length training run at reference scale (VERDICT r1 item #3).

Replays the real ``config/NerfSynthetic_VanillaTS.yaml`` semantics on a
synthetic scene: direct init from a 100k-point cloud (the reference's
NeRF-Synthetic recipe trains a FIXED count — its statistic/densification
blocks are commented out, /root/reference/config/NerfSynthetic_VanillaTS.yaml:72-100),
30k iters @ 800x800, SH up-degree at 4k/10k/16k, eval every 2k.

``--adc`` instead runs the long-horizon ADC rehearsal: starts from a
20k-point init with the smoke-style statistic/densification/opacity_pruning
blocks enabled and scaled to ``--iters``, proving capacity
growth/recompile cadence + pair-budget growth over thousands of steps
(the reference exercises ADC in its MipNerf360/MatrixCity recipes).

Usage (real chip):
    python tools/full_run.py --root /root/ts_fullrun          # 30k photo
    python tools/full_run.py --adc --iters 10000 --root /root/ts_adcrun
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/ts_fullrun")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--iters", type=int, default=30_000)
    ap.add_argument("--n_tri", type=int, default=100_000,
                    help="GT triangles in the synthetic scene")
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--init_points", type=int, default=100_000)
    ap.add_argument("--adc", action="store_true",
                    help="ADC rehearsal: 20k init + densify/prune enabled")
    ap.add_argument("--model", default="ts", choices=["ts", "gs"],
                    help="--adc primitive: ts = VanillaTS triangles, "
                    "gs = VanillaGS gaussians (long-horizon validation of "
                    "the custom-gaussian-rasterization equivalent)")
    ap.add_argument("--mesh", action="store_true",
                    help="mesh/solidify rehearsal: NerfSynthetic_VanillaTS_"
                    "mesh.yaml semantics (3D rasterizer, gamma 1->50, STE, "
                    "contribution/scale pruning, GLB export) with the "
                    "solidify/lr windows scaled to --iters (reference: 60k "
                    "total, solidify 20k-40k)")
    ap.add_argument("--grad_threshold", type=float, default=1.5e-4,
                    help="--adc densify threshold (the densify log prints "
                    "the observed grad-stat quantiles to set this from)")
    ap.add_argument("--gt", default="pallas", choices=["pallas", "oracle"],
                    help="rasterizer that renders the dataset's GT images: "
                    "'oracle' uses the dense jax.numpy reference path, "
                    "de-circularizing the score (the production Pallas "
                    "kernels are then only on the TRAINING side; a shared "
                    "forward bug can no longer cancel out). Each choice "
                    "gets its own dataset dir.")
    ap.add_argument("--geo_samples", type=int, default=100_000,
                    help="--mesh: surface samples per side for the "
                    "chamfer/F-score geometry metrics")
    ap.add_argument("--scene", default="soup", choices=["soup", "surface"],
                    help="GT scene: 'soup' = floating semi-transparent "
                    "random triangles (photo stress test), 'surface' = "
                    "bumpy opaque closed surface — the realistic "
                    "mesh/solidify target (an opaque mesh CAN represent "
                    "it, so solidify scores measure the pipeline instead "
                    "of the scene's transparency)")
    ap.add_argument("--ckpt_every", type=int, default=5000,
                    help="checkpoint cadence (0 disables)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the newest checkpoint in --root/out")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (scaled-down rehearsals)")
    args = ap.parse_args()

    from triangle_splatting_tpu.utils.jax_setup import setup
    setup(platform="cpu" if args.cpu else None)

    from triangle_splatting_tpu.utils.testing import (
        build_synthetic_nerf_dataset)

    suffix = "" if args.gt == "pallas" else f"_{args.gt}"
    if args.scene != "soup":
        suffix += f"_{args.scene}"
    data_dir = os.path.join(args.root, "data" + suffix)
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        print(f"[full_run] building synthetic dataset ({args.views} views @ "
              f"{args.res}^2, {args.n_tri} GT triangles, gt={args.gt}, "
              f"scene={args.scene}) in {data_dir}", flush=True)
        t0 = time.time()
        build_synthetic_nerf_dataset(
            data_dir, res=args.res, n_tri=args.n_tri, n_train=args.views,
            n_test=8, impl=args.gt, scene_kind=args.scene,
            pcd_points=(20_000 if args.adc else args.init_points),
            pcd_noise=0.05)
        print(f"[full_run] dataset built in {time.time() - t0:.0f}s",
              flush=True)

    if args.mesh:
        from triangle_splatting_tpu.utils.config import loadConfig
        cfg = loadConfig(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "config", "NerfSynthetic_VanillaTS_mesh.yaml"))
        # Scale every iteration window by iters/60k (reference total;
        # solidify 20k-40k, lr decay over 20k) so a shorter rehearsal keeps
        # the reference's phase structure.
        sc = args.iters / 60_000.0
        s = lambda v: max(1, int(round(v * sc)))
        for name in ("vertex", "opacity", "f_dc", "f_rest", "color_affine"):
            opt = getattr(cfg.model.optimizer, name)
            opt.delay_steps = s(opt.delay_steps)
            opt.max_steps = s(opt.max_steps)
        mu = cfg.model.model_update
        mu.statistic.start_iter = s(mu.statistic.start_iter)
        mu.statistic.end_iter = s(mu.statistic.end_iter)
        for blk in (mu.scale_pruning, mu.contribution_pruning):
            blk.start_iter = s(blk.start_iter)
            blk.end_iter = s(blk.end_iter)
        mu.gamma_schedule.start_iter = s(mu.gamma_schedule.start_iter)
        mu.gamma_schedule.end_iter = s(mu.gamma_schedule.end_iter)
        mu.sh_schedule.one_up_iters = [s(v) for v in
                                       mu.sh_schedule.one_up_iters]
        # The yaml ships target_point_num: null as a placeholder the
        # run_experiments presets always override (lego 112k, ...) —
        # pick a target below the scene's natural STE count (~12k on the
        # 100k-GT synthetic) so the pruning path actually exercises.
        mu.contribution_pruning.target_point_num = max(2000,
                                                       args.n_tri // 10)
        cfg.dataset.local_dir = data_dir
        cfg.dataset.num_workers = 2
        cfg.trainer.output_dir = os.path.join(args.root, "out")
        cfg.trainer.iterations = args.iters
        cfg.trainer.use_tensorboard = False
        cfg.trainer.seed = 0
        cfg.trainer.save_iterations = [s(20_000), args.iters]
        cfg.trainer.checkpoint_iterations = [args.iters]
        cfg.trainer.save_glb_iterations = [args.iters]
    elif args.adc:
        from triangle_splatting_tpu.trainers.smoke import make_smoke_config
        cfg = make_smoke_config(data_dir, os.path.join(args.root, "out"),
                                args.iters, densify=True, model=args.model)
        # Reference-like cadence instead of the smoke's iters//8 scaling:
        # densify every 500 from 500 to iters*3/4, prune every 500.
        mu = cfg.model.model_update
        mu.densification.start_iter = 500
        mu.densification.end_iter = args.iters * 3 // 4
        mu.densification.interval_iter = 500
        mu.densification.min_view_count = 10
        mu.opacity_pruning.start_iter = 1000
        mu.opacity_pruning.interval_iter = 500
        # The smoke thresholds (0.0006 -> 0.0003, mirroring the reference's
        # commented-out blocks) never fire at 800² — measured per-view
        # center2D gradient means sit below 5.4e-4 once the 20k init fits
        # the scene — so the growth/recompile machinery this rehearsal
        # exists to prove would go unexercised. Lower them so densify
        # actually grows toward capacity.
        mu.densification.grad_threshold_init = args.grad_threshold
        mu.densification.grad_threshold_final = args.grad_threshold * 2 / 3
        cfg.trainer.eval_interval_iter = 2000
        cfg.trainer.log_interval_iter = 250
        cfg.model.max_sh_degree = 3
        mu.sh_schedule.one_up_iters = [args.iters // 8, args.iters // 4,
                                       args.iters // 2]
    else:
        from triangle_splatting_tpu.utils.config import loadConfig
        cfg = loadConfig(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "config", "NerfSynthetic_VanillaTS.yaml"))
        cfg.dataset.local_dir = data_dir
        cfg.dataset.num_workers = 2
        cfg.trainer.output_dir = os.path.join(args.root, "out")
        cfg.trainer.iterations = args.iters
        cfg.trainer.use_tensorboard = False
        cfg.trainer.seed = 0

    if args.ckpt_every:
        cfg.trainer.ckpt_interval_iter = args.ckpt_every
    if args.resume:
        import glob
        ckpts = sorted(
            (int(os.path.basename(p).split(".")[0]) for p in
             glob.glob(os.path.join(args.root, "out", "ckpt", "*.ckpt"))),
            reverse=True)
        if ckpts:
            cfg.trainer.start_checkpoint = ckpts[0]
            cfg.trainer.clean_output_dir = False   # keep the ckpt dir
            print(f"[full_run] resuming from iteration {ckpts[0]}",
                  flush=True)
        else:
            print("[full_run] --resume: no checkpoint found, starting fresh",
                  flush=True)

    from triangle_splatting_tpu.trainers import build_trainer
    trainer = build_trainer(cfg, log_file=True)
    trainer._init_model()
    psnr0 = float(trainer._evaluate(0))
    print(f"[full_run] init PSNR {psnr0:.2f}, alive "
          f"{int(trainer.state.alive.sum())}", flush=True)
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0
    psnr1 = float(trainer._evaluate(args.iters))

    extra = {}
    if args.mesh:
        extra = mesh_endpoint_metrics(trainer, data_dir, args)

    print(json.dumps({
        "metric": ("full_run_mesh" if args.mesh
                   else "full_run_adc" if args.adc else "full_run_30k"),
        "res": args.res, "iters": args.iters,
        "gt_triangles": args.n_tri,
        "psnr_init": round(psnr0, 2), "psnr_final": round(psnr1, 2),
        "alive_triangles": int(trainer.state.alive.sum()),
        "capacity": int(trainer.state.alive.shape[0]),
        "wall_s": round(wall, 1),
        "ms_per_step_incl_compile": round(wall / args.iters * 1000.0, 2),
        "gt_impl": args.gt,
        **extra,
    }), flush=True)


def mesh_endpoint_metrics(trainer, data_dir, args):
    """Score the exported GLB GEOMETRICALLY (chamfer + F-score vs the GT
    triangle soup the synthetic images were rendered from — the metric
    family the reference's paper judges mesh quality by but its repo never
    computes) and PHOTOMETRICALLY through the independent Moeller-Trumbore
    ray tracer (ops/raytrace.py — no shared code with the splatting
    rasterizers, so the score cannot inherit a family-wide forward bug)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from triangle_splatting_tpu.models.mesh_metrics import mesh_geometry_scores
    from triangle_splatting_tpu.models.raw_triangle import RawTriangle
    from triangle_splatting_tpu.ops.raytrace import raytrace_soup
    from triangle_splatting_tpu.ops.sh import SH2RGB
    from triangle_splatting_tpu.trainers import losses as L

    glb_path = os.path.join(args.root, "out", "glb", f"{args.iters}.glb")
    if not os.path.exists(glb_path):
        trainer.saveGLB(glb_path)
    raw = RawTriangle(glb_path=glb_path)
    gt = np.load(os.path.join(data_dir, "gt_scene.npz"))
    print(f"[full_run] geometry metrics: {len(raw)} exported vs "
          f"{gt['vertex'].shape[0]} GT triangles", flush=True)
    geo = mesh_geometry_scores(raw.vertex, gt["vertex"],
                               n_samples=args.geo_samples, tau=0.05)

    # Independent photometric score: ray-trace the exported opaque mesh
    # against the dataset's held-out GT images.
    cols = jnp.asarray(np.clip(SH2RGB(raw.shs[:, :3]), 0, 1))
    verts = jnp.asarray(raw.vertex)
    settings = trainer._settings_for(list(trainer.dataset.getTestDataset())[0])

    @jax.jit
    def trace_psnr(cam):
        out = raytrace_soup(verts, cols, cam, settings,
                            background=jnp.ones(3))
        return L.psnr(jnp.clip(out["render"], 0, 1), cam.gt_image)

    rt = [float(trace_psnr(cam.strip_static()))
          for cam in trainer.dataset.getTestDataset()]
    print(f"[full_run] raytrace PSNR per view: "
          f"{[round(v, 2) for v in rt]}", flush=True)
    return {"geometry": {k: round(v, 4) for k, v in geo.items()},
            "raytrace_psnr": round(float(np.mean(rt)), 2)}


if __name__ == "__main__":
    main()
