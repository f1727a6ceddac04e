"""Real-chip MatrixCity-scale rehearsal: >= 1M-triangle training steps.

VERDICT r4 weak #5: the >= 1M-primitive path was validated only in CPU
interpret mode (tests/test_matrix_city.py); real-chip HBM at 1M capacity
(params + Adam moments + pair buffers + sort scratch) and Mosaic compile
behavior at that shape were arithmetic, not measurement. This tool runs the
REAL VanillaTS train step (the trainer's own jitted _train_step: forward +
losses + backward + Adam + scalar pack) at --capacity triangles on one
chip and reports ms/step, the pair-budget behavior, compile time, and the
device memory high-water.

Reference anchor: config/MatrixCity_VanillaTS_mesh.yaml:29-34 (20M points,
grid 0.007 -> ~1-2M primitives after grid sampling).

Usage (real chip):
    python tools/scale_rehearsal.py --capacity 1000000 --steps 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_mem_stats():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return {}
        return {k: v for k, v in stats.items()
                if "bytes" in k and isinstance(v, int)}
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--sh", type=int, default=3)
    ap.add_argument("--ppt", type=float, default=2.0,
                    help="initial pairs-per-triangle budget (see the "
                    "compile-time note in main)")
    ap.add_argument("--cpu", action="store_true",
                    help="scaled-down CPU rehearsal of the harness itself")
    args = ap.parse_args()

    from triangle_splatting_tpu.utils.jax_setup import setup
    setup(platform="cpu" if args.cpu else None)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from triangle_splatting_tpu.trainers.smoke import make_smoke_config
    from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer
    from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset
    from triangle_splatting_tpu.models import triangle as M

    root = os.environ.get("TS_SCALE_ROOT", "/root/ts_scale")
    data = os.path.join(root, f"data_{args.res}")
    if not os.path.exists(os.path.join(data, "transforms_train.json")):
        print(f"[scale] building {args.views}-view dataset @{args.res}^2",
              flush=True)
        build_synthetic_nerf_dataset(
            data, res=args.res, n_tri=50_000, n_train=args.views, n_test=2,
            impl="oracle" if args.cpu else "pallas", size_range=(0.02, 0.08))

    cfg = make_smoke_config(data, os.path.join(root, "out"), args.steps,
                            densify=False)
    cfg.model.max_sh_degree = args.sh
    # Right-size the pair budget for the dense random init (tiny triangles,
    # ~1-2 pairs each): XLA compile time grows SUPERLINEARLY with the pair
    # buffer length (measured: 1.5M pairs -> 126 s, 2M -> 217 s, 3M ->
    # >6 min, 16M effectively hangs), so the smoke default of 16/triangle
    # at 1M capacity never finishes compiling. PERF.md r5 scale section.
    cfg.model.pairs_per_triangle = args.ppt
    cfg.trainer.eval_interval_iter = 10 ** 9      # pure step timing
    cfg.trainer.log_interval_iter = 20
    trainer = VanillaTSTrainer(cfg, log_file=False)
    trainer._init_model()

    # Re-init at target capacity: spread points over the scene volume so
    # the binning load resembles a dense city block, not a point blob.
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (args.capacity, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (args.capacity, 3)).astype(np.float32)
    t0 = time.time()
    trainer.params, trainer.state = M.create_from_points(
        pts, cols, None, trainer.model_cfg, init_opacity=0.1,
        capacity_factor=1.0)
    trainer.opt = M.AdamState.create(trainer.params)
    init_s = time.time() - t0
    cap = trainer.params.capacity
    param_bytes = sum(
        np.prod(getattr(trainer.params, n).shape) * 4
        for n in ("vertex", "opacity", "f_dc", "f_rest")
        if getattr(trainer.params, n) is not None)
    print(f"[scale] capacity {cap} init {init_s:.1f}s; params "
          f"{param_bytes / 2 ** 20:.0f} MiB x3 (Adam m/v)", flush=True)

    t0 = time.time()
    trainer.train()
    wall = time.time() - t0
    n_budget_events = getattr(trainer, "_ppt_recompiles", None)

    mem = device_mem_stats()
    steady = None
    # steady-state: time 30 more steps through the already-compiled path
    cams = [trainer.dataset.nextTrainData() for _ in range(4)]
    settings = trainer._settings_for(cams[0])
    sched = trainer._pack.pack(trainer._loss_weights(args.steps),
                               trainer._lrs(args.steps), jnp.ones(3),
                               args.steps)
    p, o, st = trainer.params, trainer.opt, trainer.state
    out = trainer._train_step(settings, p, o, st,
                              cams[0].strip_static(), sched, None)
    jax.block_until_ready(out)
    p, o, st = out[0], out[1], out[2]
    t0 = time.time()
    n = 30
    for i in range(n):
        out = trainer._train_step(settings, out[0], out[1], out[2],
                                  cams[i % 4].strip_static(), sched, None)
    jax.block_until_ready(out)
    steady = (time.time() - t0) / n * 1000.0

    print(json.dumps({
        "metric": "scale_rehearsal_ms_per_step",
        "capacity": cap, "res": args.res, "steps": args.steps,
        "value": round(steady, 2), "unit": "ms",
        "wall_s_train": round(wall, 1),
        "ppt": trainer._ppt,
        "hbm_peak_bytes": mem.get("peak_bytes_in_use"),
        "hbm_now_bytes": mem.get("bytes_in_use"),
        "budget_events": n_budget_events,
    }), flush=True)


if __name__ == "__main__":
    main()
