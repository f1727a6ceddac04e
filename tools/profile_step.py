"""Profile a FULL VanillaTS train step (rasterize + SH + losses + Adam).

Complements tools/profile_bench.py (rasterize fwd+bwd only): builds a
synthetic 800² scene with a 100k direct init (densification off, the
NerfSynthetic_VanillaTS.yaml recipe), trains a few dozen steps through the
real trainer with the jax.profiler window enabled, and prints the same
bucketed per-op device-time decomposition.

Usage (real chip):  python tools/profile_step.py [--root /root/ts_profstep]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_bench import parse_trace, BUCKETS  # noqa: E402  (same dir)
from collections import defaultdict  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/ts_profstep")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--n_tri", type=int, default=100_000)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--warm", type=int, default=30,
                    help="iterations before the profile window opens")
    ap.add_argument("--window", type=int, default=20,
                    help="profiled iterations")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()

    from triangle_splatting_tpu.utils.testing import (
        build_synthetic_nerf_dataset)

    data_dir = os.path.join(args.root, "data")
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        print(f"[profile_step] building dataset ({args.views} views @ "
              f"{args.res}^2)", flush=True)
        build_synthetic_nerf_dataset(
            data_dir, res=args.res, n_tri=args.n_tri, n_train=args.views,
            n_test=2, impl="pallas", pcd_points=args.n_tri, pcd_noise=0.05)

    from triangle_splatting_tpu.utils.config import loadConfig
    cfg = loadConfig(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "NerfSynthetic_VanillaTS.yaml"))
    cfg.dataset.local_dir = data_dir
    cfg.dataset.num_workers = 2
    cfg.trainer.output_dir = os.path.join(args.root, "out")
    cfg.trainer.iterations = args.warm + args.window + 5
    cfg.trainer.use_tensorboard = False
    cfg.trainer.initial_eval = False
    cfg.trainer.eval_interval_iter = 10 ** 9
    cfg.trainer.seed = 0
    cfg.trainer.profile_start_iter = args.warm
    cfg.trainer.profile_end_iter = args.warm + args.window

    from triangle_splatting_tpu.trainers import build_trainer
    trainer = build_trainer(cfg, log_file=False)
    t0 = time.time()
    trainer.train()
    print(f"[profile_step] trained {cfg.trainer.iterations} iters in "
          f"{time.time() - t0:.0f}s (incl. compile)", flush=True)

    trace_dir = os.path.join(args.root, "out", "profile")
    op_ns, path = parse_trace(trace_dir)
    total_ms = sum(op_ns.values()) / 1e6
    print(f"\ndevice total {total_ms:.2f} ms over {args.window} steps "
          f"({total_ms / args.window:.2f} ms/step) from {path}\n")

    bucket_ns = defaultdict(int)
    for name, ns in op_ns.items():
        for bname, pred in BUCKETS:
            if pred(name):
                bucket_ns[bname] += ns
                break
        else:
            bucket_ns["other"] += ns
    print("=== buckets (ms/step) ===")
    for bname, ns in sorted(bucket_ns.items(), key=lambda kv: -kv[1]):
        print(f"  {ns / 1e6 / args.window:7.3f}  {bname}")

    print(f"\n=== top {args.top} ops (ms/step) ===")
    for name, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ns / 1e6 / args.window:7.3f}  {name[:100]}")


if __name__ == "__main__":
    main()
