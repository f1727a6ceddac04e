"""Dump the compiled (post-optimization) HLO of the FULL VanillaTS train
step and print a table mapping hot op names to source locations.

Complements tools/dump_bench_hlo.py (rasterize fwd+bwd only): the names it
prints line up with tools/profile_step.py's per-op device-time table, so a
`fusion.7  1.16 ms` profile row can be attributed to a source line.

Usage (real chip): python tools/dump_step_hlo.py [--root /root/ts_profstep]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/ts_profstep",
                    help="profile_step-style root holding data/ (built if "
                    "missing)")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--n_tri", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    args = ap.parse_args()

    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp

    data_dir = os.path.join(args.root, "data")
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        from triangle_splatting_tpu.utils.testing import (
            build_synthetic_nerf_dataset)
        build_synthetic_nerf_dataset(
            data_dir, res=args.res, n_tri=args.n_tri, n_train=12, n_test=2,
            impl="pallas", pcd_points=args.n_tri, pcd_noise=0.05)

    from triangle_splatting_tpu.utils.config import loadConfig
    cfg = loadConfig(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "NerfSynthetic_VanillaTS.yaml"))
    cfg.dataset.local_dir = data_dir
    cfg.dataset.num_workers = 0
    cfg.trainer.output_dir = os.path.join(args.root, "out_hlo")
    cfg.trainer.use_tensorboard = False
    cfg.trainer.initial_eval = False
    cfg.trainer.seed = 0

    from triangle_splatting_tpu.trainers import build_trainer
    trainer = build_trainer(cfg, log_file=False)
    trainer._init_model()
    trainer._track_stats = (trainer._mu is not None
                            and trainer._mu.statistic is not None)
    cam = trainer.dataset.nextTrainData().strip_static()
    settings = trainer._settings_for(cam)
    sched = trainer._pack.pack(trainer._loss_weights(1), trainer._lrs(1),
                               jnp.zeros(3), 1)
    step = type(trainer)._train_step.__wrapped__
    fn = lambda p, o, s, c, sc, ni: step(trainer, settings, p, o, s, c,
                                         sc, ni)
    compiled = jax.jit(fn).lower(trainer.params, trainer.opt, trainer.state,
                                 cam, sched, None).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    want = re.compile(r"%(fusion\.\d+|\w*_fusion\.?\d*|sort\.\d+|copy\.\d+|"
                      r"while\.\d+|jvp__\.?\d*|transpose_jvp___\.?\d*|"
                      r"concatenate\.\d+|pad\.\d+|slice\.\d+) = ")
    for line in txt.splitlines():
        m = want.search(line)
        if not m:
            continue
        name = m.group(1)
        shape = line.split("=", 1)[1].strip().split(" fusion(")[0][:60]
        op = re.search(r'op_name="([^"]+)"', line)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        print(f"{name:28s} {shape:60s} "
              f"{op.group(1)[:60] if op else '':60s} "
              f"{(src.group(1).split('/')[-1] + ':' + src.group(2)) if src else ''}")


if __name__ == "__main__":
    main()
