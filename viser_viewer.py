"""Interactive viewer CLI — name/CLI-compatible with the reference
``viser_viewer.py`` (the viser dependency is replaced by a self-contained
stdlib HTTP viewer, see triangle_splatting_tpu/viewer.py).

Usage:
    python viser_viewer.py --config config/NerfSynthetic_VanillaTS.yaml \
        --scene lego [--dataset_path ...] [--port 8080]
or directly on a run directory:
    python viser_viewer.py --model_dir outputs/NerfSynthetic/VanillaTS/lego
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--scene", default=None)
    parser.add_argument("--dataset_path", default=None)
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()

    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()

    max_sh, rtype = 3, "2D"
    model_dir = args.model_dir
    if model_dir is None:
        if args.config is None:
            parser.error("provide --model_dir or --config/--scene")
        from triangle_splatting_tpu.utils.config import loadConfig
        config = loadConfig(args.config)
        max_sh = config.model.max_sh_degree or 0
        rtype = config.model.rasterizer_type or "2D"
        out = config.trainer.output_dir
        model_dir = f"{out}/{args.scene}" if args.scene else out

    from triangle_splatting_tpu.viewer import run_viewer
    run_viewer(model_dir, host=args.host, port=args.port,
               max_sh_degree=max_sh, rasterizer_type=rtype)


if __name__ == "__main__":
    main()
