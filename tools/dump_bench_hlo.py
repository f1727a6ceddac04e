"""Dump the compiled (post-optimization) HLO of the bench fwd+bwd and print
a table mapping hot op names to source locations.

Usage: python tools/dump_bench_hlo.py [--out /tmp/bench_hlo_fresh.txt]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_hlo_fresh.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    from triangle_splatting_tpu.ops.projection import RasterSettings
    from triangle_splatting_tpu.ops.rasterize import rasterize
    from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

    P, W = 100_000, 800
    settings = RasterSettings(image_width=W, image_height=W,
                              pairs_per_triangle=4)
    cam = make_camera(W, W)
    s = make_random_scene(P, seed=0, size_range=(0.01, 0.05))
    v = jnp.asarray(s["vertex"])
    o = jnp.asarray(s["opacity"])
    c = jnp.asarray(s["rgb"])
    target = jnp.zeros((3, W, W))

    @jax.jit
    def fwd_bwd(vertex, opacity, rgb):
        def loss_fn(vertex, opacity, rgb):
            out = rasterize(vertex, opacity, None, cam, settings, gamma=1.0,
                            background=jnp.ones(3), bg_depth=10.0, colors=rgb)
            return jnp.abs(out["render"] - target).mean(), out["overflow"]
        (_, ov), g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                        has_aux=True)(vertex, opacity, rgb)
        return g, ov

    compiled = fwd_bwd.lower(v, o, c).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    # Print source mapping for named ops of interest.
    want = re.compile(r"%(fusion\.\d+|slice_reduce_fusion\.\d+|sort\.\d+|"
                      r"copy\.\d+|while\.\d+|jvp__\.\d+|transpose_jvp___\.\d+)"
                      r" = ")
    for line in txt.splitlines():
        m = want.search(line)
        if not m:
            continue
        name = m.group(1)
        shape = line.split("=", 1)[1].strip().split(" fusion(")[0][:60]
        op = re.search(r'op_name="([^"]+)"', line)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        print(f"{name:28s} {shape:62s} "
              f"{op.group(1) if op else '':50s} "
              f"{(src.group(1).split('/')[-1] + ':' + src.group(2)) if src else ''}")


if __name__ == "__main__":
    main()
