"""Sweep blend tile shapes on the bench workload (fwd+bwd @800^2/100k).

Re-run whenever the per-pair pipeline cost changes materially: the optimal
tile shape balances kernel vector work (~ pairs * npix) against the
pair-count-scaled XLA ops (sort/gather/expansion ~ pairs). PERF.md records
the history. Usage: python tools/tile_sweep.py [th,tw ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(shapes):
    import jax
    import jax.numpy as jnp
    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    from triangle_splatting_tpu.ops.projection import RasterSettings
    from triangle_splatting_tpu.ops.rasterize import rasterize
    from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
    from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

    P, W = 100_000, 800
    cam = make_camera(W, W)
    s = make_random_scene(P, seed=0, size_range=(0.01, 0.05))
    v = jnp.asarray(s["vertex"])
    o = jnp.asarray(s["opacity"])
    c = jnp.asarray(s["rgb"])
    target = jnp.zeros((3, W, W))

    def make_step(settings):
        @jax.jit
        def fwd_bwd(vertex, opacity, rgb):
            def loss_fn(vertex, opacity, rgb):
                out = rasterize(vertex, opacity, None, cam, settings,
                                gamma=1.0, background=jnp.ones(3),
                                bg_depth=10.0, colors=rgb)
                return jnp.abs(out["render"] - target).mean(), \
                    (out["overflow"], out["num_pairs"])
            (_, aux), g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                             has_aux=True)(vertex, opacity, rgb)
            return g, aux
        return fwd_bwd

    for th, tw in shapes:
        probe = make_step(RasterSettings(image_width=W, image_height=W,
                                         rich_info=False, tile_h=th, tile_w=tw,
                                         pairs_per_triangle=10))
        _, (ov, num_pairs) = jax.block_until_ready(probe(v, o, c))
        assert not bool(ov), (th, tw)
        ppt = adapt_pair_budget(10.0, int(num_pairs), P, False,
                                shrink_if_below=1.0)
        step = make_step(RasterSettings(image_width=W, image_height=W,
                                        rich_info=False, tile_h=th, tile_w=tw,
                                        pairs_per_triangle=ppt))
        g, (ov, np_) = jax.block_until_ready(step(v, o, c))
        assert not bool(ov), (th, tw)
        n = 20
        t0 = time.time()
        for _ in range(n):
            g = step(v, o, c)
        jax.block_until_ready(g)
        ms = (time.time() - t0) / n * 1000.0
        print(f"tile {th}x{tw}: {ms:7.2f} ms  pairs={int(np_)} "
              f"ppt={ppt}", flush=True)


if __name__ == "__main__":
    shapes = [(32, 32), (16, 32), (32, 16), (16, 16), (8, 32)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    run(shapes)
