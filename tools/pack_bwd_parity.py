"""On-chip parity check: pack_pair_fields custom VJP (owner-sort +
segment_reduce_pairs) vs the plain scatter-add transpose, at bench scale.

The CPU suite proves the same equivalence in interpret mode at small P
(tests/test_streams.py::TestPackBackward); this tool proves the MOSAIC
lowering of segment_reduce_pairs at realistic shapes — the class of bug
the CPU suite cannot see (CLAUDE.md).

Run: python tools/pack_bwd_parity.py  (TS_PACK_PERM=1 exercises the
forward-hoisted owner-permutation backward instead of the sort path)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from triangle_splatting_tpu.utils.jax_setup import setup

setup()

from triangle_splatting_tpu.ops.binning import bin_triangles
from triangle_splatting_tpu.ops.projection import RasterSettings, preprocess_2d
from triangle_splatting_tpu.ops.rasterize import (pack_pair_fields,
                                                  triangle_field_matrix)
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene


def main():
    P, W, H = 100_000, 800, 800
    max_pairs = 128 * 4096
    settings = RasterSettings(image_width=W, image_height=H)
    cam = make_camera(W, H, 60.0)
    s = make_random_scene(P, seed=3)
    opac = jnp.asarray(s["opacity"]).reshape(-1)

    @jax.jit
    def grads(vertex, rgb, ct):
        prep = preprocess_2d(vertex, jnp.zeros((P, 2)), rgb, cam.world_view,
                             cam.full_proj, cam.tan_fovx, cam.tan_fovy,
                             settings)
        from triangle_splatting_tpu.ops import rasterize as R
        binning = bin_triangles(prep, settings, max_pairs=max_pairs,
                                compute_pack_perm=R.PACK_PERM)
        fmat = triangle_field_matrix(prep, opac)
        _, vjp = jax.vjp(lambda f: pack_pair_fields(f, binning), fmat)
        got = vjp(ct)[0]
        # Plain transpose of [gather rows; mask; transpose]:
        rows = jnp.where(binning.pair_valid[:, None], ct.T, 0.0)
        want = jnp.zeros((P, 16), jnp.float32).at[
            jnp.maximum(binning.pair_tri, 0)].add(rows)
        return got, want, binning.num_pairs, binning.overflow

    rng = np.random.default_rng(0)
    v = jnp.asarray(s["vertex"])
    c = jnp.asarray(s["rgb"])
    ma = None
    # ct shape needs the aligned capacity; probe once.
    from triangle_splatting_tpu.ops.binning import aligned_capacity
    ma = aligned_capacity(max_pairs, settings.num_tiles, 128)
    ct = jnp.asarray(rng.normal(size=(16, ma)).astype(np.float32))

    got, want, npairs, ovf = jax.block_until_ready(grads(v, c, ct))
    got, want = np.asarray(got), np.asarray(want)
    denom = np.maximum(np.abs(want), 1e-3)
    rel = np.abs(got - want) / denom
    print(f"num_pairs={int(npairs)} overflow={bool(ovf)}")
    print(f"max_abs_diff={np.abs(got - want).max():.3e}  "
          f"max_rel(|w|>1e-3)={rel.max():.3e}  "
          f"mean_abs={np.abs(got - want).mean():.3e}")
    assert np.abs(got - want).max() < 5e-4, "pack backward mismatch"
    print("OK")


if __name__ == "__main__":
    main()
