"""Differentiable triangle-splat rasterization — the public op.

Pipeline (TPU-first redesign of diff-triangle-rasterization-2D):

  1. SH -> per-triangle color               jax.numpy, AD        (sh.py)
  2. screen-space preprocess                jax.numpy, AD        (projection.py)
  3. tile binning (sort + ranges)           XLA sort, stop-grad  (binning.py)
  4. gather + pack per-pair fields          XLA gather, AD
  5. per-tile blend                         Pallas custom_vjp    (pallas/blend.py)
  6. per-pair grads -> per-triangle grads   gather's VJP (deterministic
                                            scatter-add; replaces the CUDA
                                            float atomics of backward.cu)

Only stage 5 is hand-written; everything else is standard JAX so the chain
rule through projection/SH (the reference's hand-derived backward.cu:144-263)
comes from AD. The ``impl="oracle"`` path swaps stages 3-5 for the dense
oracle — same semantics, O(P*pixels), used for small scenes and testing.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Pack-VJP cotangent ordering strategy. The backward must group the per-pair
# gradient columns by owning triangle before the streaming segment
# reduction; the ORDER is a pure function of binning, so it can either be
# re-derived in the backward with a (1 + live_rows)-payload sort of the
# cotangents (default), or computed once in the forward/binning phase
# (Binning.pack_perm) and APPLIED in the backward as one row gather.
# TS_PACK_PERM=1 selects the second structure; both are parity-tested
# (tests/test_rasterize.py::TestPackPerm) — flip the default only with an
# on-chip A/B (PERF.md records the measurement).
PACK_PERM = os.environ.get("TS_PACK_PERM", "0") == "1"

from . import sh as sh_mod
from .binning import Binning, bin_triangles
from .oracle import blend_oracle, blend_oracle_3d
from .pallas.blend import (ALIGN, LIVE_GRAD_ROWS, blend_backward,
                           blend_forward)
from .projection import (Preprocessed, Preprocessed3D, RasterSettings,
                         preprocess_2d, preprocess_3d)
from ..utils.camera import Camera


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def triangle_field_matrix(prep: Preprocessed, opacity: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle packed kernel fields (P, 16), differentiable.

    The barycentrics are affine in pixel coordinates:
    ``a1 = cross(v2 - pix, v3 - pix) / area2 = f0 + f1*px + f2*py`` — the
    constant/linear coefficients are precomputed once per triangle so the
    kernel inner loop is two FMAs per (pair, pixel).
    """
    v1, v2, v3 = prep.v1_2d, prep.v2_2d, prep.v3_2d
    area2 = jnp.where(prep.valid, prep.area2, 1.0)
    inv = 1.0 / area2
    f0 = (v2[:, 0] * v3[:, 1] - v2[:, 1] * v3[:, 0]) * inv
    f1 = (v2[:, 1] - v3[:, 1]) * inv
    f2 = (v3[:, 0] - v2[:, 0]) * inv
    f3 = (v3[:, 0] * v1[:, 1] - v3[:, 1] * v1[:, 0]) * inv
    f4 = (v3[:, 1] - v1[:, 1]) * inv
    f5 = (v1[:, 0] - v3[:, 0]) * inv
    rgb, vd, nrm = prep.rgb, prep.v_depth, prep.normal_view
    # Field order groups the rows the kernel feeds to one MXU accumulation
    # matmul (r,g,b,d0,nx,ny,nz contiguous): see pallas/blend.py header.
    fields = jnp.stack([
        f0, f1, f2, f3, f4, f5, opacity,
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
        vd[:, 2],                                  # d0
        nrm[:, 0], nrm[:, 1], nrm[:, 2],
        vd[:, 0] - vd[:, 2], vd[:, 1] - vd[:, 2],  # d1, d2
    ], axis=1)                                               # (P, 16)
    return jnp.where(prep.valid[:, None], fields, 0.0)


def triangle_field_matrix_3d(prep: Preprocessed3D, opacity: jnp.ndarray,
                             tan_fovx, tan_fovy, width: int,
                             height: int) -> jnp.ndarray:
    """Per-triangle packed kernel fields (P, 16) for the 3D variant.

    The ray-plane intersection barycentrics reduce to ratios of affine
    forms in pixel coordinates (see pallas/blend.py header):
    a1 = (r.u1)/(r.n) with u1 = (C23*n - k*(n x (v2-v3))) / n.n, k = v1.n,
    C23 = (v2 x v3).n. Each 3-vector w becomes affine coefficients
    (c0, cx, cy) of r.w over the pixel grid.
    """
    n = prep.normal_view
    v1, v2, v3 = prep.v1_view, prep.v2_view, prep.v3_view
    nn = jnp.sum(n * n, -1)
    inv_nn = 1.0 / jnp.where(prep.valid, jnp.maximum(nn, 1e-20), 1.0)
    k = jnp.sum(v1 * n, -1)
    C23 = jnp.sum(jnp.cross(v2, v3) * n, -1)
    C31 = jnp.sum(jnp.cross(v3, v1) * n, -1)
    u1 = (C23[:, None] * n - k[:, None] * jnp.cross(n, v2 - v3)) * inv_nn[:, None]
    u2 = (C31[:, None] * n - k[:, None] * jnp.cross(n, v3 - v1)) * inv_nn[:, None]

    def affine(w):
        c0 = (w[:, 2] + w[:, 0] * tan_fovx * (1.0 - width) / width
              + w[:, 1] * tan_fovy * (1.0 - height) / height)
        cx = 2.0 * tan_fovx * w[:, 0] / width
        cy = 2.0 * tan_fovy * w[:, 1] / height
        return c0, cx, cy

    d0, dx, dy = affine(n)
    a10, a1x, a1y = affine(u1)
    a20, a2x, a2y = affine(u2)
    rgb = prep.rgb
    fields = jnp.stack([
        d0, dx, dy, a10, a1x, a1y, a20, a2x, a2y, opacity,
        rgb[:, 0], rgb[:, 1], rgb[:, 2], k,
        jnp.zeros_like(k), jnp.zeros_like(k),
    ], axis=1)                                               # (P, 16)
    return jnp.where(prep.valid[:, None], fields, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pack_pair_fields(field_matrix: jnp.ndarray, binning: Binning,
                     interpret: bool = False,
                     live_rows: int = 16) -> jnp.ndarray:
    """ONE gather of the per-triangle field matrix into sorted pair order.

    TPU gathers cost ~10ms/M rows regardless of row width, so packing does a
    single (MA, 16) gather instead of 17 per-column gathers (~5x cheaper).

    The AD transpose would be a (MA,16)->(P,16) scatter-add — measured at
    6.15 ms @480k pairs, the single largest non-kernel op (XLA lowers it as
    sort + serialized combiner). The custom backward instead (a) sorts the
    16 gradient columns by OWNING TRIANGLE (``binning.pair_tri``) — one
    16-payload sort, ~2.9 ms — after which triangle t's pairs occupy
    exactly [tri_offsets[t], tri_offsets[t+1]) (position is fixed by the
    per-triangle pair counts alone; within-triangle order is irrelevant to
    a sum); then (b) runs the windowed streaming segment reduction
    ``pallas/streams.py:segment_reduce_pairs`` (monotone segment bounds,
    MXU one-hot accumulation — no gather/scatter).

    NEGATIVE RESULT (measured twice, r2): the same substitution in pure XLA
    (sort-by-triangle + cumsum + boundary-gather) is SLOWER end to end —
    38.7 / 38.2 ms vs 37.1 baseline — because XLA's row gather is as
    latency-bound as its scatter (~3.2 ms per 480k rows) and the (MA, 16)
    cumsum adds two more full passes. The Pallas streaming kernel is what
    makes the sorted form pay.

    ``live_rows``: static count of leading cotangent rows that can be
    nonzero. The blend backward emits structurally-zero gradient rows for
    fields no output consumed (e.g. depth/normal coefficient rows 10-15
    when ``rich_info=False`` — pallas/blend.py ``_bwd_kernel`` builds gmat
    with explicit zero blocks there), and sort payload columns are NOT free
    beyond the first two (PERF.md cost model: ~0.13 ms/payload @480k), so
    the backward sorts only the live rows and feeds literal zeros for the
    rest.
    """
    rows = field_matrix[jnp.maximum(binning.pair_tri, 0)]    # (MA, 16)
    rows = jnp.where(binning.pair_valid[:, None], rows, 0.0)
    return rows.T                                            # (16, MA)


def _pack_fwd(field_matrix, binning, interpret, live_rows):
    return pack_pair_fields(field_matrix, binning, interpret, live_rows), \
        binning


def _pack_bwd(interpret, live_rows, binning, d):
    from .pallas.streams import segment_reduce_pairs
    num_pairs = binning.num_pairs
    p = binning.tri_offsets.shape[0] - 1
    zero = jnp.zeros_like(d[0])
    if binning.pack_perm is not None:
        # The owner-order permutation was computed in the forward phase
        # (Binning.pack_perm) — apply it as ONE (MA, live) row gather.
        # Rows past num_pairs gather empty-slot garbage/NaN; the
        # reduction's nvalid select zeroes them.
        g = d[:live_rows].T[binning.pack_perm]               # (MA, live)
        cols = [g[:, i] for i in range(live_rows)]
    else:
        # Sort cotangent columns by owning triangle: valid slots land at
        # positions [tri_offsets[t], tri_offsets[t+1]) (counts fix
        # positions; within-triangle order is irrelevant to a sum). Empty
        # slots get sentinel ``p`` and sort to the tail at positions >=
        # num_pairs, where the segment bounds (clipped to num_pairs) never
        # reach them and the kernel's nvalid select zeroes their (possibly
        # NaN) columns. Only the ``live_rows`` leading rows ride the sort
        # as payloads — the rest are structural zeros of the blend backward
        # (see docstring).
        key = jnp.where(binning.pair_tri >= 0, binning.pair_tri, p)
        srt = jax.lax.sort((key,) + tuple(d[:live_rows]), num_keys=1,
                           is_stable=False)
        cols = list(srt[1:])
    starts = jnp.minimum(binning.tri_offsets[:-1], num_pairs)
    ends = jnp.minimum(binning.tri_offsets[1:], num_pairs)
    cols = cols + [zero] * (16 - live_rows)
    d16 = segment_reduce_pairs(cols, starts, ends,
                               nvalid=num_pairs,
                               interpret=interpret)          # (16, P)
    d_binning = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), binning)
    return d16.T, d_binning


pack_pair_fields.defvjp(_pack_fwd, _pack_bwd)


# ---------------------------------------------------------------------------
# custom_vjp around the Pallas blend
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _blend(fields, tile_starts, tile_counts, params, static_cfg):
    width, height, tile_h, tile_w, rich, variant, interpret, stats = static_cfg
    return blend_forward(fields, tile_starts, tile_counts, params,
                         image_width=width, image_height=height,
                         tile_h=tile_h, tile_w=tile_w, rich=rich,
                         variant=variant, stats=stats, interpret=interpret)


def _blend_fwd(fields, tile_starts, tile_counts, params, static_cfg):
    outs = _blend(fields, tile_starts, tile_counts, params, static_cfg)
    color, depth, normal, final_T, n_contrib, pair_contrib = outs
    return outs, (fields, tile_starts, tile_counts, params, final_T, n_contrib)


def _blend_bwd(static_cfg, res, cts):
    width, height, tile_h, tile_w, rich, variant, interpret, _stats = static_cfg
    fields, tile_starts, tile_counts, params, final_T, n_contrib = res
    g_color, g_depth, g_normal, g_T, _g_nc, _g_pc = cts
    pair_grads = blend_backward(
        fields, tile_starts, tile_counts, params, final_T, n_contrib,
        g_color, g_depth, g_normal, g_T,
        image_width=width, image_height=height, tile_h=tile_h, tile_w=tile_w,
        rich=rich, variant=variant, interpret=interpret)
    zero_starts = np.zeros(tile_starts.shape, jax.dtypes.float0)
    zero_counts = np.zeros(tile_counts.shape, jax.dtypes.float0)
    return pair_grads, zero_starts, zero_counts, jnp.zeros_like(params)


_blend.defvjp(_blend_fwd, _blend_bwd)


def _contrib_stats(pair_contrib: jnp.ndarray, binning: Binning, P: int,
                   interpret: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-triangle (contrib_sum, contrib_max) from per-pair contributions.

    Reproduces the forward-kernel atomics of the reference
    (2D/src/forward.cu:320-330: ``contrib_sum += alpha*T`` via atomicAdd,
    ``contrib_max`` via atomicMaxFloat) as an owner-sort + windowed
    streaming segment reduction — the jax.ops.segment_sum/segment_max pair
    lowers to two per-row-priced XLA scatters over the whole pair buffer
    (PERF.md cost model), while a 2-payload sort + the Pallas kernel
    streams at slab granularity. Exact under overflow for the same reason
    as the pack backward (binning.tri_offsets comment).
    """
    from .pallas.streams import segment_reduce_stats
    pc = jax.lax.stop_gradient(pair_contrib)                 # (2, MA)
    key = jnp.where(binning.pair_valid, binning.pair_tri, P)
    _, s_sum, s_max = jax.lax.sort((key, pc[0], pc[1]), num_keys=1,
                                   is_stable=False)
    starts = jnp.minimum(binning.tri_offsets[:-1], binning.num_pairs)
    ends = jnp.minimum(binning.tri_offsets[1:], binning.num_pairs)
    return segment_reduce_stats(s_sum, s_max, starts, ends,
                                nvalid=binning.num_pairs, interpret=interpret)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def rasterize(vertex: jnp.ndarray, opacity: jnp.ndarray,
              shs: Optional[jnp.ndarray], camera: Camera,
              settings: RasterSettings, *, gamma=1.0,
              background=None, bg_depth=5000.0, active_sh_degree=0,
              center2d_offset: Optional[jnp.ndarray] = None,
              colors: Optional[jnp.ndarray] = None,
              alive_mask: Optional[jnp.ndarray] = None,
              impl: str = "pallas", max_pairs: Optional[int] = None,
              need_stats: bool = True, interpret: bool = False) -> dict:
    """Render triangles through a camera; differentiable w.r.t.
    vertex / opacity / shs (or colors) / center2d_offset.

    Mirrors ``TriangleRenderer.render`` (renderer/triangle_renderer.py:59-95)
    plus the rasterizer internals. Returns a dict with:
    render (3,H,W), depth (H,W), normal (3,H,W), radii (P,), visible_mask,
    contrib_sum (P,), contrib_max (P,), final_T, n_contrib, overflow.

    ``need_stats=False`` (photo training without a statistic window, eval,
    bench — the paths whose jit graphs DCE the statistics consumers anyway)
    skips the contribution-statistics work the reference's forward kernel
    performs unconditionally via atomics (2D/src/forward.cu:320-330): the
    in-kernel per-pair reductions + DMA stream and the owner-sort/segment
    reduction; ``contrib_sum``/``contrib_max`` are then zeros.
    """
    P = vertex.shape[0]
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    background = jnp.asarray(background, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)
    bg_depth = jnp.asarray(bg_depth, jnp.float32)
    if center2d_offset is None:
        center2d_offset = jnp.zeros((P, 2), jnp.float32)

    if colors is not None:
        rgb = colors
    else:
        center = vertex.mean(axis=1)
        rgb = sh_mod.eval_sh(shs, center, camera.camera_center,
                             active_sh_degree, settings.max_sh_degree)

    opac1 = opacity[..., 0] if opacity.ndim == 2 else opacity
    variant = settings.rasterizer_type
    pre_fn = preprocess_2d if variant == "2D" else preprocess_3d
    prep = pre_fn(vertex, center2d_offset, rgb, camera.world_view,
                  camera.full_proj, camera.tan_fovx, camera.tan_fovy,
                  settings, alive_mask=alive_mask,
                  opacity=opac1, gamma=gamma)

    if impl == "oracle":
        if variant == "2D":
            out = blend_oracle(prep, opac1, gamma, background, bg_depth,
                               settings)
        else:
            out = blend_oracle_3d(prep, opac1, gamma, background, bg_depth,
                                  camera.tan_fovx, camera.tan_fovy, settings)
        return dict(render=out.color, depth=out.depth, normal=out.normal,
                    radii=prep.radii, visible_mask=prep.radii > 0,
                    contrib_sum=out.contrib_sum, contrib_max=out.contrib_max,
                    final_T=out.final_T, n_contrib=out.n_contrib,
                    overflow=jnp.asarray(False), num_pairs=jnp.int32(0))

    if max_pairs is None:
        max_pairs = _round_up(int(settings.pairs_per_triangle * P), ALIGN)

    # Pallas TPU kernels only run interpreted on the CPU backend (tests,
    # virtual multi-chip meshes) — switch automatically.
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    prep_ng = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    binning = bin_triangles(prep_ng, settings, max_pairs, align=ALIGN,
                            interpret=interpret, compute_pack_perm=PACK_PERM)

    if variant == "2D":
        fmat = triangle_field_matrix(prep, opac1)
        sx = sy = jnp.zeros((), jnp.float32)
    else:
        fmat = triangle_field_matrix_3d(prep, opac1, camera.tan_fovx,
                                        camera.tan_fovy, settings.image_width,
                                        settings.image_height)
        sx = settings.image_width / (2.0 * camera.tan_fovx)
        sy = settings.image_height / (2.0 * camera.tan_fovy)
    fields = pack_pair_fields(fmat, binning, interpret,
                              LIVE_GRAD_ROWS[(variant, settings.rich_info)])
    params = jnp.concatenate([gamma[None], background, bg_depth[None],
                              jnp.asarray(sx, jnp.float32).reshape(1),
                              jnp.asarray(sy, jnp.float32).reshape(1),
                              jnp.zeros(1, jnp.float32)])

    static_cfg = (settings.image_width, settings.image_height,
                  settings.tile_h, settings.tile_w, settings.rich_info,
                  variant, interpret, need_stats)
    color, depth, normal, final_T, n_contrib, pair_contrib = _blend(
        fields, binning.tile_starts, binning.tile_counts, params, static_cfg)

    # Per-triangle contribution statistics (training-statistics consumers are
    # no-grad: src/forward.cu:320-330 computes these with atomics).
    if need_stats:
        contrib_sum, contrib_max = _contrib_stats(pair_contrib, binning, P,
                                                  interpret)
    else:
        contrib_sum = contrib_max = jnp.zeros((P,), jnp.float32)

    return dict(render=color, depth=depth, normal=normal,
                radii=prep.radii, visible_mask=prep.radii > 0,
                contrib_sum=contrib_sum, contrib_max=contrib_max,
                final_T=final_T, n_contrib=n_contrib,
                overflow=binning.overflow, num_pairs=binning.num_pairs)


def rasterize_gaussian(xyz: jnp.ndarray, scale: jnp.ndarray,
                       rotation: jnp.ndarray, opacity: jnp.ndarray,
                       shs: Optional[jnp.ndarray], camera: Camera,
                       settings: RasterSettings, *, gamma=1.0,
                       background=None, bg_depth=5000.0, active_sh_degree=0,
                       colors: Optional[jnp.ndarray] = None,
                       alive_mask: Optional[jnp.ndarray] = None,
                       mean2d_offset: Optional[jnp.ndarray] = None,
                       scale_modifier=1.0, impl: str = "pallas",
                       max_pairs: Optional[int] = None,
                       need_stats: bool = True,
                       interpret: bool = False) -> dict:
    """Render 3D gaussians (custom-gaussian-rasterization equivalent).

    Differentiable w.r.t. xyz / scale / rotation / opacity / shs / colors /
    mean2d_offset (the densification-statistics hook, mirroring the
    reference's means2D dummy tensor).
    """
    from .gaussian import (blend_oracle_gs, gaussian_field_matrix,
                           preprocess_gaussian)
    P = xyz.shape[0]
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    background = jnp.asarray(background, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)
    bg_depth = jnp.asarray(bg_depth, jnp.float32)

    if colors is not None:
        rgb = colors
    else:
        rgb = sh_mod.eval_sh(shs, xyz, camera.camera_center,
                             active_sh_degree, settings.max_sh_degree)

    opac1 = opacity[..., 0] if opacity.ndim == 2 else opacity
    prep = preprocess_gaussian(xyz, scale, rotation, rgb, camera.world_view,
                               camera.full_proj, camera.tan_fovx,
                               camera.tan_fovy, settings,
                               alive_mask=alive_mask, opacity=opac1,
                               gamma=gamma, scale_modifier=scale_modifier,
                               mean2d_offset=mean2d_offset)

    if impl == "oracle":
        out = blend_oracle_gs(prep, opac1, gamma, background, bg_depth,
                              settings)
        return dict(render=out.color, depth=out.depth, normal=out.normal,
                    radii=prep.radii, visible_mask=prep.radii > 0,
                    contrib_sum=out.contrib_sum, contrib_max=out.contrib_max,
                    final_T=out.final_T, n_contrib=out.n_contrib,
                    overflow=jnp.asarray(False), num_pairs=jnp.int32(0))

    if max_pairs is None:
        max_pairs = _round_up(int(settings.pairs_per_triangle * P), ALIGN)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    prep_ng = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)
    binning = bin_triangles(prep_ng, settings, max_pairs, align=ALIGN,
                            interpret=interpret, compute_pack_perm=PACK_PERM)

    fields = pack_pair_fields(gaussian_field_matrix(prep, opac1), binning,
                              interpret,
                              LIVE_GRAD_ROWS[("GS", settings.rich_info)])
    params = jnp.concatenate([gamma[None], background, bg_depth[None],
                              jnp.zeros(3, jnp.float32)])
    static_cfg = (settings.image_width, settings.image_height,
                  settings.tile_h, settings.tile_w, settings.rich_info,
                  "GS", interpret, need_stats)
    color, depth, normal, final_T, n_contrib, pair_contrib = _blend(
        fields, binning.tile_starts, binning.tile_counts, params, static_cfg)

    if need_stats:
        contrib_sum, contrib_max = _contrib_stats(pair_contrib, binning, P,
                                                  interpret)
    else:
        contrib_sum = contrib_max = jnp.zeros((P,), jnp.float32)

    return dict(render=color, depth=depth, normal=normal,
                radii=prep.radii, visible_mask=prep.radii > 0,
                contrib_sum=contrib_sum, contrib_max=contrib_max,
                final_T=final_T, n_contrib=n_contrib,
                overflow=binning.overflow, num_pairs=binning.num_pairs)
