"""Dense reference rasterizer (the semantic oracle), pure jax.numpy.

O(P * H * W) front-to-back alpha blending via ``lax.scan`` over depth-sorted
triangles. This reproduces, pixel-exactly, the semantics of the reference's
tile renderer (``diff-triangle-rasterization-2D/src/forward.cu:198-355``):

- per-pixel barycentrics against the dilated screen triangle; eccentricity
  ``ecc = 1 - 3*min(a1,a2,a3)``, skip outside [0, 10],
- ``alpha = min(0.99, opacity * exp(-0.5 * ecc**(2*gamma)))``, skip < 1/255,
- front-to-back compositing with early stop at T <= 1e-4 (the pixel "done"
  flag freezes T and stops counting contributors),
- a triangle only affects pixels whose tile lies inside its dilated bbox
  rect (the tile-binning membership rule, src/forward.cu:158-163),
- rich info: alpha-composited view-depth and view-normal, per-triangle
  ``contrib_sum``/``contrib_max`` statistics (src/forward.cu:320-330).

It is fully differentiable with JAX AD and is the ground truth both for the
Pallas kernels' forward (<=1e-3/pixel budget vs the CUDA reference) and for
their custom VJP (gradcheck vs ``jax.grad`` of this function). Use only on
small scenes — this is a test oracle, not the production path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Preprocessed, RasterSettings, _cross2

T_EPS = 1e-4        # early-stop transmittance (src/forward.cu:333)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
ECC_MAX = 10.0


class OracleOutputs(NamedTuple):
    color: jnp.ndarray        # (3, H, W)
    depth: jnp.ndarray        # (H, W)
    normal: jnp.ndarray       # (3, H, W)
    final_T: jnp.ndarray      # (H, W)
    n_contrib: jnp.ndarray    # (H, W) int32
    contrib_sum: jnp.ndarray  # (P,)
    contrib_max: jnp.ndarray  # (P,)


def blend_oracle(prep: Preprocessed, opacity: jnp.ndarray, gamma,
                 background: jnp.ndarray, background_depth,
                 settings: RasterSettings) -> OracleOutputs:
    """Composite all triangles over the full image, front to back."""
    W, H = settings.image_width, settings.image_height
    tile_w, tile_h = settings.tile_w, settings.tile_h
    P = opacity.shape[0]

    # Depth sort (stable — ties keep triangle-index order, matching the
    # stable radix sort over (tile, depth-bits) keys in src/rasterizer.cu).
    # Depths are quantized EXACTLY like the production binning's fused sort
    # key so the composite order matches the Pallas path bit-for-bit.
    from .binning import depth_bits_for, quantize_depth
    dq = quantize_depth(prep.depth, prep.valid, depth_bits_for(settings.num_tiles))
    sort_depth = jnp.where(prep.valid, dq, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_depth, stable=True)

    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)   # (H, W)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    tx = (jnp.arange(W, dtype=jnp.int32) // tile_w)[None, :].repeat(H, axis=0)
    ty = (jnp.arange(H, dtype=jnp.int32) // tile_h)[:, None].repeat(W, axis=1)

    gamma = jnp.asarray(gamma, jnp.float32)

    def body(carry, tri):
        (T, done, n_contrib, accum_c, accum_d, accum_n) = carry
        (v1, v2, v3, area2, color, valid, rmin, rmax, nrm, vd, opac) = tri

        # Invalid triangles can carry NaN/garbage attributes (dead capacity
        # slots); sanitize so masked contributions stay exactly zero.
        color = jnp.where(valid, color, 0.0)
        nrm = jnp.where(valid, nrm, 0.0)
        vd = jnp.where(valid, vd, 0.0)
        area2 = jnp.where(valid, area2, 1.0)

        member = ((tx >= rmin[0]) & (tx < rmax[0]) &
                  (ty >= rmin[1]) & (ty < rmax[1]) & valid)
        proc = member & ~done                          # counted as contributor

        pv1 = jnp.stack([v1[0] - px, v1[1] - py], -1)
        pv2 = jnp.stack([v2[0] - px, v2[1] - py], -1)
        pv3 = jnp.stack([v3[0] - px, v3[1] - py], -1)
        a1 = _cross2(pv2, pv3) / area2
        a2 = _cross2(pv3, pv1) / area2
        a3 = 1.0 - a1 - a2
        ecc = 1.0 - 3.0 * jnp.minimum(jnp.minimum(a1, a2), a3)
        ecc_ok = (ecc >= 0.0) & (ecc <= ECC_MAX)
        ecc_safe = jnp.clip(ecc, 0.0, ECC_MAX)
        # log-space pow with exponent clipping: ecc^(2*gamma) overflows f32
        # beyond gamma ~ 34 at ecc ~ 10, poisoning masked gradients with
        # inf*0; alphas are invisible (< 1/255) long before powed = 44.
        logp = 2.0 * gamma * jnp.log(jnp.maximum(ecc_safe, 1e-30))
        power = -0.5 * jnp.exp(jnp.clip(logp, -87.0, 44.0))
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
        eff = proc & ecc_ok & (alpha >= ALPHA_MIN)

        contrib = jnp.where(eff, alpha * T, 0.0)       # (H, W)
        accum_c = accum_c + color[:, None, None] * contrib[None]
        d = vd[0] * a1 + vd[1] * a2 + vd[2] * a3
        accum_d = accum_d + jnp.where(eff, d * contrib, 0.0)
        accum_n = accum_n + nrm[:, None, None] * contrib[None]

        T_new = jnp.where(eff, T * (1.0 - alpha), T)
        done_new = done | (eff & (T_new <= T_EPS))
        n_contrib = n_contrib + proc.astype(jnp.int32)

        c_sum = contrib.sum()
        c_max = contrib.max()
        return (T_new, done_new, n_contrib, accum_c, accum_d, accum_n), (c_sum, c_max)

    tris = (
        prep.v1_2d[order], prep.v2_2d[order], prep.v3_2d[order],
        prep.area2[order], prep.rgb[order], prep.valid[order],
        prep.rect_min[order], prep.rect_max[order],
        prep.normal_view[order], prep.v_depth[order], opacity[order],
    )
    init = (
        jnp.ones((H, W), jnp.float32), jnp.zeros((H, W), bool),
        jnp.zeros((H, W), jnp.int32), jnp.zeros((3, H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32), jnp.zeros((3, H, W), jnp.float32),
    )
    (T, done, n_contrib, accum_c, accum_d, accum_n), (c_sums, c_maxs) = \
        jax.lax.scan(body, init, tris)

    color = accum_c + T[None] * background[:, None, None]
    depth = accum_d + T * jnp.asarray(background_depth, jnp.float32)

    # Scatter per-triangle contribution stats back to original order.
    contrib_sum = jnp.zeros((P,), jnp.float32).at[order].set(c_sums)
    contrib_max = jnp.zeros((P,), jnp.float32).at[order].set(c_maxs)

    return OracleOutputs(color=color, depth=depth, normal=accum_n,
                         final_T=T, n_contrib=n_contrib,
                         contrib_sum=contrib_sum, contrib_max=contrib_max)


def blend_oracle_3d(prep, opacity: jnp.ndarray, gamma,
                    background: jnp.ndarray, background_depth,
                    tan_fovx, tan_fovy, settings: RasterSettings) -> OracleOutputs:
    """Dense oracle for the perspective-correct variant
    (diff-triangle-rasterization-3D/src/forward.cu:150-300).

    Uses the DIRECT formulation (ray-plane intersection + 3D cross-product
    barycentrics) rather than the production kernel's rational-affine
    algebra, so it independently validates that reformulation.
    """
    W, H = settings.image_width, settings.image_height
    tile_w, tile_h = settings.tile_w, settings.tile_h
    P = opacity.shape[0]

    from .binning import depth_bits_for, quantize_depth
    dq = quantize_depth(prep.depth, prep.valid, depth_bits_for(settings.num_tiles))
    sort_depth = jnp.where(prep.valid, dq, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_depth, stable=True)

    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    tx = (jnp.arange(W, dtype=jnp.int32) // tile_w)[None, :].repeat(H, axis=0)
    ty = (jnp.arange(H, dtype=jnp.int32) // tile_h)[:, None].repeat(W, axis=1)

    # pixToProj: (2v - S + 1) / S  (3D/src/auxiliary.h:40-43)
    rx = tan_fovx * (2.0 * px - W + 1.0) / W
    ry = tan_fovy * (2.0 * py - H + 1.0) / H

    gamma = jnp.asarray(gamma, jnp.float32)

    def body(carry, tri):
        (T, done, n_contrib, accum_c, accum_d, accum_n) = carry
        (v1, v2, v3, nrm, color, valid, rmin, rmax, opac) = tri
        color = jnp.where(valid, color, 0.0)
        nrm = jnp.where(valid, nrm, 0.0)

        member = ((tx >= rmin[0]) & (tx < rmax[0]) &
                  (ty >= rmin[1]) & (ty < rmax[1]) & valid)
        proc = member & ~done

        ray_dot_n = rx * nrm[0] + ry * nrm[1] + nrm[2]
        plane_ok = jnp.abs(ray_dot_n) >= 1e-8
        rdn_safe = jnp.where(plane_ok, ray_dot_n, 1.0)
        t = (v1 @ nrm) / rdn_safe                       # ray depth (H, W)
        pvx1, pvy1, pvz1 = v1[0] - t * rx, v1[1] - t * ry, v1[2] - t
        pvx2, pvy2, pvz2 = v2[0] - t * rx, v2[1] - t * ry, v2[2] - t
        pvx3, pvy3, pvz3 = v3[0] - t * rx, v3[1] - t * ry, v3[2] - t
        inv_nn = 1.0 / jnp.maximum(nrm @ nrm, 1e-20)

        def cross_dot_n(ax, ay, az, bx, by, bz):
            return ((ay * bz - az * by) * nrm[0]
                    + (az * bx - ax * bz) * nrm[1]
                    + (ax * by - ay * bx) * nrm[2])

        a1 = cross_dot_n(pvx2, pvy2, pvz2, pvx3, pvy3, pvz3) * inv_nn
        a2 = cross_dot_n(pvx3, pvy3, pvz3, pvx1, pvy1, pvz1) * inv_nn
        a3 = 1.0 - a1 - a2
        ecc = 1.0 - 3.0 * jnp.minimum(jnp.minimum(a1, a2), a3)
        ecc_ok = (ecc >= 0.0) & (ecc <= ECC_MAX) & plane_ok
        ecc_safe = jnp.clip(ecc, 0.0, ECC_MAX)
        # log-space pow with exponent clipping: ecc^(2*gamma) overflows f32
        # beyond gamma ~ 34 at ecc ~ 10, poisoning masked gradients with
        # inf*0; alphas are invisible (< 1/255) long before powed = 44.
        logp = 2.0 * gamma * jnp.log(jnp.maximum(ecc_safe, 1e-30))
        power = -0.5 * jnp.exp(jnp.clip(logp, -87.0, 44.0))
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
        eff = proc & ecc_ok & (alpha >= ALPHA_MIN)

        contrib = jnp.where(eff, alpha * T, 0.0)
        accum_c = accum_c + color[:, None, None] * contrib[None]
        accum_d = accum_d + jnp.where(eff, t * contrib, 0.0)
        accum_n = accum_n + nrm[:, None, None] * contrib[None]

        T_new = jnp.where(eff, T * (1.0 - alpha), T)
        done_new = done | (eff & (T_new <= T_EPS))
        n_contrib = n_contrib + proc.astype(jnp.int32)
        return ((T_new, done_new, n_contrib, accum_c, accum_d, accum_n),
                (contrib.sum(), contrib.max()))

    tris = (
        prep.v1_view[order], prep.v2_view[order], prep.v3_view[order],
        prep.normal_view[order], prep.rgb[order], prep.valid[order],
        prep.rect_min[order], prep.rect_max[order], opacity[order],
    )
    init = (
        jnp.ones((H, W), jnp.float32), jnp.zeros((H, W), bool),
        jnp.zeros((H, W), jnp.int32), jnp.zeros((3, H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32), jnp.zeros((3, H, W), jnp.float32),
    )
    (T, done, n_contrib, accum_c, accum_d, accum_n), (c_sums, c_maxs) = \
        jax.lax.scan(body, init, tris)

    color = accum_c + T[None] * background[:, None, None]
    depth = accum_d + T * jnp.asarray(background_depth, jnp.float32)
    contrib_sum = jnp.zeros((P,), jnp.float32).at[order].set(c_sums)
    contrib_max = jnp.zeros((P,), jnp.float32).at[order].set(c_maxs)
    return OracleOutputs(color=color, depth=depth, normal=accum_n,
                         final_T=T, n_contrib=n_contrib,
                         contrib_sum=contrib_sum, contrib_max=contrib_max)
