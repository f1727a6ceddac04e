"""Gaussian-splat preprocess + oracle (custom-gaussian-rasterization port).

TPU-native equivalent of the reference's forked INRIA rasterizer
(``custom-gaussian-rasterization/cuda_rasterizer/forward.cu``):
- 3D covariance from (scale, quaternion) (computeCov3D, :120-155),
- EWA projection to a 2D screen covariance with the 1.3*tan FoV clamp and
  +0.3 px low-pass diagonal (computeCov2D, :76-115),
- conic (inverse 2D covariance), 3-sigma radius from eigenvalues, tile rect,
- generalized falloff ``power = -0.5 * (d^T conic d)^gamma`` (:419-426) with
  the reference's skip rules and its early-termination semantics (the entry
  that would push T below 1e-4 is NOT composited, unlike the triangle
  rasterizer, :497-527).

The quadratic form is a degree-2 polynomial in pixel coordinates, so the
shared Pallas blend kernel evaluates it from 6 precomputed coefficients per
pair (variant "GS"). The 667-line hand-derived CUDA backward
(cuda_rasterizer/backward.cu) is replaced by JAX AD through this preprocess.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .projection import EPS, RasterSettings, ndc2pix

T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PreprocessedGS:
    mean2d: jax.Array       # (P, 2) pixel-space center
    conic: jax.Array        # (P, 3) inverse 2D covariance (a, b, c)
    depth: jax.Array        # (P,) view z
    rgb: jax.Array          # (P, 3)
    valid: jax.Array        # (P,)
    rect_min: jax.Array     # (P, 2) int32
    rect_max: jax.Array     # (P, 2) int32
    tiles_touched: jax.Array
    radii: jax.Array


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(P, 4) wxyz quaternions -> (P, 3, 3) rotations (computeCov3D)."""
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def build_cov3d(scale: jnp.ndarray, rotation: jnp.ndarray,
                scale_modifier=1.0) -> jnp.ndarray:
    """(P,3) scales + (P,4) quats -> (P,3,3) world covariance R S S^T R^T."""
    R = quat_to_rotmat(rotation)
    S = scale * scale_modifier                                 # (P, 3)
    M = R * S[:, None, :]                                      # R @ diag(S)
    # HIGHEST: bf16 covariance feeds the conic inverse and EWA radii.
    return jnp.einsum("pij,pkj->pik", M, M,
                      precision=jax.lax.Precision.HIGHEST)


def preprocess_gaussian(xyz: jnp.ndarray, scale: jnp.ndarray,
                        rotation: jnp.ndarray, rgb: jnp.ndarray,
                        world_view: jnp.ndarray, full_proj: jnp.ndarray,
                        tan_fovx, tan_fovy, settings: RasterSettings,
                        alive_mask=None, opacity=None, gamma=None,
                        scale_modifier=1.0,
                        mean2d_offset=None) -> PreprocessedGS:
    """Project gaussians to screen space (EWA splatting)."""
    W, H = settings.image_width, settings.image_height
    TW, TH = settings.tile_w, settings.tile_h
    grid_w, grid_h = settings.grid_w, settings.grid_h
    P = xyz.shape[0]

    if alive_mask is not None:
        # Dead fixed-capacity slots can hold degenerate values (zero quats
        # -> singular covariance -> NaN conic grads that would poison Adam
        # moments through the masked-out rows); substitute benign ones.
        unit_q = jnp.zeros((1, 4), rotation.dtype).at[0, 0].set(1.0)
        rotation = jnp.where(alive_mask[:, None], rotation, unit_q)
        scale = jnp.where(alive_mask[:, None], scale, 1.0)

    def _apply(M, pts):
        out = M[:, 0] * pts[:, 0:1] + M[:, 1] * pts[:, 1:2] + M[:, 2] * pts[:, 2:3]
        return out + M[:, 3]

    h = _apply(full_proj, xyz)
    w_inv = 1.0 / (jnp.abs(h[:, 3]) + EPS)
    proj = h[:, :3] * w_inv[:, None]
    valid = proj[:, 2] > 0                                      # near culling
    if alive_mask is not None:
        valid = valid & alive_mask

    t = _apply(world_view[:3], xyz)                             # view point
    tz = jnp.where(jnp.abs(t[:, 2]) < EPS, 1.0, t[:, 2])
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    focal_x = W / (2.0 * tan_fovx)
    focal_y = H / (2.0 * tan_fovy)
    cov3d = build_cov3d(scale, rotation, scale_modifier)        # (P, 3, 3)

    # J rows (EWA, computeCov2D:91-95); third row dropped.
    J = jnp.stack([
        jnp.stack([focal_x / tz, jnp.zeros_like(tz), -focal_x * tx / (tz * tz)], -1),
        jnp.stack([jnp.zeros_like(tz), focal_y / tz, -focal_y * ty / (tz * tz)], -1),
    ], axis=1)                                                  # (P, 2, 3)
    Wv = world_view[:3, :3]                                     # world->view rot
    Tm = jnp.einsum("pij,jk->pik", J, Wv)                       # (P, 2, 3)
    cov2d = jnp.einsum("pij,pjk,plk->pil", Tm, cov3d, Tm)       # (P, 2, 2)
    cxx = cov2d[:, 0, 0] + 0.3
    cyy = cov2d[:, 1, 1] + 0.3
    cxy = cov2d[:, 0, 1]

    det = cxx * cyy - cxy * cxy
    valid = valid & (det > 0)
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], -1)

    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    # Tight radius: alpha >= 1/255 requires q <= (2 ln(255 o))^(1/gamma);
    # the reference uses the fixed 3-sigma rule q <= 9 (:231-234).
    if opacity is not None and gamma is not None:
        o = jax.lax.stop_gradient(opacity.reshape(-1))
        g = jnp.asarray(gamma, jnp.float32)
        vis = o * 255.0 > 1.0 + 1e-6
        valid = valid & vis
        q_max = jnp.exp(jnp.log(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(255.0 * o, 1.0 + 1e-6)), 1e-12)) / g)
        radius_f = jnp.ceil(jnp.sqrt(jnp.minimum(9.0, q_max) *
                                     jnp.maximum(lam, 1e-12)))
        radius_f = jax.lax.stop_gradient(radius_f)
    else:
        radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 1e-12)))

    mean2d = jnp.stack([ndc2pix(proj[:, 0], W), ndc2pix(proj[:, 1], H)], -1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    v_min = mean2d - radius_f[:, None]
    v_max = mean2d + radius_f[:, None]
    rect_min = jnp.stack([
        jnp.clip(jnp.floor(v_min[:, 0] / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor(v_min[:, 1] / TH).astype(jnp.int32), 0, grid_h),
    ], -1)
    rect_max = jnp.stack([
        jnp.clip(jnp.floor((v_max[:, 0] + TW - 1) / TW).astype(jnp.int32), 0, grid_w),
        jnp.clip(jnp.floor((v_max[:, 1] + TH - 1) / TH).astype(jnp.int32), 0, grid_h),
    ], -1)
    valid = valid & (rect_max[:, 0] > rect_min[:, 0]) & (rect_max[:, 1] > rect_min[:, 1])
    tiles = jnp.where(valid, (rect_max[:, 0] - rect_min[:, 0])
                      * (rect_max[:, 1] - rect_min[:, 1]), 0).astype(jnp.int32)
    radii = jnp.where(valid, radius_f, 0).astype(jnp.int32)

    return PreprocessedGS(mean2d=mean2d, conic=conic, depth=t[:, 2], rgb=rgb,
                          valid=valid, rect_min=rect_min, rect_max=rect_max,
                          tiles_touched=tiles, radii=radii)


def gaussian_field_matrix(prep: PreprocessedGS, opacity: jnp.ndarray) -> jnp.ndarray:
    """(P, 16) kernel fields: screen center + conic, evaluated DIRECTLY as
    q = a*dx^2 + 2b*dx*dy + c*dy^2 in the kernel.

    (A polynomial-in-pixel expansion like the triangle variants is badly
    conditioned here: the constant term ~ conic * center^2 cancels against
    the linear terms by ~3 orders of magnitude, amplifying reduction-matmul
    rounding into the conic gradients.)
    """
    X, Y = prep.mean2d[:, 0], prep.mean2d[:, 1]
    a, b, c = prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2]
    rgb = prep.rgb
    z = jnp.zeros_like(X)
    fields = jnp.stack([
        X, Y, a, b, c, z, opacity,
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
        prep.depth, z, z, z, z, z,
    ], axis=1)
    return jnp.where(prep.valid[:, None], fields, 0.0)


def blend_oracle_gs(prep: PreprocessedGS, opacity: jnp.ndarray, gamma,
                    background: jnp.ndarray, background_depth,
                    settings: RasterSettings):
    """Dense oracle with the GAUSSIAN early-termination semantics: the entry
    that would push T below 1e-4 is skipped and ends the pixel
    (forward.cu:568-573), and ``n_contrib`` is the reference's
    ``last_contributor`` — the 1-based tile-list index of the LAST
    COMPOSITED entry (forward.cu:588-589: set only after blending, so the
    kill entry and trailing skipped-alpha entries are excluded while
    interleaved skips before the last composite are counted)."""
    from .oracle import OracleOutputs
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
    gamma = jnp.asarray(gamma, jnp.float32)

    def body(carry, g):
        (T, done, cnt, n_contrib, accum_c, accum_d) = carry
        (mean, conic, depth, color, valid, rmin, rmax, opac) = g
        color = jnp.where(valid, color, 0.0)

        member = ((tx >= rmin[0]) & (tx < rmax[0]) &
                  (ty >= rmin[1]) & (ty < rmax[1]) & valid)
        cnt = cnt + member.astype(jnp.int32)       # contributor++ per member
        proc = member & ~done

        dx = mean[0] - px
        dy = mean[1] - py
        q = conic[0] * dx * dx + conic[2] * dy * dy + 2 * conic[1] * dx * dy
        q_ok = q >= 0.0
        qs = jnp.maximum(q, 1e-30)
        power = jnp.where(gamma == 1.0, -0.5 * q,
                          -0.5 * jnp.exp(jnp.clip(gamma * jnp.log(qs),
                                                  -87.0, 44.0)))
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(jnp.minimum(power, 0.0)))
        a_ok = q_ok & (alpha >= ALPHA_MIN)
        test_T = T * (1.0 - alpha)
        kill = proc & a_ok & (test_T < T_EPS)      # done; NOT composited
        eff = proc & a_ok & (test_T >= T_EPS)

        contrib = jnp.where(eff, alpha * T, 0.0)
        accum_c = accum_c + color[:, None, None] * contrib[None]
        accum_d = accum_d + jnp.where(eff, depth * contrib, 0.0)
        T_new = jnp.where(eff, test_T, T)
        done_new = done | kill
        n_contrib = jnp.where(eff, cnt, n_contrib)  # last COMPOSITED index
        return ((T_new, done_new, cnt, n_contrib, accum_c, accum_d),
                (contrib.sum(), contrib.max()))

    gs = (prep.mean2d[order], prep.conic[order], prep.depth[order],
          prep.rgb[order], prep.valid[order], prep.rect_min[order],
          prep.rect_max[order], opacity[order])
    init = (jnp.ones((H, W), jnp.float32), jnp.zeros((H, W), bool),
            jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), jnp.int32),
            jnp.zeros((3, H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32))
    (T, done, _, n_contrib, accum_c, accum_d), (c_sums, c_maxs) = \
        jax.lax.scan(body, init, gs)

    color = accum_c + T[None] * background[:, None, None]
    depth = accum_d + T * jnp.asarray(background_depth, jnp.float32)
    contrib_sum = jnp.zeros((P,), jnp.float32).at[order].set(c_sums)
    contrib_max = jnp.zeros((P,), jnp.float32).at[order].set(c_maxs)
    return OracleOutputs(color=color, depth=depth,
                         normal=jnp.zeros((3, H, W), jnp.float32),
                         final_T=T, n_contrib=n_contrib,
                         contrib_sum=contrib_sum, contrib_max=contrib_max)
