"""VanillaGS gaussian model, functional (reference models/VanillaGS_model.py).

Same fixed-capacity + alive-mask design as the triangle model
(models/triangle.py): parameters are a pytree at capacity C, adaptive
density control is pure masked arithmetic, Adam moments are plain leaves.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_mod
from ..ops.projection import RasterSettings, safe_norm
from ..ops.rasterize import rasterize_gaussian
from ..utils.camera import Camera
from .model_utils import inter_point_distance_np, inverse_sigmoid, inverse_sigmoid_np
from .triangle import AdamState  # same optimizer machinery shape-wise


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaussianParams:
    """Learnable parameters at fixed capacity C (VanillaGS_model.py:68-74)."""
    xyz: jax.Array          # (C, 3)
    scaling: jax.Array      # (C, 3) log-scales
    rotation: jax.Array     # (C, 4) unnormalized quaternions (wxyz)
    opacity: jax.Array      # (C, 1) logits
    f_dc: jax.Array         # (C, 1, 3)
    f_rest: jax.Array       # (C, K-1, 3)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaussianState:
    alive: jax.Array
    gradient_accum: jax.Array
    gradient_denom: jax.Array
    max_radii2d: jax.Array
    contrib_sum: jax.Array
    contrib_max: jax.Array
    contrib_denom: jax.Array
    gamma: jax.Array
    active_sh_degree: jax.Array

    @staticmethod
    def create(capacity: int, gamma: float = 1.0) -> "GaussianState":
        def z():
            return jnp.zeros((capacity,), jnp.float32)
        return GaussianState(
            alive=jnp.zeros((capacity,), bool), gradient_accum=z(),
            gradient_denom=z(), max_radii2d=z(), contrib_sum=z(),
            contrib_max=z(), contrib_denom=z(), gamma=jnp.float32(gamma),
            active_sh_degree=jnp.int32(0))


@dataclass(frozen=True)
class GSModelConfig:
    max_sh_degree: int = 3
    use_color_affine: bool = False
    scale_modifier: float = 1.0


GS_PARAM_GROUPS = ("xyz", "scaling", "rotation", "opacity", "f_dc", "f_rest")


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    return params.rotation / safe_norm(params.rotation)[:, None]


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_features(params: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([params.f_dc, params.f_rest], axis=1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GSAdamState:
    m: GaussianParams
    v: GaussianParams
    step: jax.Array

    @staticmethod
    def create(params: GaussianParams) -> "GSAdamState":
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        return GSAdamState(m=m, v=v, step=jnp.int32(0))


def adam_update(params: GaussianParams, opt: GSAdamState,
                grads: GaussianParams, lrs: dict,
                beta1=0.9, beta2=0.999, eps=1e-15):
    step = opt.step + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)
    new_p, new_m, new_v = {}, {}, {}
    for name in GS_PARAM_GROUPS:
        p = getattr(params, name)
        g = getattr(grads, name)
        m = beta1 * getattr(opt.m, name) + (1 - beta1) * g
        v = beta2 * getattr(opt.v, name) + (1 - beta2) * g * g
        update = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_p[name] = p - lrs[name] * update
        new_m[name] = m
        new_v[name] = v
    return (GaussianParams(**new_p),
            GSAdamState(m=GaussianParams(**new_m), v=GaussianParams(**new_v),
                        step=step))


def zero_moments(opt: GSAdamState, mask, groups=GS_PARAM_GROUPS) -> GSAdamState:
    def fix(tp):
        kw = {}
        for name in GS_PARAM_GROUPS:
            leaf = getattr(tp, name)
            if name in groups:
                m = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
                leaf = jnp.where(m, 0, leaf)
            kw[name] = leaf
        return GaussianParams(**kw)
    return GSAdamState(m=fix(opt.m), v=fix(opt.v), step=opt.step)


def forward(params: GaussianParams, state: GaussianState, camera: Camera,
            background, cfg: GSModelConfig, settings: RasterSettings, *,
            is_training: bool = True, mean2d_offset=None,
            impl: str = "pallas", interpret: bool = False,
            max_pairs: Optional[int] = None,
            need_stats: bool = True) -> dict:
    """Render the gaussian scene (VanillaGS_model.py:515-573)."""
    dist = safe_norm(camera.camera_center[None, :] - params.xyz)
    bg_depth = jnp.max(jnp.where(state.alive, dist, 0.0))
    out = rasterize_gaussian(
        params.xyz, get_scaling(params), get_rotation(params),
        get_opacity(params)[:, 0], get_features(params), camera, settings,
        gamma=state.gamma, background=background, bg_depth=bg_depth,
        active_sh_degree=state.active_sh_degree, alive_mask=state.alive,
        mean2d_offset=mean2d_offset, scale_modifier=cfg.scale_modifier,
        impl=impl, interpret=interpret, max_pairs=max_pairs,
        need_stats=need_stats)
    out.update(scaling=get_scaling(params), opacity=get_opacity(params),
               xyz=params.xyz, visible_mask=(out["radii"] > 0) & state.alive)
    return out


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       cfg: GSModelConfig, init_opacity: float = 0.1,
                       capacity: Optional[int] = None,
                       capacity_factor: float = 1.0):
    """Init gaussians on a point cloud (VanillaGS_model.py create_from_pcd):
    isotropic log-scale from sqrt(mean 3-NN distance^2), identity rotation.
    """
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    dist = inter_point_distance_np(points)
    scales = np.log(np.maximum(dist, 1e-7))[:, None].repeat(3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((n, 1), inverse_sigmoid_np(init_opacity), np.float32)
    K = (cfg.max_sh_degree + 1) ** 2
    shs = ((np.asarray(colors, np.float32) - 0.5) / sh_mod.SH_C0)
    f_dc = shs[:, None, :]
    f_rest = np.zeros((n, K - 1, 3), np.float32)

    cap = capacity if capacity is not None else int(
        (max(int(n * capacity_factor), n) + 255) // 256 * 256)

    def pad(x):
        return np.concatenate([x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])

    pad_rots = pad(rots)
    pad_rots[n:, 0] = 1.0      # identity quats in dead slots (no zero covs)
    params = GaussianParams(
        xyz=jnp.asarray(pad(points)), scaling=jnp.asarray(pad(scales)),
        rotation=jnp.asarray(pad_rots), opacity=jnp.asarray(pad(opac)),
        f_dc=jnp.asarray(pad(f_dc)), f_rest=jnp.asarray(pad(f_rest)))
    state = GaussianState.create(cap)
    state = replace(state, alive=jnp.asarray(np.arange(cap) < n))
    return params, state


# -- adaptive density control (VanillaGS_model.py:218-384) ------------------

def update_statistics(state: GaussianState, mean2d_grad, radii, contrib_sum,
                      contrib_max, visible) -> GaussianState:
    gnorm = safe_norm(mean2d_grad)
    vis = visible
    return replace(
        state,
        gradient_accum=state.gradient_accum + jnp.where(vis, gnorm, 0.0),
        gradient_denom=state.gradient_denom + vis.astype(jnp.float32),
        contrib_sum=jnp.where(vis, jnp.maximum(state.contrib_sum, contrib_sum),
                              state.contrib_sum),
        contrib_max=jnp.where(vis, jnp.maximum(state.contrib_max, contrib_max),
                              state.contrib_max),
        contrib_denom=state.contrib_denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d,
                                               radii.astype(jnp.float32)),
                              state.max_radii2d))


def prune(params, opt, state, prune_mask):
    prune_mask = prune_mask & state.alive
    state = replace(
        state, alive=state.alive & ~prune_mask,
        gradient_accum=jnp.where(prune_mask, 0, state.gradient_accum),
        gradient_denom=jnp.where(prune_mask, 0, state.gradient_denom),
        max_radii2d=jnp.where(prune_mask, 0, state.max_radii2d),
        contrib_sum=jnp.where(prune_mask, 0, state.contrib_sum),
        contrib_max=jnp.where(prune_mask, 0, state.contrib_max),
        contrib_denom=jnp.where(prune_mask, 0, state.contrib_denom))
    opt = zero_moments(opt, prune_mask)
    return params, opt, state


def opacity_pruning(params, opt, state, threshold):
    mask = (get_opacity(params)[:, 0] < threshold) & state.alive
    return prune(params, opt, state, mask) + (mask.sum(),)


def opacity_reset(params, opt, state, reset_value):
    op = get_opacity(params)
    params = replace(params, opacity=inverse_sigmoid(jnp.minimum(op, reset_value)))
    opt = zero_moments(opt, jnp.ones(params.capacity, bool), groups=("opacity",))
    return params, opt, state


def opacity_clipping(params, opt, state, threshold):
    """Push confident opacities to logit 10 (VanillaGS_model.py:358-370)."""
    mask = (get_opacity(params)[:, 0] > threshold) & state.alive
    params = replace(params,
                     opacity=jnp.where(mask[:, None], 10.0, params.opacity))
    opt = zero_moments(opt, mask, groups=("opacity",))
    return params, opt, state, mask.sum()


def scale_pruning(params, opt, state, radii_threshold, scale_threshold):
    """Prune by screen radius or max world scale (VanillaGS_model.py:371-388)."""
    mask = ((state.max_radii2d > radii_threshold)
            | (get_scaling(params).max(axis=1) > scale_threshold)) & state.alive
    return prune(params, opt, state, mask) + (mask.sum(),)


def scale_clipping(params, opt, state, scale_max):
    """Clamp per-axis log-scales to log(scale_max)
    (VanillaGS_model.py:390-402)."""
    log_max = jnp.log(jnp.asarray(scale_max, jnp.float32))
    clip = (params.scaling > log_max) & state.alive[:, None]
    params = replace(params,
                     scaling=jnp.where(clip, log_max, params.scaling))
    opt = zero_moments(opt, clip.any(axis=1), groups=("scaling",))
    return params, opt, state, clip.any(axis=1).sum()


def contribution_pruning(params, opt, state, *, min_view_count,
                         target_point_num, prune_ratio, max_prune_ratio,
                         contrib_max_ratio, scene_bbox=None,
                         inter_point_dist=None, sparsity_retain_ratio=0.0):
    """Prune lowest-contribution gaussians toward a target count
    (VanillaGS_model.py:404-464) — the shared fixed-shape ranking core
    (models/adc_common.py) over the gaussian state."""
    from .adc_common import contribution_prune_mask, reset_contribution_stats
    from .model_utils import get_inside_mask
    inside = get_inside_mask(params.xyz, scene_bbox) & state.alive
    prune_mask, select = contribution_prune_mask(
        state, inside, min_view_count=min_view_count,
        target_point_num=target_point_num, prune_ratio=prune_ratio,
        max_prune_ratio=max_prune_ratio, contrib_max_ratio=contrib_max_ratio,
        inter_point_dist=inter_point_dist,
        sparsity_retain_ratio=sparsity_retain_ratio)
    state = reset_contribution_stats(state, select)
    return prune(params, opt, state, prune_mask) + (prune_mask.sum(),)


def densify(params: GaussianParams, opt, state: GaussianState, rng_key,
            grad_threshold, min_view_count, split_scale_threshold,
            split_num: int = 2):
    """Clone small / split large high-gradient gaussians; splits sample new
    centers from the gaussian itself and shrink scale by 1.6
    (VanillaGS_model.py:218-268)."""
    C = params.capacity
    select = state.gradient_denom >= min_view_count
    grow = select & (state.gradient_accum > grad_threshold * state.gradient_denom) \
        & state.alive
    scaling = get_scaling(params)
    large = scaling.max(axis=1) > split_scale_threshold
    clone_mask = grow & ~large
    split_mask = grow & large

    # Sample split candidates ~ N(xyz, Sigma) in world space.
    from ..ops.gaussian import quat_to_rotmat
    R = quat_to_rotmat(get_rotation(params))
    eps1 = jax.random.normal(rng_key, (C, 3)) * scaling
    eps2 = jax.random.normal(jax.random.fold_in(rng_key, 1), (C, 3)) * scaling
    off1 = jnp.einsum("pij,pj->pi", R, eps1)
    off2 = jnp.einsum("pij,pj->pi", R, eps2)
    new_scaling = jnp.log(jnp.maximum(scaling / (0.8 * split_num), 1e-7))

    def cand(xyz_off):
        # clones copy the original verbatim; split halves move to a sampled
        # center and take the shrunken scale
        return dict(
            xyz=jnp.where(split_mask[:, None], params.xyz + xyz_off, params.xyz),
            scaling=jnp.where(split_mask[:, None], new_scaling, params.scaling),
            rotation=params.rotation, opacity=params.opacity,
            f_dc=params.f_dc, f_rest=params.f_rest)

    c1 = cand(off1)           # clone copy or split half 1
    c2 = cand(off2)           # split half 2 (invalid for clones)
    new_valid = jnp.stack([clone_mask | split_mask, split_mask], 1).reshape(2 * C)

    new_order = jnp.argsort(~new_valid, stable=True)
    dead_order = jnp.argsort(state.alive, stable=True)
    n_new = new_valid.sum()
    n_dead = (~state.alive).sum()
    n_place = jnp.minimum(n_new, n_dead)
    overflow = n_new > n_dead
    # Atomic split placement (see models/triangle.py densify): never place a
    # split's half 1 while dropping its half 2 at the capacity boundary.
    inv = jnp.argsort(new_order)                       # cand -> rank
    last = new_order[jnp.clip(n_place - 1, 0, 2 * C - 1)]
    orphan = ((n_place > 0) & (last % 2 == 0) & split_mask[last // 2]
              & (inv[jnp.minimum(last + 1, 2 * C - 1)] >= n_place))
    n_place = n_place - orphan.astype(n_place.dtype)
    k = jnp.arange(C)
    take = new_order[k]
    src = take // 2
    which = take % 2
    dst = jnp.where(k < n_place, dead_order[k], C)

    def place(name):
        leaf = getattr(params, name)
        rows = jnp.where((which == 0).reshape((-1,) + (1,) * (leaf.ndim - 1)),
                         c1[name][src], c2[name][src])
        return leaf.at[dst].set(rows, mode="drop")

    params = GaussianParams(**{name: place(name) for name in GS_PARAM_GROUPS})
    placed = jnp.zeros(C, bool).at[dst].set(k < n_place, mode="drop")
    state = replace(state, alive=state.alive | placed)
    opt = zero_moments(opt, placed)
    clear = placed | select
    state = replace(
        state,
        gradient_accum=jnp.where(clear, 0, state.gradient_accum),
        gradient_denom=jnp.where(clear, 0, state.gradient_denom))
    # Split originals removed — but ONLY when both replacement halves were
    # actually placed; on capacity overflow the dropped tail must not delete
    # geometry (the host reallocates and the next round re-splits).
    placed_cand = (inv < n_place) & new_valid          # (2C,)
    both_placed = placed_cand.reshape(C, 2).all(axis=1)
    params, opt, state = prune(params, opt, state, split_mask & both_placed)
    return params, opt, state, grow.sum(), overflow
