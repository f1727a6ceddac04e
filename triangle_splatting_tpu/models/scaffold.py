"""Scaffold-GS model, functional (reference models/ScaffoldGS_model.py).

Anchors on a sparse voxel grid carry a learned feature; five small MLP heads
decode ``n_offsets`` neural gaussians per anchor (scaling/offset/opacity/
cov/color, ScaffoldGS_model.py:34-65). TPU-first design choices:

- fixed-capacity anchors + alive mask (like models/triangle.py) instead of
  torch cat/index_select parameter surgery; Adam moments are plain leaves
  masked in lockstep;
- MLP heads run as two batched (C, F) x (F, H) matmuls over ALL anchors —
  visibility is a mask into the rasterizer, not a gather, so every step
  compiles to one static program;
- anchor growth (ScaffoldGS_model.py:298-366) voxelizes candidate gaussians
  per hierarchy level and dedups against existing anchors with a sort-based
  join (lexsorted int voxel coords + segment max) instead of the chunked
  O(N*M) broadcast compare; new anchors are scattered into dead slots.
  Levels are placed sequentially, so an anchor grown at a coarser level
  also blocks finer-level candidates in the same voxel (the reference only
  dedups exact duplicate positions across levels) — strictly more
  conservative growth.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import RasterSettings, safe_norm
from ..ops.rasterize import rasterize_gaussian
from ..utils.camera import Camera
from .model_utils import get_inside_mask, inter_point_distance_np, inverse_sigmoid_np

MLP_HEADS = ("scaling", "offset", "opacity", "cov", "color")
_I32_SENTINEL = np.int32(2 ** 31 - 1)


@dataclass(frozen=True)
class ScaffoldConfig:
    """Static hyperparameters (ScaffoldGS_model.py:25-28 + anchor_update)."""
    feat_dim: int = 32
    hidden_dim: int = 32
    n_offsets: int = 10
    max_offset_scale: float = 1.0
    max_scaling_scale: float = 1.0
    feat_init_std: float = 0.1
    outside_boundary_ratio: float = 4.0
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScaffoldParams:
    """Learnable leaves: per-anchor arrays at capacity C + 5 MLP heads."""
    anchor: jax.Array        # (C, 3)
    anchor_feat: jax.Array   # (C, F)
    mlps: dict               # head -> {"w1","b1","w2","b2"}

    @property
    def capacity(self) -> int:
        return self.anchor.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScaffoldState:
    alive: jax.Array            # (C,)
    anchor_scaling: jax.Array   # (C, 3) prefilter extent (not learned)
    anchor_rotation: jax.Array  # (C, 4) identity quats (not learned)
    opacity_accum: jax.Array    # (C,)
    anchor_denom: jax.Array     # (C,)
    offset_grad_accum: jax.Array  # (C, k)
    offset_denom: jax.Array       # (C, k)
    voxel_size: jax.Array       # scalar
    opacity_threshold: jax.Array  # scalar (scheduled, maintain_constraints)

    @staticmethod
    def create(capacity: int, n_offsets: int,
               voxel_size: float = 0.001) -> "ScaffoldState":
        def z(*shape):
            return jnp.zeros(shape, jnp.float32)
        rot = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
        return ScaffoldState(
            alive=jnp.zeros((capacity,), bool),
            anchor_scaling=z(capacity, 3), anchor_rotation=rot,
            opacity_accum=z(capacity), anchor_denom=z(capacity),
            offset_grad_accum=z(capacity, n_offsets),
            offset_denom=z(capacity, n_offsets),
            voxel_size=jnp.float32(voxel_size),
            opacity_threshold=jnp.float32(0.0))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScaffoldAdamState:
    m: ScaffoldParams
    v: ScaffoldParams
    step: jax.Array

    @staticmethod
    def create(params: ScaffoldParams) -> "ScaffoldAdamState":
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaffoldAdamState(m=zeros(), v=zeros(), step=jnp.int32(0))


# -- MLP heads ---------------------------------------------------------------

def _linear_init(rng: np.random.Generator, fan_in: int, fan_out: int):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return (rng.uniform(-bound, bound, (fan_in, fan_out)).astype(np.float32),
            rng.uniform(-bound, bound, (fan_out,)).astype(np.float32))


def init_mlps(cfg: ScaffoldConfig, seed: int = 0) -> dict:
    """5 two-layer heads (ScaffoldGS_model.py:34-65). Output dims:
    scaling 6, offset 3k, opacity k, cov 7k, color 3k."""
    rng = np.random.default_rng(seed)
    out_dims = {"scaling": 6, "offset": 3 * cfg.n_offsets,
                "opacity": cfg.n_offsets, "cov": 7 * cfg.n_offsets,
                "color": 3 * cfg.n_offsets}
    mlps = {}
    for head in MLP_HEADS:
        w1, b1 = _linear_init(rng, cfg.feat_dim, cfg.hidden_dim)
        w2, b2 = _linear_init(rng, cfg.hidden_dim, out_dims[head])
        mlps[head] = {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                      "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)}
    return mlps


def _mlp_apply(head: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(x @ head["w1"] + head["b1"])
    return h @ head["w2"] + head["b2"]


# -- decoding ----------------------------------------------------------------

def anchor_scaling_heads(params: ScaffoldParams, state: ScaffoldState,
                         cfg: ScaffoldConfig):
    """(offset_scale (C,3), scaling_scale (C,3)): exp head * voxel_size with
    per-half clamps (ScaffoldGS_model.py:71-77)."""
    s6 = jnp.exp(_mlp_apply(params.mlps["scaling"], params.anchor_feat))
    s6 = s6 * state.voxel_size
    return (jnp.minimum(s6[:, :3], cfg.max_offset_scale),
            jnp.minimum(s6[:, 3:], cfg.max_scaling_scale))


def generate_gaussians(params: ScaffoldParams, state: ScaffoldState,
                       cfg: ScaffoldConfig) -> dict:
    """Decode k neural gaussians per anchor (ScaffoldGS_model.py:95-131).

    Returns (C, k, ...) arrays; selection happens later by mask, never by
    gather, so the step stays a single static XLA program.
    """
    feat = params.anchor_feat
    C, k = params.capacity, cfg.n_offsets
    offset_scale, scaling_scale = anchor_scaling_heads(params, state, cfg)

    g_off = jnp.tanh(_mlp_apply(params.mlps["offset"], feat)).reshape(C, k, 3)
    xyz = params.anchor[:, None] + offset_scale[:, None] * g_off

    cov = _mlp_apply(params.mlps["cov"], feat).reshape(C, k, 7)
    scale = scaling_scale[:, None] * jax.nn.sigmoid(cov[..., :3])
    rot = cov[..., 3:7] / safe_norm(cov[..., 3:7])[..., None]

    opacity = jax.nn.sigmoid(
        _mlp_apply(params.mlps["opacity"], feat)).reshape(C, k)
    color = jax.nn.sigmoid(
        _mlp_apply(params.mlps["color"], feat)).reshape(C, k, 3)
    return dict(xyz=xyz, scale=scale, rot=rot, opacity=opacity, color=color)


def prefilter_voxel(params: ScaffoldParams, state: ScaffoldState,
                    camera: Camera, settings: RasterSettings) -> jnp.ndarray:
    """No-grad anchor visibility via the rasterizer's radius test
    (ScaffoldGS_model.py:388-397, rasterize_gaussians_filter)."""
    from ..ops.gaussian import preprocess_gaussian
    anchor = jax.lax.stop_gradient(params.anchor)
    prep = preprocess_gaussian(
        anchor, state.anchor_scaling, state.anchor_rotation,
        jnp.zeros_like(anchor), camera.world_view, camera.full_proj,
        camera.tan_fovx, camera.tan_fovy, settings, alive_mask=state.alive,
        opacity=jnp.ones(params.capacity), gamma=jnp.float32(1.0))
    return (prep.radii > 0) & state.alive


def forward(params: ScaffoldParams, state: ScaffoldState, camera: Camera,
            background, cfg: ScaffoldConfig, settings: RasterSettings, *,
            is_training: bool = True, mean2d_offset=None,
            scene_bbox=None, impl: str = "pallas", interpret: bool = False,
            max_pairs: Optional[int] = None,
            need_stats: bool = False) -> dict:
    """Render the scaffold scene (ScaffoldGS_model.py:430-463).

    ``need_stats`` defaults to False: Scaffold's anchor statistics
    (update_statistics) consume only visibility masks + gradient norms,
    never the contribution products, so the rasterizer's contribution
    statistics path (ops/rasterize.py need_stats) would be dead work every
    step. Pass True only to read ``contrib_sum``/``contrib_max`` directly.
    """
    C, k = params.capacity, cfg.n_offsets
    anchor_visible = prefilter_voxel(params, state, camera, settings)
    dec = generate_gaussians(params, state, cfg)

    sel = (dec["opacity"] > state.opacity_threshold) \
        & anchor_visible[:, None] & state.alive[:, None]
    if scene_bbox is not None:
        sel &= get_inside_mask(dec["xyz"].reshape(-1, 3),
                               scene_bbox).reshape(C, k)

    N = C * k
    out = rasterize_gaussian(
        dec["xyz"].reshape(N, 3), dec["scale"].reshape(N, 3),
        dec["rot"].reshape(N, 4), dec["opacity"].reshape(N), None, camera,
        settings, colors=dec["color"].reshape(N, 3), background=background,
        alive_mask=sel.reshape(N), mean2d_offset=mean2d_offset,
        impl=impl, interpret=interpret, max_pairs=max_pairs,
        need_stats=need_stats)
    out.update(
        gaussian_opacity=dec["opacity"],            # (C, k), pre-selection
        scaling=dec["scale"],                       # (C, k, 3)
        selection_mask=sel,                         # (C, k)
        anchor_visible_mask=anchor_visible,         # (C,)
        gaussian_visible_mask=(out["radii"] > 0).reshape(C, k) & sel)
    return out


# -- optimizer ---------------------------------------------------------------

def _head_lr(lrs: dict, head: str):
    return lrs.get(f"mlp_{head}", 0.0)


def adam_update(params: ScaffoldParams, opt: ScaffoldAdamState,
                grads: ScaffoldParams, lrs: dict,
                beta1=0.9, beta2=0.999, eps=1e-15):
    """Adam with per-group lr (torch param-group semantics,
    ScaffoldGS_model.py:146-175)."""
    step = opt.step + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return p, m, v

    a, am, av = upd(params.anchor, grads.anchor, opt.m.anchor, opt.v.anchor,
                    lrs.get("anchor", 0.0))
    f, fm, fv = upd(params.anchor_feat, grads.anchor_feat,
                    opt.m.anchor_feat, opt.v.anchor_feat,
                    lrs.get("anchor_feat", 0.0))
    mlps, mm, mv = {}, {}, {}
    for head in MLP_HEADS:
        mlps[head], mm[head], mv[head] = {}, {}, {}
        for leaf in ("w1", "b1", "w2", "b2"):
            p2, m2, v2 = upd(params.mlps[head][leaf], grads.mlps[head][leaf],
                             opt.m.mlps[head][leaf], opt.v.mlps[head][leaf],
                             _head_lr(lrs, head))
            mlps[head][leaf] = p2
            mm[head][leaf] = m2
            mv[head][leaf] = v2
    new_params = ScaffoldParams(anchor=a, anchor_feat=f, mlps=mlps)
    new_opt = ScaffoldAdamState(
        m=ScaffoldParams(anchor=am, anchor_feat=fm, mlps=mm),
        v=ScaffoldParams(anchor=av, anchor_feat=fv, mlps=mv), step=step)
    return new_params, new_opt


def zero_anchor_moments(opt: ScaffoldAdamState, mask) -> ScaffoldAdamState:
    """Clear per-anchor Adam moments at masked rows (the functional
    equivalent of the reference's optimizer-state surgery,
    ScaffoldGS_model.py:243-296). MLP moments are untouched."""
    def fix(tp: ScaffoldParams) -> ScaffoldParams:
        return replace(
            tp, anchor=jnp.where(mask[:, None], 0, tp.anchor),
            anchor_feat=jnp.where(mask[:, None], 0, tp.anchor_feat))
    return replace(opt, m=fix(opt.m), v=fix(opt.v))


# -- init --------------------------------------------------------------------

def create_from_points(points: np.ndarray, cfg: ScaffoldConfig,
                       voxel_size: float = 0.001, scene_bbox=None,
                       capacity: Optional[int] = None,
                       capacity_factor: float = 4.0, seed: int = 0,
                       logger=None):
    """Voxel-downsample the point cloud into anchors
    (ScaffoldGS_model.py:496-524). voxel_size <= 0 -> median inter-point
    distance; points outside the scene bbox use a coarser grid."""
    points = np.asarray(points, np.float32)
    if voxel_size <= 0:
        voxel_size = float(np.median(inter_point_distance_np(points)))
    outside_size = voxel_size * cfg.outside_boundary_ratio
    if logger is not None:
        logger.info(f"Initial voxel_size: {voxel_size}, outside boundary "
                    f"voxel_size: {outside_size}")

    inside = np.asarray(get_inside_mask(points, scene_bbox))
    a_in = np.unique(np.round(points[inside] / voxel_size),
                     axis=0) * voxel_size
    a_out = np.unique(np.round(points[~inside] / outside_size),
                      axis=0) * outside_size
    anchor = np.concatenate([a_in, a_out], 0).astype(np.float32)
    n = anchor.shape[0]

    rng = np.random.default_rng(seed)
    feat = rng.normal(0, cfg.feat_init_std,
                      (n, cfg.feat_dim)).astype(np.float32)
    cap = capacity if capacity is not None else int(
        (max(int(n * capacity_factor), n) + 255) // 256 * 256)

    def pad(x):
        return np.concatenate([x, np.zeros((cap - n,) + x.shape[1:], x.dtype)])

    params = ScaffoldParams(anchor=jnp.asarray(pad(anchor)),
                            anchor_feat=jnp.asarray(pad(feat)),
                            mlps=init_mlps(cfg, seed))
    state = ScaffoldState.create(cap, cfg.n_offsets, voxel_size)
    state = replace(
        state, alive=jnp.asarray(np.arange(cap) < n),
        anchor_scaling=jnp.full((cap, 3), cfg.max_offset_scale, jnp.float32))
    return params, state


# -- training statistics (ScaffoldGS_model.py:217-241) ------------------------

def update_statistics(state: ScaffoldState, mean2d_grad, pkg: dict,
                      n_offsets: int, gate=True) -> ScaffoldState:
    """Accumulate per-anchor max opacity and per-offset viewspace-gradient
    norms for visible anchors/gaussians. ``gate`` is the anchor_update
    iteration window (ScaffoldGS_model.py:217-219: statistics collect only
    inside start_iter < iteration <= end_iter)."""
    C = state.alive.shape[0]
    gate = jnp.asarray(gate)
    vis_anchor = pkg["anchor_visible_mask"] & gate
    max_op = jnp.max(pkg["gaussian_opacity"], axis=1)
    g_vis = pkg["gaussian_visible_mask"] & gate             # (C, k)
    gnorm = safe_norm(mean2d_grad[:, :2]).reshape(C, n_offsets)
    return replace(
        state,
        opacity_accum=state.opacity_accum + jnp.where(vis_anchor, max_op, 0.0),
        anchor_denom=state.anchor_denom + vis_anchor.astype(jnp.float32),
        offset_grad_accum=state.offset_grad_accum
        + jnp.where(g_vis, gnorm, 0.0),
        offset_denom=state.offset_denom + g_vis.astype(jnp.float32))


# -- anchor update: grow + prune ----------------------------------------------

def _lexsort3(coords: jnp.ndarray) -> jnp.ndarray:
    """Order that lex-sorts int32 (N, 3) rows (x major)."""
    order = jnp.argsort(coords[:, 2], stable=True)
    order = order[jnp.argsort(coords[order, 1], stable=True)]
    order = order[jnp.argsort(coords[order, 0], stable=True)]
    return order


def _grow_level(params: ScaffoldParams, opt: ScaffoldAdamState,
                state: ScaffoldState, key, grad, offset_mask, g_xyz,
                level: int, cfg: ScaffoldConfig, grad_threshold):
    """One hierarchy level of anchor growth (ScaffoldGS_model.py:303-355):
    threshold scales by (hier/2)^level, voxel size shrinks by hier^level,
    candidates survive a coin flip with p = 0.5^(level+1), then voxels are
    deduped against existing anchors with a sort-based join.
    """
    C, k = params.capacity, cfg.n_offsets
    N = C * k
    thr = grad_threshold * float((cfg.update_hierachy_factor // 2) ** level)
    size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor
                                             ** level)
    cur_size = state.voxel_size * max(size_factor, 1)

    cand = (grad >= thr) & offset_mask & state.alive[:, None]
    cand &= jax.random.uniform(key, (C, k)) > 0.5 ** (level + 1)
    cand = cand.reshape(N)

    coords = jnp.round(g_xyz / cur_size).astype(jnp.int32)        # (N, 3)
    a_coords = jnp.round(params.anchor / cur_size).astype(jnp.int32)

    all_coords = jnp.concatenate([coords, a_coords], 0)
    valid = jnp.concatenate([cand, state.alive], 0)
    is_anchor = jnp.concatenate(
        [jnp.zeros(N, bool), state.alive], 0)
    all_coords = jnp.where(valid[:, None], all_coords, _I32_SENTINEL)

    order = _lexsort3(all_coords)
    sc = all_coords[order]
    sv = valid[order]
    sa = is_anchor[order]
    M = N + C
    prev_ne = jnp.concatenate(
        [jnp.array([True]), jnp.any(sc[1:] != sc[:-1], axis=1)])
    seg = jnp.cumsum(prev_ne.astype(jnp.int32)) - 1
    has_anchor = jax.ops.segment_max(sa.astype(jnp.int32), seg,
                                     num_segments=M)
    blocked = has_anchor[seg] > 0
    emit = prev_ne & sv & ~sa & ~blocked

    # feature for a new voxel = max over its candidate parents' feats
    # (scatter_max in the reference, ScaffoldGS_model.py:343-344)
    feat_all = jnp.concatenate(
        [jnp.repeat(params.anchor_feat, k, axis=0),
         jnp.zeros_like(params.anchor_feat)], 0)[order]
    feat_masked = jnp.where((sv & ~sa)[:, None], feat_all, -jnp.inf)
    seg_feat = jax.ops.segment_max(feat_masked, seg, num_segments=M)
    new_feat = jnp.nan_to_num(seg_feat[seg], neginf=0.0)
    new_pos = sc.astype(jnp.float32) * cur_size

    # place emitted voxels into dead slots
    emit_order = jnp.argsort(~emit, stable=True)
    dead_order = jnp.argsort(state.alive, stable=True)
    n_new = emit.sum()
    n_dead = (~state.alive).sum()
    n_place = jnp.minimum(jnp.minimum(n_new, n_dead), C)
    kk = jnp.arange(C)
    src = emit_order[kk]
    dst = jnp.where(kk < n_place, dead_order[kk], C)

    anchor = params.anchor.at[dst].set(new_pos[src], mode="drop")
    feat = params.anchor_feat.at[dst].set(new_feat[src], mode="drop")
    placed = jnp.zeros(C, bool).at[dst].set(kk < n_place, mode="drop")

    params = replace(params, anchor=anchor, anchor_feat=feat)
    state = replace(
        state, alive=state.alive | placed,
        anchor_scaling=jnp.where(placed[:, None], cfg.max_offset_scale,
                                 state.anchor_scaling),
        anchor_rotation=jnp.where(
            placed[:, None],
            jnp.zeros((1, 4)).at[:, 0].set(1.0), state.anchor_rotation),
        opacity_accum=jnp.where(placed, 0, state.opacity_accum),
        anchor_denom=jnp.where(placed, 0, state.anchor_denom),
        offset_grad_accum=jnp.where(placed[:, None], 0,
                                    state.offset_grad_accum),
        offset_denom=jnp.where(placed[:, None], 0, state.offset_denom))
    opt = zero_anchor_moments(opt, placed)
    return params, opt, state, n_new, n_new > n_dead


def grow_anchors(params, opt, state, key, cfg: ScaffoldConfig,
                 grad_threshold, grad_min_view_count):
    """All hierarchy levels (ScaffoldGS_model.py:298-366). Returns the total
    placed count and an overflow flag (capacity exhausted)."""
    offset_mask = state.offset_denom > grad_min_view_count
    grad = state.offset_grad_accum / (1e-15 + state.offset_denom)
    g_xyz = jax.lax.stop_gradient(
        generate_gaussians(params, state, cfg)["xyz"].reshape(-1, 3))

    total = jnp.int32(0)
    overflow = jnp.asarray(False)
    for level in range(cfg.update_depth):
        key, sub = jax.random.split(key)
        params, opt, state, n, ov = _grow_level(
            params, opt, state, sub, grad, offset_mask, g_xyz, level, cfg,
            grad_threshold)
        total = total + n.astype(jnp.int32)
        overflow |= ov
    # reset gradient stats of examined offsets (ScaffoldGS_model.py:299-300)
    state = replace(
        state,
        offset_grad_accum=jnp.where(offset_mask, 0, state.offset_grad_accum),
        offset_denom=jnp.where(offset_mask, 0, state.offset_denom))
    return params, opt, state, total, overflow


def prune_anchors(params, opt, state, opacity_threshold,
                  opacity_min_view_count):
    """Prune anchors whose mean max-opacity fell below threshold
    (ScaffoldGS_model.py:261-277 + 381-386)."""
    anchor_mask = state.anchor_denom > opacity_min_view_count
    opacity = state.opacity_accum / (1e-15 + state.anchor_denom)
    prune = anchor_mask & (opacity < opacity_threshold) & state.alive
    state = replace(
        state, alive=state.alive & ~prune,
        opacity_accum=jnp.where(anchor_mask, 0, state.opacity_accum),
        anchor_denom=jnp.where(anchor_mask, 0, state.anchor_denom),
        offset_grad_accum=jnp.where(prune[:, None], 0,
                                    state.offset_grad_accum),
        offset_denom=jnp.where(prune[:, None], 0, state.offset_denom))
    opt = zero_anchor_moments(opt, prune)
    return params, opt, state, prune.sum()


# -- IO / pretrain helpers -----------------------------------------------------

def get_raw_output(params: ScaffoldParams, cfg: ScaffoldConfig) -> dict:
    """Raw (pre-activation where the reference is raw) MLP outputs for the
    distillation pretrain loss (ScaffoldGS_model.py:526-536)."""
    feat = params.anchor_feat
    C, k = params.capacity, cfg.n_offsets
    return {
        "anchor": params.anchor,
        "scaling": _mlp_apply(params.mlps["scaling"], feat),
        "g_offset": jnp.tanh(
            _mlp_apply(params.mlps["offset"], feat)).reshape(C, k, 3),
        "g_opacity": jax.nn.sigmoid(
            _mlp_apply(params.mlps["opacity"], feat)).reshape(C, k, 1),
        "g_cov": _mlp_apply(params.mlps["cov"], feat).reshape(C, k, 7),
        "g_color": jax.nn.sigmoid(
            _mlp_apply(params.mlps["color"], feat)).reshape(C, k, 3),
    }


def gt_gaussian_to_gt_pkg(gt_xyz, gt_opacity, gt_scale, gt_rot, gt_shs,
                          voxel_size: float, n_offsets: int,
                          logger=None) -> dict:
    """Voxelize a GT gaussian set into anchor-formatted target tensors
    (ScaffoldGS_model.py:538-617). Host-side numpy (one-time init)."""
    from ..ops.sh import SH_C0

    xyz = np.asarray(gt_xyz, np.float32)
    opacity = 1.0 / (1.0 + np.exp(-np.asarray(gt_opacity, np.float32)))
    scaling = np.exp(np.asarray(gt_scale, np.float32))
    rot = np.asarray(gt_rot, np.float32)
    rgb = np.asarray(gt_shs, np.float32)[:, :3] * SH_C0 + 0.5

    # sort by importance so the k slots of a full voxel keep the biggest
    # contributors (ScaffoldGS_model.py:552-554)
    importance = scaling.prod(axis=1) * opacity[:, 0]
    order = np.argsort(-importance, kind="stable")
    xyz, opacity, scaling = xyz[order], opacity[order], scaling[order]
    rot, rgb = rot[order], rgb[order]

    grid = np.round(xyz / voxel_size).astype(np.int64)
    uniq, inverse = np.unique(grid, axis=0, return_inverse=True)
    anchor = uniq.astype(np.float32) * voxel_size
    A = anchor.shape[0]

    vox_order = np.argsort(inverse, kind="stable")
    xyz, opacity, scaling, rot, rgb, inverse = (
        xyz[vox_order], opacity[vox_order], scaling[vox_order],
        rot[vox_order], rgb[vox_order], inverse[vox_order])
    counts = np.bincount(inverse, minlength=A)
    if logger is not None:
        logger.info(f"Max point per voxel: {counts.max()}")
        if counts.max() > n_offsets:
            logger.warning(f"Some points are discarded because n_offsets: "
                           f"{n_offsets} is less than {counts.max()}!")
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    g_offset = np.zeros((A, n_offsets, 3), np.float32)
    g_opacity = np.zeros((A, n_offsets, 1), np.float32)
    g_cov = np.zeros((A, n_offsets, 7), np.float32)
    g_color = np.zeros((A, n_offsets, 3), np.float32)
    for i in range(n_offsets):
        m = np.nonzero(counts > i)[0]
        sel = offsets[m] + i
        g_offset[m, i] = xyz[sel] - anchor[m]
        g_opacity[m, i, 0] = opacity[sel, 0]
        g_cov[m, i, :3] = scaling[sel]
        g_cov[m, i, 3:] = rot[sel]
        g_color[m, i] = rgb[sel]

    eps, margin = 1e-10, 0.05
    max_off = np.abs(g_offset).max(axis=1, keepdims=True) * (1 + margin) + eps
    g_offset = g_offset / max_off
    max_scale = g_cov[:, :, :3].max(axis=1, keepdims=True) * (1 + margin) + eps
    g_cov[:, :, :3] = inverse_sigmoid_np(
        np.clip(g_cov[:, :, :3] / max_scale, eps, 1 - eps))
    anchor_scale = np.log(np.concatenate([max_off, max_scale], -1)[:, 0])
    return {"anchor": anchor, "scaling": anchor_scale,
            "g_offset": g_offset, "g_opacity": np.clip(g_opacity, 0, 1),
            "g_cov": g_cov, "g_color": np.clip(g_color, 0, 1)}
