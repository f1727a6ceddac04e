"""Hybrid 2-D parallelism: camera-batch DP x depth-sharded MP in one step.

The reference scales only by independent per-scene processes
(run_experiments.py:21-33, utils/pipeline_utils.py:35-64). On a TPU pod the
two native axes compose instead: a 2-D ``Mesh((data, model))`` where

- the **data** axis shards a batch of cameras (one view per mesh row, as in
  ``parallel/mesh.py``), and
- the **model** axis shards each view's rasterization work into contiguous
  DEPTH SLABS (as in ``parallel/depth_sharded.py``) whose over-composite is
  algebraically exact.

Parameters stay replicated: triangle parameters are small (100k triangles
~ 6 MB) while the rasterizer's working set (pair expansion, packed fields,
images) scales with triangles-per-device — that working set is what the
model axis divides, ZeRO-style. Each (row, column) device renders its row's
camera restricted to its depth slab; one ``all_gather`` over the model axis
fuses the slab images, and one ``psum`` over both axes produces the exact
camera-mean gradient for a replicated Adam step.

Gradient bookkeeping: every model-axis column evaluates the SAME loss for
its row (the composite is replicated within a row), so per-device AD
through the ``all_gather`` transposes into a ``psum_scatter`` that counts
each slab's image cotangent once per column — a factor-K overcount. The
direct (non-gather) paths — regularizers, bg_depth — are likewise computed
on every column. Scaling the local loss by 1/(D*K) and ``psum``-ming the
per-device grads over BOTH axes cancels both overcounts exactly:

    sum_{d,k} [ K * slab_grad_{d,k} + reg_grad_d ] / (D*K)
      = sum_d [ full_grad_d + reg_grad_d ] / D          (the DP-mean grad)

Densification statistics keep per-view semantics: slab-local per-triangle
quantities live in canonical index space via a scatter into (C,)-sized
zeros; ``psum`` over the model axis assembles each view's full vector, the
usual per-view deltas then reduce over the data axis (parallel/mesh.py).

KNOWN DEVIATION (statistics only; loss/gradients/radii are exact): a
slab's kernel starts at transmittance 1 and cannot see the occlusion
arriving from nearer slabs, so ``contrib_sum``/``contrib_max`` for
triangles behind other slabs' geometry are OVERSTATED relative to the
single-device ``alpha * T_global`` definition (VanillaTS_model.py:467-532
feeds these into contribution pruning). The bias is strictly conservative
— occluded triangles look more important and are pruned later, never
earlier; ``gradient_accum`` (from the exact composite gradient) and
``max_radii2d`` (occlusion-independent) are unaffected.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import triangle as M
from ..ops.projection import RasterSettings
from ..ops.rasterize import rasterize
from .depth_sharded import composite_over, partition_by_depth
from .mesh import get_shard_map, reduce_view_statistics


def make_hybrid_mesh(n_data: int, n_model: int,
                     data_axis: str = "data", model_axis: str = "model"):
    import numpy as np
    devices = jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(n_data, n_model),
                (data_axis, model_axis))


def make_hybrid_train_step(mesh: Mesh, settings: RasterSettings,
                           loss_fn: Callable, data_axis: str = "data",
                           model_axis: str = "model", impl: str = "pallas",
                           interpret: bool = False, donate: bool = True,
                           track_stats: bool = True):
    """Build a jitted DP x depth-MP train step over TriangleParams.

    Args:
        loss_fn: ``(pkg, camera, params, state, weights) -> scalar`` for ONE
            camera; ``pkg`` holds the fused replicated render/depth/normal/
            final_T. The step averages it over the camera batch.
    Returns:
        ``step(params, opt, state, cameras, background, lrs, weights)
        -> (params, opt, state, loss, aux)`` with ``cameras`` a stacked
        Camera pytree of leading dim ``mesh.shape[data_axis]``.

    The rasterization path is the facade-level one (SH color eval + alive
    masking; no STE/up-scale/color-affine — use ``trainer.data_parallel``
    for the full-featured trainer step).
    """
    D = mesh.shape[data_axis]
    K = mesh.shape[model_axis]
    repl = P()
    cam_spec = P(data_axis)

    def per_device(params, opt, state, cameras, background, lrs, weights):
        camera = jax.tree_util.tree_map(lambda x: x[0], cameras)
        C = params.capacity
        if C % K != 0:
            raise ValueError(f"capacity {C} not divisible by model axis {K}")
        slab_len = C // K
        k = jax.lax.axis_index(model_axis)

        def loss_fn_local(p, c2d):
            order = partition_by_depth(p.vertex, camera, K,
                                       alive=state.alive, settings=settings)
            slab = jax.lax.dynamic_slice_in_dim(order, k * slab_len, slab_len)
            out = rasterize(
                p.vertex[slab], M.get_opacity(p)[slab, 0],
                M.get_features(p)[slab], camera, settings,
                gamma=state.gamma, background=jnp.zeros(3),
                bg_depth=jnp.float32(0.0),
                active_sh_degree=state.active_sh_degree,
                center2d_offset=c2d[slab], alive_mask=state.alive[slab],
                impl=impl, interpret=interpret)
            # bg_depth from the full replicated params (triangle.py:190-193)
            dist = M.safe_norm(camera.camera_center[None, None, :] - p.vertex)
            bg_depth = jnp.max(jnp.where(state.alive[:, None], dist, 0.0))
            packed = jnp.concatenate([
                out["render"], out["normal"], out["depth"][None],
                out["final_T"][None]], axis=0)                   # (8, H, W)
            gathered = jax.lax.all_gather(packed, model_axis)    # (K, 8, H, W)
            color, depth, normal, final_t = composite_over(
                gathered[:, 0:3], gathered[:, 6], gathered[:, 3:6],
                gathered[:, 7], background=background, bg_depth=bg_depth)
            pkg = dict(render=color, depth=depth, normal=normal,
                       final_T=final_t)
            loss = loss_fn(pkg, camera, p, state, weights)
            # slab-local per-triangle stats in canonical index space
            zC = jnp.zeros((C,), jnp.float32)
            aux = dict(
                radii=zC.at[slab].set(out["radii"].astype(jnp.float32)),
                contrib_sum=zC.at[slab].set(out["contrib_sum"]),
                contrib_max=zC.at[slab].set(out["contrib_max"]),
                visible=jnp.zeros((C,), bool).at[slab].set(
                    out["visible_mask"]),
                overflow=out["overflow"], num_pairs=out["num_pairs"])
            return loss / (D * K), aux

        c2d = jnp.zeros((C, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn_local, argnums=(0, 1), has_aux=True)(params, c2d)
        g_params, g_c2d = grads
        g_params = jax.lax.psum(g_params, (data_axis, model_axis))
        loss = jax.lax.psum(loss, (data_axis, model_axis))
        params, opt = M.adam_update(params, opt, g_params, lrs)

        if track_stats:
            # assemble this VIEW's full vectors over the model axis, then
            # reduce the per-view deltas over the data axis (mesh.py rules)
            g_c2d_cam = jax.lax.psum(g_c2d, model_axis) * D
            vis = jax.lax.psum(aux["visible"].astype(jnp.int32),
                               model_axis) > 0
            radii = jax.lax.psum(aux["radii"], model_axis)
            c_sum = jax.lax.psum(aux["contrib_sum"], model_axis)
            c_max = jax.lax.psum(aux["contrib_max"], model_axis)
            state = reduce_view_statistics(
                state, vis, jnp.linalg.norm(g_c2d_cam, axis=-1),
                c_sum, c_max, radii, data_axis)

        slim = dict(
            overflow=jax.lax.pmax(aux["overflow"].astype(jnp.int32),
                                  (data_axis, model_axis)) > 0,
            num_pairs=jax.lax.pmax(aux["num_pairs"],
                                   (data_axis, model_axis)))
        return params, opt, state, loss, slim

    smapped = get_shard_map()(
        per_device, mesh=mesh,
        in_specs=(repl, repl, repl, cam_spec, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, repl),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1) if donate else ())
