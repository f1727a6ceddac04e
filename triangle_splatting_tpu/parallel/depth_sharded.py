"""Depth-sharded (triangle model-parallel) rendering over a device mesh.

For scenes whose primitive set exceeds one chip (MatrixCity mesh configs
init 20M points, reference MatrixCity_VanillaTS_mesh.yaml:29-34), the
camera-batch data parallelism of ``parallel/mesh.py`` is not enough: the
parameters themselves must shard. Alpha compositing is order-dependent, so
triangles cannot shard arbitrarily — but front-to-back blending factors
EXACTLY across any partition that respects per-pixel blend order:

    C = sum_k (prod_{j<k} T_j) * C_k        T = prod_k T_k

where shard k renders its triangles alone (no background) producing a
premultiplied color C_k and transmittance image T_k. Because the blend
order everywhere is the per-camera centroid depth (the binning sort key),
partitioning triangles into contiguous DEPTH SLABS of that same key makes
the per-pixel order across shards exactly the global order, and the
composite is algebraically identical to single-device rendering.

The one semantic difference is early termination: a shard does not see the
transmittance arriving from nearer shards, so it keeps blending pixels the
global pass would have frozen at T <= 1e-4. Those extra contributions are
weighted by the (< 1e-4) incoming transmittance in the composite, so the
image error is bounded by 1e-4 per channel; ``n_contrib`` is summed and
upper-bounds the reference count.

Collectives: one ``all_gather`` of (C, D, N, T) images per camera over ICI;
gradients flow through it (its transpose is a scatter), so the same
function trains. Per-triangle outputs (radii, contrib stats) stay sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.projection import RasterSettings
from ..ops.rasterize import rasterize
from ..utils.camera import Camera

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def partition_by_depth(vertex: jnp.ndarray, camera: Camera, n_shards: int,
                       alive=None, settings: Optional[RasterSettings] = None):
    """Shard assignment: order triangles by view depth of the centroid (the
    binning sort key) and split into equal contiguous slabs.

    When ``settings`` is given, the depth is quantized with the SAME
    quantizer the binning sort key uses and ties keep generation order
    (stable sort) — the cross-shard blend order is then exactly the
    single-device order. Dead triangles sort last.

    Returns ``order`` (P,) int32 such that ``x[order].reshape(K, P/K, ...)``
    gives shard k the k-th nearest slab. P must be divisible by
    ``n_shards`` (pad capacity accordingly).
    """
    P_ = vertex.shape[0]
    if P_ % n_shards != 0:
        raise ValueError(f"triangle count {P_} not divisible by {n_shards}")
    center = vertex.mean(axis=1)
    wv = camera.world_view
    # f32 row products (not @): slab assignment must match the in-kernel
    # depth ordering; a bf16 matvec can move boundary triangles across slabs.
    depth = (center[:, 0] * wv[2, 0] + center[:, 1] * wv[2, 1]
             + center[:, 2] * wv[2, 2]) + wv[2, 3]
    valid = jnp.ones(P_, bool) if alive is None else alive
    if settings is not None:
        from ..ops.binning import depth_bits_for, quantize_depth
        q = quantize_depth(depth, valid, depth_bits_for(settings.num_tiles))
        key = jnp.where(valid, q, jnp.int32(2 ** 30))
    else:
        key = jnp.where(valid, depth, jnp.inf)
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def composite_over(color, depth, normal, final_t, background=None,
                   bg_depth=None):
    """Front-to-back over-composite of per-shard premultiplied renders.

    Args: (K, 3, H, W), (K, H, W), (K, 3, H, W), (K, H, W) stacked in
    near-to-far shard order. Returns the fused (color, depth, normal, T).
    """
    t_excl = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(final_t[:1]), final_t[:-1]], axis=0),
        axis=0)                                            # (K, H, W)
    out_c = (color * t_excl[:, None]).sum(axis=0)
    out_d = (depth * t_excl).sum(axis=0)
    out_n = (normal * t_excl[:, None]).sum(axis=0)
    out_t = t_excl[-1] * final_t[-1]
    if background is not None:
        out_c = out_c + out_t * background[:, None, None]
    if bg_depth is not None:
        out_d = out_d + out_t * bg_depth
    return out_c, out_d, out_n, out_t


def make_depth_sharded_render(mesh: Mesh, settings: RasterSettings,
                              axis: str = "model", impl: str = "pallas",
                              interpret: bool = False):
    """Build a render fn over depth-slab-sharded triangles.

    The returned function takes per-shard triangle arrays with a leading
    shard axis (K, P/K, ...) laid out by ``partition_by_depth`` (nearest
    slab first) and returns the REPLICATED fused render package. All inputs
    except the camera/background shard over ``axis``.
    """
    def _local(vertex, opacity, rgb, alive, camera, background, bg_depth,
               gamma):
        out = rasterize(
            vertex[0], opacity[0], None, camera, settings, gamma=gamma,
            background=jnp.zeros(3), bg_depth=jnp.float32(0.0),
            colors=rgb[0], alive_mask=alive[0], impl=impl,
            interpret=interpret)
        # gather every shard's premultiplied images, composite identically
        # on all devices (output replicated)
        packed = jnp.concatenate([
            out["render"], out["normal"], out["depth"][None],
            out["final_T"][None],
            out["n_contrib"].astype(jnp.float32)[None]], axis=0)  # (9,H,W)
        gathered = jax.lax.all_gather(packed, axis)               # (K,9,H,W)
        color, depth, normal, final_t = composite_over(
            gathered[:, 0:3], gathered[:, 6], gathered[:, 3:6],
            gathered[:, 7], background=background, bg_depth=bg_depth)
        n_contrib = gathered[:, 8].sum(axis=0).astype(jnp.int32)
        return dict(render=color, depth=depth, normal=normal,
                    final_T=final_t, n_contrib=n_contrib,
                    radii=out["radii"][None],
                    contrib_sum=out["contrib_sum"][None],
                    contrib_max=out["contrib_max"][None],
                    overflow=jax.lax.pmax(out["overflow"].astype(jnp.int32),
                                          axis) > 0)

    shard = P(axis)
    repl = P()
    smapped = _shard_map(
        _local, mesh=mesh,
        in_specs=(shard, shard, shard, shard, repl, repl, repl, repl),
        out_specs=dict(render=repl, depth=repl, normal=repl, final_T=repl,
                       n_contrib=repl, radii=shard, contrib_sum=shard,
                       contrib_max=shard, overflow=repl),
        check_vma=False)

    def render(vertex, opacity, rgb, alive, camera, background,
               bg_depth, gamma):
        """vertex (K, P/K, 3, 3), opacity (K, P/K), rgb (K, P/K, 3),
        alive (K, P/K); camera/background replicated."""
        return smapped(vertex, opacity, rgb, alive, camera,
                       jnp.asarray(background, jnp.float32),
                       jnp.asarray(bg_depth, jnp.float32),
                       jnp.asarray(gamma, jnp.float32))

    return render
