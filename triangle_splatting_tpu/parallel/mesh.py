"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference has no intra-model distribution (SURVEY.md §2.3): multi-GPU
means independent per-scene processes. The TPU-native replacement shards the
*camera batch* across chips: triangle parameters are replicated, every chip
rasterizes its own camera(s), and per-parameter gradients are ``psum``-med
over ICI before a replicated Adam step — mathematically identical to
accumulating those cameras' losses on one device (losses are summed, i.e.
batch-summed gradients; divide by batch size via the loss weight if mean
semantics are wanted).

Built on ``shard_map`` so the Pallas blend kernel runs per-device on its
local camera — no cross-chip communication inside the rasterizer; the only
collective is one gradient ``psum`` per step, riding ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import triangle as M
from ..ops.projection import RasterSettings
from ..utils.camera import Camera


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise RuntimeError(
            f"make_mesh({n}) requires {n} devices but only {len(devices)} "
            f"are visible on backend '{jax.default_backend()}'. For a "
            "virtual CPU mesh, set XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n} and jax.config.update('jax_platforms', "
            "'cpu') BEFORE the first jax use (see tests/conftest.py); "
            "never silently shrink a requested mesh.")
    return Mesh(np.array(devices[:n]), (axis,))


def stack_cameras(cameras: list[Camera]) -> Camera:
    """Stack a list of same-resolution cameras into one batched pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cameras)


def dp_layout(dp_n: int, n_devices: int | None = None) -> tuple[int, int]:
    """Split a ``trainer.data_parallel: N`` camera batch into
    (mesh_devices, cameras_per_device).

    Uses the largest divisor of ``dp_n`` that fits the device pool, so
    ``data_parallel: 16`` on 8 chips runs 8-way with a 2-camera local
    minibatch per chip (scan-accumulated — gradients identical to 16-way).

    Raises when the best layout would leave more than half the pool idle
    (e.g. a prime ``dp_n`` larger than the device count serializes the
    whole batch onto one chip) — a silently degenerate "data-parallel" run
    is worse than an error naming a good batch size.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if dp_n < 1:
        raise ValueError(f"data_parallel must be >= 1, got {dp_n}")
    for d in range(min(dp_n, n_devices), 0, -1):
        if dp_n % d == 0:
            if dp_n > d and d <= n_devices // 2:
                raise ValueError(
                    f"data_parallel={dp_n} has no divisor using more than "
                    f"{d} of the {n_devices} available devices — the batch "
                    f"would serialize {dp_n // d} cameras per chip while "
                    f"{n_devices - d} chips idle. Pick a batch size with a "
                    f"divisor near {n_devices} (e.g. "
                    f"{n_devices * max(1, round(dp_n / n_devices))}).")
            return d, dp_n // d
    raise AssertionError("unreachable: 1 divides dp_n")


# NOTE: the three trainers keep their own thin shard_map step wrappers
# (differing loss signatures, Adam modules, and aux dicts); the pieces that
# must never drift — the per-view statistics reduction, camera-batch
# validation/stacking, and the eval chunking — live HERE and are shared.


def get_shard_map():
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - jax version dependent
        from jax.experimental.shard_map import shard_map
    return shard_map


def stack_dp_cameras(cameras: list[Camera]) -> Camera:
    """Validate + stack a data-parallel camera batch.

    A DP batch renders every view with one RasterSettings, so mixed
    resolutions (common in raw COLMAP captures, datasets/colmap.py) cannot
    shard — fail with an actionable error instead of a deep jnp.stack
    shape mismatch thousands of iterations in."""
    sizes = {(c.image_width, c.image_height) for c in cameras}
    if len(sizes) > 1:
        raise ValueError(
            "trainer.data_parallel requires all cameras in a step's batch "
            f"to share one resolution; got {sorted(sizes)}. Set the "
            "dataset's target_res to a fixed [W, H] to equalize them.")
    return stack_cameras([c.strip_static() for c in cameras])


def dp_eval_scores(mesh, eval_step_dp, settings, params, state, cameras,
                   background, *extra, axis: str = "data",
                   cameras_per_device: int = 1):
    """Drive a sharded forward-only eval step over a test-view list.

    Yields ``(index, camera, img, psnr, ssim)`` per real view; views are
    grouped ``cameras_per_device`` (B) per device — one pass scores
    ``mesh_size * B`` views, so eval throughput scales with the same
    ``dp_layout`` the train step uses (big block_all test splits would
    otherwise bottleneck one-view-per-device). The final chunk is padded by
    repetition (the padded scores are dropped).
    ``eval_step_dp(settings, params, state, stacked_cameras, background,
    *extra)`` receives a camera batch of ``mesh_size * B`` views sharded
    over ``axis`` (each device scans its local B) and must return
    batch-stacked ``(imgs, psnrs, ssims)``.
    """
    n = mesh.shape[axis] * int(cameras_per_device)
    for c0 in range(0, len(cameras), n):
        chunk = cameras[c0:c0 + n]
        real = len(chunk)
        chunk = chunk + [chunk[-1]] * (n - real)
        imgs, ps, ss = eval_step_dp(
            settings, params, state,
            stack_cameras([c.strip_static() for c in chunk]),
            background, *extra)
        for j in range(real):
            yield c0 + j, chunk[j], imgs[j], ps[j], ss[j]


def view_stat_locals(vis, per_view_gnorm, contrib_sum, contrib_max, radii):
    """One view's visibility-gated statistic contribution, as the 5-tuple
    ``(d_acc, d_den, cs, cm, rad)`` consumed by
    ``reduce_view_statistics_local`` (sums for the first two, maxima for
    the rest)."""
    visf = vis.astype(jnp.float32)
    return (jnp.where(vis, per_view_gnorm, 0.0), visf,
            jnp.where(vis, contrib_sum, 0.0),
            jnp.where(vis, contrib_max, 0.0),
            jnp.where(vis, radii.astype(jnp.float32), 0.0))


def zero_view_stat_locals(capacity: int):
    z = jnp.zeros((capacity,), jnp.float32)
    return (z, z, z, z, z)


def accumulate_view_stat_locals(acc, new):
    """Fold another view into accumulated locals (sum/sum/max/max/max) —
    the scan-carry combine for a per-device camera minibatch."""
    return (acc[0] + new[0], acc[1] + new[1], jnp.maximum(acc[2], new[2]),
            jnp.maximum(acc[3], new[3]), jnp.maximum(acc[4], new[4]))


def reduce_view_statistics_local(state, locals_, axis):
    """Apply accumulated per-device statistic locals to the replicated
    state, reduced across mesh axis/axes ``axis``.

    Per-VIEW semantics (VanillaTS_model.py:347-363; TriangleState and
    GaussianState share these field names): per-camera ``center2D``/
    ``mean2D`` gradient norms and view counts are SUMMED, contribution and
    radius maxima are ``pmax``-ed — identical to running the batch's views
    through sequential single-device ``update_statistics`` calls
    (contributions/radii are non-negative, so ``max(old, pmax(where(vis,
    x, 0)))`` equals the visibility-gated sequential max).
    """
    from dataclasses import replace as _replace
    d_acc, d_den, cs, cm, rad = locals_
    d_acc = jax.lax.psum(d_acc, axis)
    d_den = jax.lax.psum(d_den, axis)
    cs = jax.lax.pmax(cs, axis)
    cm = jax.lax.pmax(cm, axis)
    rad = jax.lax.pmax(rad, axis)
    return _replace(
        state,
        gradient_accum=state.gradient_accum + d_acc,
        gradient_denom=state.gradient_denom + d_den,
        contrib_sum=jnp.maximum(state.contrib_sum, cs),
        contrib_max=jnp.maximum(state.contrib_max, cm),
        contrib_denom=state.contrib_denom + d_den,
        max_radii2d=jnp.maximum(state.max_radii2d, rad))


def reduce_view_statistics(state, vis, per_view_gnorm, contrib_sum,
                           contrib_max, radii, axis):
    """One-view-per-device form of ``reduce_view_statistics_local``."""
    return reduce_view_statistics_local(
        state, view_stat_locals(vis, per_view_gnorm, contrib_sum,
                                contrib_max, radii), axis)


def _index_camera(cameras: Camera, i) -> Camera:
    return jax.tree_util.tree_map(lambda x: x[i], cameras)


def make_dp_train_step(mesh: Mesh, settings: RasterSettings,
                       model_cfg: M.ModelConfig, loss_fn: Callable,
                       axis: str = "data", impl: str = "pallas",
                       interpret: bool = False, donate: bool = True,
                       cameras_per_device: int = 1):
    """Build a jitted data-parallel train step.

    Args:
        loss_fn: (render_pkg, camera, params, state, weights) -> scalar loss
            for ONE camera. Per-device losses are summed across the mesh.
        cameras_per_device: local minibatch size B. The step consumes a
            camera batch of ``mesh_size * B`` views; each device
            scan-accumulates its B views' gradients before the one psum —
            gradients identical to a (mesh_size * B)-device run.
    Returns:
        step(params, opt, state, cameras, background, lrs, weights)
            -> (params, opt, state, loss, center2d_grad)
        where ``cameras`` is a batched Camera pytree with leading dim
        ``mesh_size * cameras_per_device`` (sharded over ``axis``).
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    B = int(cameras_per_device)
    repl = P()
    shard = P(axis)

    def per_device(params, opt, state, cameras, background, lrs, weights):
        def one_view(camera):
            def local_loss(p, c2d):
                pkg = M.forward(p, state, camera, background, model_cfg,
                                settings, is_training=True,
                                center2d_offset=c2d, impl=impl,
                                interpret=interpret)
                return loss_fn(pkg, camera, p, state, weights)

            c2d = jnp.zeros((params.capacity, 2), jnp.float32)
            return jax.value_and_grad(local_loss, argnums=(0, 1))(params, c2d)

        if B == 1:
            loss, (g_params, g_c2d) = one_view(_index_camera(cameras, 0))
        else:
            def body(carry, camera):
                loss_a, gp_a, gc_a = carry
                loss_i, (gp_i, gc_i) = one_view(camera)
                gp = jax.tree_util.tree_map(jnp.add, gp_a, gp_i)
                return (loss_a + loss_i, gp, gc_a + gc_i), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            init = (jnp.float32(0.0), zeros,
                    jnp.zeros((params.capacity, 2), jnp.float32))
            (loss, g_params, g_c2d), _ = jax.lax.scan(body, init, cameras)
        # Sum gradients over the camera batch (ICI collective).
        g_params = jax.lax.psum(g_params, axis)
        g_c2d = jax.lax.psum(g_c2d, axis)
        loss = jax.lax.psum(loss, axis)
        params, opt = M.adam_update(params, opt, g_params, lrs)
        return params, opt, state, loss, g_c2d

    smapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(repl, repl, repl, shard, repl, repl, repl),
        out_specs=(repl, repl, repl, repl, repl),
        check_vma=False)

    return jax.jit(smapped, donate_argnums=(0, 1) if donate else ())
