"""Multi-host (multi-process) wiring: ``jax.distributed`` + process-spanning
meshes.

SURVEY.md §5 names a distributed communication backend for multi-host
MatrixCity-scale runs; the reference's only multi-GPU story is per-scene
process fan-out (pipeline_utils), with NO intra-scene distribution. The
TPU-native design instead spans ONE scene across hosts:

- every participating process calls :func:`maybe_initialize` (env vars or
  the ``trainer.distributed`` config block) before first jax use;
- :func:`make_global_mesh` builds a ``Mesh`` over ``jax.devices()`` — the
  GLOBAL device list — so the camera-DP axis spans hosts: the per-step
  gradient ``psum`` of ``parallel/mesh.py:make_dp_train_step`` rides ICI
  within a host and DCN across hosts, with zero changes to the step itself
  (shard_map is oblivious to process boundaries);
- :func:`global_dp_inputs` lifts each process's host-local camera shard
  (and the replicated param/opt/state trees) into global jax.Arrays, the
  form ``jit`` requires when the mesh is not fully addressable.

On CPU test meshes the cross-process collectives run over Gloo (what this
repo's 2-process test exercises, tests/test_multihost.py); on TPU pods the
same code path uses the ICI/DCN fabric. Real multi-host TPU hardware is not
reachable in this environment — see PARITY.md.
"""

from __future__ import annotations

import os

# Environment-variable surface (mirrors the standard launcher contract:
# one coordinator, ranked processes). ``trainer.distributed`` config keys
# ``coordinator`` / ``num_processes`` / ``process_id`` take precedence.
ENV_COORDINATOR = "TS_COORDINATOR"
ENV_NUM_PROCESSES = "TS_NUM_PROCESSES"
ENV_PROCESS_ID = "TS_PROCESS_ID"


def distributed_settings(config=None):
    """Resolve (coordinator, num_processes, process_id) from the
    ``trainer.distributed`` config block, falling back to env vars.
    Returns None when neither requests distributed mode."""
    blk = None
    if config is not None:
        trainer = getattr(config, "trainer", None)
        blk = getattr(trainer, "distributed", None) if trainer is not None else None
    if blk is not None:
        return (blk.coordinator, int(blk.num_processes), int(blk.process_id))
    if ENV_COORDINATOR in os.environ:
        return (os.environ[ENV_COORDINATOR],
                int(os.environ[ENV_NUM_PROCESSES]),
                int(os.environ[ENV_PROCESS_ID]))
    return None


def maybe_initialize(config=None, logger=None) -> bool:
    """``jax.distributed.initialize`` iff distributed mode is requested.

    Idempotent: a second call (or one after an external initialize) is a
    no-op. Returns True when this process is part of an initialized
    multi-process job. MUST run before the first jax computation — the
    trainers call it from ``BaseTrainer.__init__``.
    """
    settings = distributed_settings(config)
    import jax
    if settings is None:
        return jax.process_count() > 1
    coordinator, num_processes, process_id = settings
    already = False
    try:
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None
    except Exception:  # pragma: no cover - jax internals moved
        already = jax.process_count() > 1
    if not already:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        if logger is not None:
            logger.info(
                f"jax.distributed initialized: process {process_id}/"
                f"{num_processes} via {coordinator}; "
                f"{len(jax.local_devices())} local / "
                f"{len(jax.devices())} global devices")
    return True


def is_main_process() -> bool:
    """True on the rank-0 process (the one that should write checkpoints,
    logs, and eval artifacts; collectives are still collective)."""
    import jax
    return jax.process_index() == 0


def make_global_mesh(axis: str = "data"):
    """Mesh over the GLOBAL device list (all processes' devices), data axis
    spanning hosts. Layout note: ``jax.devices()`` orders devices
    process-major, so each process's local shard of a leading-axis-sharded
    batch is contiguous — exactly what :func:`global_dp_inputs` feeds."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def global_dp_inputs(mesh, local_batch, *replicated, axis: str = "data"):
    """Lift host-local inputs into global jax.Arrays for a process-spanning
    mesh.

    Args:
        local_batch: pytree whose leaves have leading dim = this process's
            local share of the global batch (local_device_count * B views
            for the DP step). Concatenating all processes' shards in rank
            order forms the global batch.
        replicated: pytrees replicated on every process (params/opt/state/
            background/...); every process must pass identical values.
    Returns:
        (global_batch, *global_replicated) ready for a jitted shard_map
        step built on ``mesh``.
    """
    from jax.experimental import multihost_utils as mu
    from jax.sharding import PartitionSpec as P
    out = [mu.host_local_array_to_global_array(local_batch, mesh, P(axis))]
    for tree in replicated:
        out.append(mu.host_local_array_to_global_array(tree, mesh, P()))
    return tuple(out)
