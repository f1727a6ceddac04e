"""Multi-host (multi-process) collective training: 2 processes x 4 virtual
CPU devices each, one shared 8-device data-parallel mesh.

Proves the SURVEY §5 distributed-backend slice end to end without multi-host
hardware: each subprocess initializes jax.distributed (Gloo collectives on
CPU), builds the process-spanning mesh, feeds its HOST-LOCAL camera shard
through ``global_dp_inputs``, and runs ONE real ``make_dp_train_step`` —
whose gradient/loss psum must therefore cross the process boundary. Rank 0
re-computes the global 8-camera loss sequentially on one device and asserts
the psum-med value matches; if the collective silently stayed intra-process
the loss would be the 4-camera partial sum and the check fails.

The subprocess pattern mirrors ``__graft_entry__._dryrun_in_subprocess``
(fresh interpreters so the conftest's 8-device single-process jax state
can't leak in).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["TS_REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from triangle_splatting_tpu.parallel import multihost
from triangle_splatting_tpu.parallel.mesh import make_dp_train_step, stack_cameras
from triangle_splatting_tpu.models import triangle as M
from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.trainers import losses as L
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

# env-var path of maybe_initialize (TS_COORDINATOR/... set by the parent)
assert multihost.distributed_settings() is not None
assert multihost.maybe_initialize()
pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = multihost.make_global_mesh()
width = 32
cfg = M.ModelConfig(max_sh_degree=0)
settings = RasterSettings(image_width=width, image_height=width,
                          max_sh_degree=0)
s = make_random_scene(96, seed=3)
params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"], None,
                                     cfg, init_opacity=0.5)
opt = M.AdamState.create(params)

# 8 deterministic, DISTINCT global cameras; this process feeds views
# [4*pid, 4*pid+4) — distinct per-view losses make a wrong psum scope
# unmistakable in the rank-0 parity check below.
from dataclasses import replace as _dc_replace

def view(i):
    cam = make_camera(width, width, fov_deg=50.0 + 3.0 * i, with_image=True)
    gt = np.full((3, width, width), (i + 1) / 10.0, np.float32)
    return _dc_replace(cam, gt_image=jnp.asarray(gt))

cams_global = [view(i) for i in range(8)]
local = stack_cameras([c.strip_static() for c in cams_global[4*pid:4*pid+4]])

def loss_fn(pkg, camera, p, st, weights):
    return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

step = make_dp_train_step(mesh, settings, cfg, loss_fn, impl="oracle",
                          donate=False)
lrs = {"vertex": np.float32(1e-4), "opacity": np.float32(0.01),
       "f_dc": np.float32(0.001), "f_rest": np.float32(1e-4),
       "affine": np.float32(0.0)}
weights = {"l1": np.float32(1.0)}
background = jnp.ones(3)

cameras, g_params, g_opt, g_state, g_bg = multihost.global_dp_inputs(
    mesh, local, params, opt, state, background)
p2, o2, st2, loss, g_c2d = step(g_params, g_opt, g_state, cameras, g_bg,
                                lrs, weights)
loss = float(np.asarray(jax.device_get(loss)))
assert np.isfinite(loss)

if multihost.is_main_process():
    # Sequential single-device reference over ALL 8 global cameras.
    ref = 0.0
    for cam in cams_global:
        pkg = M.forward(params, state, cam.strip_static(), background, cfg,
                        settings, is_training=True,
                        center2d_offset=jnp.zeros((params.capacity, 2)),
                        impl="oracle")
        ref += float(loss_fn(pkg, cam, params, state, weights))
    assert abs(loss - ref) < 1e-4 * max(1.0, abs(ref)), (loss, ref)
    delta = float(np.abs(np.asarray(jax.device_get(p2.vertex))
                         - np.asarray(params.vertex)).max())
    assert delta > 0.0
    print(f"MULTIHOST_OK loss={loss:.6f} ref={ref:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_step(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    port_no = port.getsockname()[1]
    port.close()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)          # conftest's 8-device flag
        env["TS_REPO"] = str(REPO)
        env["TS_COORDINATOR"] = f"127.0.0.1:{port_no}"
        env["TS_NUM_PROCESSES"] = "2"
        env["TS_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    assert "MULTIHOST_OK" in outs[0], outs[0]
