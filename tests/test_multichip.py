"""Multi-chip data parallelism on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestMultichip:
    def test_dryrun_entrypoints(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 3
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge
        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)

    def test_dp_grads_match_summed_single_device(self):
        """psum-med DP gradients == sum of per-camera gradients."""
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.parallel.mesh import (make_dp_train_step,
                                                          make_mesh,
                                                          stack_cameras)
        from triangle_splatting_tpu.trainers import losses as L
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

        n_dev = 4
        cfg = M.ModelConfig(max_sh_degree=0)
        settings = RasterSettings(image_width=32, image_height=32, max_sh_degree=0)
        s = make_random_scene(64, seed=0)
        params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"],
                                             None, cfg, init_opacity=0.5)
        opt = M.AdamState.create(params)
        cams = [make_camera(32, 32, with_image=True) for _ in range(n_dev)]

        def loss_fn(pkg, camera, p, st, weights):
            return weights["l1"] * L.l1(pkg["render"], camera.gt_image)

        mesh = make_mesh(n_dev)
        step = make_dp_train_step(mesh, settings, cfg, loss_fn,
                                  interpret=True, donate=False)
        lrs = {k: np.float32(0.0) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        weights = {"l1": np.float32(1.0)}
        _, _, _, loss_dp, g_c2d = step(params, opt, state,
                                       stack_cameras(cams), jnp.ones(3),
                                       lrs, weights)

        # single-device reference: sum of per-camera losses
        total = 0.0
        for cam in cams:
            pkg = M.forward(params, state, cam, jnp.ones(3), cfg, settings,
                            impl="pallas", interpret=True)
            total += float(L.l1(pkg["render"], cam.gt_image))
        assert abs(float(loss_dp) - total) < 1e-4 * max(abs(total), 1)
        assert np.isfinite(np.asarray(g_c2d)).all()
