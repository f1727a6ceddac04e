"""Depth-sharded model-parallel rendering vs single-device ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.ops.rasterize import rasterize
from triangle_splatting_tpu.parallel.depth_sharded import (
    composite_over, make_depth_sharded_render, partition_by_depth)
from triangle_splatting_tpu.parallel.mesh import make_mesh
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

N, RES = 256, 64
SETTINGS = RasterSettings(image_width=RES, image_height=RES)


@pytest.fixture(scope="module")
def scene():
    # moderate opacity keeps T above the early-termination threshold so the
    # sharded composite is bit-comparable (see module docstring caveat)
    s = make_random_scene(N, seed=3, opacity_range=(0.2, 0.5))
    cam = make_camera(RES, RES)
    return s, cam


def shard_arrays(s, cam, k):
    order = partition_by_depth(jnp.asarray(s["vertex"]), cam, k,
                               settings=SETTINGS)
    v = jnp.asarray(s["vertex"])[order].reshape(k, N // k, 3, 3)
    o = jnp.asarray(s["opacity"]).reshape(-1)[order].reshape(k, N // k)
    c = jnp.asarray(s["rgb"])[order].reshape(k, N // k, 3)
    alive = jnp.ones((k, N // k), bool)
    return v, o, c, alive


class TestComposite:
    def test_two_slab_algebra(self):
        rng = np.random.default_rng(0)
        c = jnp.asarray(rng.uniform(size=(2, 3, 4, 4)).astype(np.float32))
        d = jnp.asarray(rng.uniform(size=(2, 4, 4)).astype(np.float32))
        n = jnp.asarray(rng.uniform(size=(2, 3, 4, 4)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0.2, 0.9, (2, 4, 4)).astype(np.float32))
        bg = jnp.asarray([1.0, 0.5, 0.0])
        color, depth, _, T = composite_over(c, d, n, t, background=bg,
                                            bg_depth=7.0)
        np.testing.assert_allclose(
            np.asarray(color),
            np.asarray(c[0] + t[0][None] * c[1]
                       + (t[0] * t[1])[None] * bg[:, None, None]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(T), np.asarray(t[0] * t[1]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(depth),
                                   np.asarray(d[0] + t[0] * d[1]
                                              + t[0] * t[1] * 7.0), rtol=1e-6)


class TestDepthSharded:
    def test_matches_single_device(self, scene):
        s, cam = scene
        k = min(8, jax.device_count())
        mesh = make_mesh(k, axis="model")
        render = make_depth_sharded_render(mesh, SETTINGS, axis="model")
        v, o, c, alive = shard_arrays(s, cam, k)
        bg = jnp.ones(3)
        pkg = jax.jit(render)(v, o, c, alive, cam.strip_static(), bg, 10.0,
                              1.0)

        ref = rasterize(jnp.asarray(s["vertex"]),
                        jnp.asarray(s["opacity"]), None, cam, SETTINGS,
                        gamma=1.0, background=bg, bg_depth=10.0,
                        colors=jnp.asarray(s["rgb"]))
        # each shard re-quantizes depth over its own range, so a handful of
        # global-quantization ties can land in different buckets and swap
        # blend order for overlapping splats (observed: 2/12288 px @2.3e-3)
        np.testing.assert_allclose(np.asarray(pkg["render"]),
                                   np.asarray(ref["render"]), atol=4e-3)
        np.testing.assert_allclose(np.asarray(pkg["final_T"]),
                                   np.asarray(ref["final_T"]), atol=4e-3)
        np.testing.assert_allclose(np.asarray(pkg["depth"]),
                                   np.asarray(ref["depth"]), atol=5e-2)
        # per-pixel contributor counts match exactly away from early stop
        nc = np.asarray(pkg["n_contrib"])
        nc_ref = np.asarray(ref["n_contrib"])
        assert (nc >= nc_ref).all()
        assert (nc == nc_ref).mean() > 0.99

    def test_gradients_flow_through_composite(self, scene):
        s, cam = scene
        k = min(8, jax.device_count())
        mesh = make_mesh(k, axis="model")
        render = make_depth_sharded_render(mesh, SETTINGS, axis="model")
        v, o, c, alive = shard_arrays(s, cam, k)
        bg = jnp.ones(3)

        def loss(v_, o_, c_):
            return render(v_, o_, c_, alive, cam.strip_static(), bg, 10.0,
                          1.0)["render"].mean()

        gv, go, gc = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(v, o, c)
        assert np.isfinite(np.asarray(gv)).all()
        assert float(jnp.abs(gv).max()) > 0

        # sharded gradients equal the single-device gradients
        def ref_loss(vertex, opacity, rgb):
            out = rasterize(vertex, opacity, None, cam, SETTINGS, gamma=1.0,
                            background=bg, bg_depth=10.0, colors=rgb)
            return out["render"].mean()

        order = partition_by_depth(jnp.asarray(s["vertex"]), cam, k,
                                   settings=SETTINGS)
        rv, ro, rc = jax.grad(ref_loss, argnums=(0, 1, 2))(
            jnp.asarray(s["vertex"]), jnp.asarray(s["opacity"]).reshape(-1),
            jnp.asarray(s["rgb"]))
        np.testing.assert_allclose(np.asarray(gv).reshape(N, 3, 3),
                                   np.asarray(rv[order]), atol=2e-4)
