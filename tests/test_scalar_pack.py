"""HostScalarPack: the one-buffer host->device scalar convention.

The trainers pack every per-iteration python scalar (loss weights, lrs,
background, iteration) into ONE f32 vector (trainers/scalar_pack.py) so a
remote-dispatch backend pays one h2d RPC per step instead of ~20. These
tests pin the pack/unpack roundtrip and the exact-int guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np

from triangle_splatting_tpu.trainers.scalar_pack import HostScalarPack


def _mk():
    return HostScalarPack(("l1", "ssim", "dog"), ("vertex", "opacity"))


def test_roundtrip():
    p = _mk()
    weights = {"l1": 0.8, "ssim": 0.2, "dog": 0.0}
    lrs = {"vertex": 1.6e-4, "opacity": 0.05}
    bg = np.array([0.25, 0.5, 0.75])
    vec = p.pack(weights, lrs, bg, 1234)
    assert vec.shape == (p.size,) and vec.dtype == np.float32

    w2, l2, bg2, it2 = p.unpack(jnp.asarray(vec))
    for k, v in weights.items():
        np.testing.assert_allclose(np.asarray(w2[k]), v, rtol=1e-6)
    for k, v in lrs.items():
        np.testing.assert_allclose(np.asarray(l2[k]), v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bg2), bg, rtol=1e-6)
    assert it2.dtype == jnp.int32 and int(it2) == 1234


def test_iteration_exact_below_2_24():
    p = _mk()
    for it in (1, 29999, 90000, 2**24 - 1):
        vec = p.pack({"l1": 0, "ssim": 0, "dog": 0},
                     {"vertex": 0, "opacity": 0}, np.zeros(3), it)
        assert int(p.unpack(jnp.asarray(vec))[3]) == it


def test_unpack_under_jit():
    p = _mk()
    vec = p.pack({"l1": 0.5, "ssim": 0.1, "dog": 0.0},
                 {"vertex": 1e-3, "opacity": 2e-2}, np.ones(3), 7)

    @jax.jit
    def f(v):
        w, l, bg, it = p.unpack(v)
        return w["l1"] * 2 + l["opacity"] + bg.sum() + it.astype(jnp.float32)

    np.testing.assert_allclose(float(f(jnp.asarray(vec))),
                               0.5 * 2 + 2e-2 + 3.0 + 7.0, rtol=1e-6)
