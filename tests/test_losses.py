"""Loss library semantics (reference trainer_utils.py parity properties)."""

import numpy as np
import jax.numpy as jnp
import pytest

from triangle_splatting_tpu.trainers import losses as L


RNG = np.random.default_rng(0)
IMG = jnp.asarray(RNG.uniform(size=(3, 32, 32)), jnp.float32)
IMG2 = jnp.asarray(RNG.uniform(size=(3, 32, 32)), jnp.float32)


class TestSSIM:
    def test_identical_is_one(self):
        assert abs(float(L.ssim(IMG, IMG)) - 1.0) < 1e-5

    def test_symmetric(self):
        assert abs(float(L.ssim(IMG, IMG2)) - float(L.ssim(IMG2, IMG))) < 1e-5

    def test_range(self):
        v = float(L.ssim(IMG, IMG2))
        assert -1.0 <= v <= 1.0

    def test_loss_zero_on_identical(self):
        assert abs(float(L.ssim_loss(IMG, IMG))) < 1e-5

    def test_gaussian_window_normalized(self):
        k = L._gaussian_kernel(11, 1.5)
        assert abs(k.sum() - 1.0) < 1e-6
        assert k[5, 5] == k.max()


class TestBasicMetrics:
    def test_l1_l2(self):
        a = jnp.zeros((3, 4, 4))
        b = jnp.ones((3, 4, 4)) * 2
        assert float(L.l1(a, b)) == 2.0
        assert float(L.l2(a, b)) == 4.0

    def test_psnr_identical(self):
        assert float(L.psnr(IMG, IMG)) > 90

    def test_psnr_known_value(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
        assert abs(float(L.psnr(a, b)) - 20.0) < 1e-3

    def test_psnr_masked(self):
        a = jnp.zeros((3, 8, 8))
        b = a.at[:, :4].set(1.0)
        mask = jnp.zeros((1, 8, 8)).at[:, 4:].set(1.0)  # mask away the diff
        assert float(L.psnr(a, b, mask)) > 90


class TestScharr:
    def test_ramp_gradient(self):
        ramp = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float32), (16, 16))[None]
        g = L.scharr(ramp)
        # interior x-gradient of a unit ramp is 1, y-gradient 0
        assert abs(float(g[0, 8, 8]) - 1.0) < 1e-5
        assert abs(float(g[1, 8, 8])) < 1e-5


class TestDepthNormal:
    def test_flat_plane_normal(self):
        depth = jnp.full((32, 32), 5.0)
        normal, mask = L.depth_to_normal(depth, 0.5, 0.5)
        # constant depth -> normal points straight at the camera (0, 0, -1)
        inner = np.asarray(normal[:, 8:-8, 8:-8])
        np.testing.assert_allclose(inner[2], -1.0, atol=1e-5)
        np.testing.assert_allclose(inner[:2], 0.0, atol=1e-5)

    def test_consistency_loss_zero_for_matching(self):
        depth = jnp.full((32, 32), 5.0)
        normal = jnp.zeros((3, 32, 32)).at[2].set(-1.0)
        v = float(L.depth_normal_loss(depth, normal, 0.5, 0.5))
        assert abs(v) < 1e-5


class TestMaskedLosses:
    def test_smoothness_zero_for_flat(self):
        flat = jnp.full((3, 32, 32), 0.5)
        assert abs(float(L.smoothness_loss(flat, IMG))) < 1e-6

    def test_dog_loss_runs(self):
        v = float(L.dog_loss(IMG, IMG2))
        assert np.isfinite(v) and v >= 0


class TestSeparableConv:
    """The rank-1 fast path must equal the dense lax.conv exactly-ish.

    XLA lowers small depthwise convs pathologically on TPU (PERF.md: the
    11x11 SSIM window priced 40.6 ms fwd+bwd @800x800; the separable
    shift-multiply-add form prices 2.3 ms), so depthwise_conv2d factors
    rank-1 kernels at trace time. These tests pin equivalence and the
    dense fallback for genuinely 2-D kernels.
    """

    def _dense(self, img, kernel):
        import jax
        C = img.shape[0]
        kh, kw = kernel.shape
        k = jnp.asarray(kernel)[None, None].repeat(C, axis=0)
        out = jax.lax.conv_general_dilated(
            img[None], k, window_strides=(1, 1),
            padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
            feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return out[0]

    def test_gaussian_window_matches_dense(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (3, 40, 56)).astype(np.float32))
        k = L._gaussian_kernel(11, 1.5)
        assert L._rank1_factors(k) is not None
        np.testing.assert_allclose(L.depthwise_conv2d(img, k),
                                   self._dense(img, k), atol=2e-6)

    def test_scharr_matches_dense(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (1, 33, 29)).astype(np.float32))
        for k in (L.SCHARR_X, L.SCHARR_Y):
            assert L._rank1_factors(k) is not None
            np.testing.assert_allclose(L.depthwise_conv2d(img, k),
                                       self._dense(img, k), atol=2e-6)

    def test_even_kernel_matches_dense(self):
        # even sizes exercise the asymmetric same-padding convention
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (2, 17, 21)).astype(np.float32))
        k = np.outer([1.0, 2.0, 3.0, 1.0], [0.5, 1.0]).astype(np.float32)
        assert L._rank1_factors(k) is not None
        np.testing.assert_allclose(L.depthwise_conv2d(img, k),
                                   self._dense(img, k), atol=2e-6)

    def test_non_separable_falls_back(self):
        k = np.eye(3, dtype=np.float32)  # rank 3
        assert L._rank1_factors(k) is None
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (1, 12, 12)).astype(np.float32))
        np.testing.assert_allclose(L.depthwise_conv2d(img, k),
                                   self._dense(img, k), atol=2e-6)

    def test_grad_matches_dense(self):
        import jax
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)).astype(np.float32))
        k = L._gaussian_kernel(7, 1.5)
        g1 = jax.grad(lambda x: L.depthwise_conv2d(x, k).sum())(img)
        g2 = jax.grad(lambda x: self._dense(x, k).sum())(img)
        np.testing.assert_allclose(g1, g2, atol=2e-6)

    def test_singleton_dim_kernel(self):
        # 1xN / Nx1 kernels are trivially rank-1 (SVD returns ONE singular
        # value — the guard must not index s[1])
        img = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (1, 8, 8))
                          .astype(np.float32))
        for k in (np.ones((1, 3), np.float32) / 3,
                  np.ones((3, 1), np.float32) / 3):
            np.testing.assert_allclose(L.depthwise_conv2d(img, k),
                                       self._dense(img, k), atol=2e-6)

    def test_bf16_input_upcast(self):
        # the separable fast path must keep the f32 guarantee on bf16 input
        # (bf16 accumulation reintroduces the SSIM variance cancellation)
        img = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (1, 8, 8))
                          .astype(np.float32))
        out = L.depthwise_conv2d(img.astype(jnp.bfloat16),
                                 L._gaussian_kernel(5, 1.5))
        assert out.dtype == jnp.float32
