"""Unit tests for lvae_tpu.ops.math and ops.stochastic against torch oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from lvae_tpu.ops import (
    crop_img_tensor,
    free_bits_kl,
    gaussian_kl,
    gaussian_log_prob,
    linear_anneal,
    normal_rsample,
    pad_img_tensor,
)
from lvae_tpu.ops.stochastic import split_params


class TestPadCrop:
    def test_pad_matches_torch(self, rng):
        x = rng.standard_normal((2, 28, 28, 1)).astype(np.float32)
        out = np.asarray(pad_img_tensor(jnp.asarray(x), (32, 32)))
        # torch oracle: NCHW pad with (lo, hi) = (d//2, d - d//2)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.pad(xt, (2, 2, 2, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref)

    def test_pad_odd(self, rng):
        x = rng.standard_normal((1, 5, 6, 3)).astype(np.float32)
        out = pad_img_tensor(jnp.asarray(x), (8, 9))
        assert out.shape == (1, 8, 9, 3)
        # centered: lo = d//2
        np.testing.assert_allclose(np.asarray(out)[:, 1:6, 1:7, :], x)

    def test_crop_inverts_pad(self, rng):
        x = rng.standard_normal((3, 28, 28, 1)).astype(np.float32)
        back = crop_img_tensor(pad_img_tensor(jnp.asarray(x), (32, 32)), (28, 28))
        np.testing.assert_allclose(np.asarray(back), x)

    def test_crop_odd_inverts_pad(self, rng):
        x = rng.standard_normal((1, 5, 6, 2)).astype(np.float32)
        back = crop_img_tensor(pad_img_tensor(jnp.asarray(x), (8, 9)), (5, 6))
        np.testing.assert_allclose(np.asarray(back), x)

    def test_noop(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
        assert pad_img_tensor(x, (4, 4)) is x
        assert crop_img_tensor(x, (4, 4)) is x


class TestLinearAnneal:
    def test_endpoints_and_midpoint(self):
        assert float(linear_anneal(0, 0.0, 1.0, 100)) == 0.0
        assert float(linear_anneal(100, 0.0, 1.0, 100)) == 1.0
        assert float(linear_anneal(200, 0.0, 1.0, 100)) == 1.0
        np.testing.assert_allclose(float(linear_anneal(50, 0.0, 1.0, 100)), 0.5)

    def test_disabled(self):
        # n_steps <= 0 -> constant end value (no warmup)
        assert float(linear_anneal(0, 0.0, 1.0, 0)) == 1.0

    def test_jittable(self):
        f = jax.jit(lambda s: linear_anneal(s, 0.0, 1.0, 10))
        np.testing.assert_allclose(float(f(5)), 0.5)


class TestFreeBits:
    def test_no_clamp_when_zero(self, rng):
        kl = jnp.asarray(rng.uniform(0, 2, (3, 16)).astype(np.float32))
        out = free_bits_kl(kl, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(kl.mean(axis=1)), rtol=1e-6)

    def test_clamps_batch_mean_per_layer(self):
        kl = jnp.array([[0.1, 0.1], [2.0, 2.0], [0.4, 0.8]], dtype=jnp.float32)
        out = np.asarray(free_bits_kl(kl, 0.5))
        np.testing.assert_allclose(out, [0.5, 2.0, 0.6], rtol=1e-6)

    def test_gradient_blocked_below_floor(self):
        # Below the floor the clamp is active -> zero grad; above -> mean grad.
        def loss(kl):
            return free_bits_kl(kl, 0.5).sum()

        kl = jnp.array([[0.1, 0.1], [2.0, 2.0]], dtype=jnp.float32)
        g = np.asarray(jax.grad(loss)(kl))
        np.testing.assert_allclose(g[0], [0.0, 0.0])
        np.testing.assert_allclose(g[1], [0.5, 0.5])


class TestGaussian:
    def test_kl_matches_torch_distributions(self, rng):
        qm = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        qlv = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 0.5
        pm = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        plv = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 0.5

        out = np.asarray(gaussian_kl(*map(jnp.asarray, (qm, qlv, pm, plv))))

        q = torch.distributions.Normal(torch.tensor(qm), torch.tensor(qlv / 2).exp())
        p = torch.distributions.Normal(torch.tensor(pm), torch.tensor(plv / 2).exp())
        ref = torch.distributions.kl_divergence(q, p).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_log_prob_matches_torch(self, rng):
        x = rng.standard_normal((16,)).astype(np.float32)
        mu = rng.standard_normal((16,)).astype(np.float32)
        lv = rng.standard_normal((16,)).astype(np.float32)
        out = np.asarray(gaussian_log_prob(*map(jnp.asarray, (x, mu, lv))))
        ref = (
            torch.distributions.Normal(torch.tensor(mu), torch.tensor(lv / 2).exp())
            .log_prob(torch.tensor(x))
            .numpy()
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_rsample_moments(self):
        key = jax.random.key(0)
        mu = jnp.full((200_000,), 1.5)
        lv = jnp.full((200_000,), np.log(4.0))  # sigma = 2
        z = normal_rsample(key, mu, lv)
        assert abs(float(z.mean()) - 1.5) < 0.02
        assert abs(float(z.std()) - 2.0) < 0.02

    def test_split_params(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 4, 4, 6)).astype(np.float32))
        mu, lv = split_params(p)
        assert mu.shape == (2, 4, 4, 3) and lv.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(p[..., :3]))
