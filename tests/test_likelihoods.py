"""Likelihood log-prob tests against torch / numpy oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from lvae_tpu.ops import (
    bernoulli_log_prob,
    discretized_logistic_log_prob,
    discretized_logistic_mix_log_prob,
    gaussian_likelihood_log_prob,
)


class TestBernoulli:
    def test_matches_torch(self, rng):
        logits = rng.standard_normal((4, 8, 8, 1)).astype(np.float32) * 3
        x = (rng.uniform(size=(4, 8, 8, 1)) < 0.5).astype(np.float32)
        out = np.asarray(bernoulli_log_prob(jnp.asarray(x), jnp.asarray(logits)))
        ref = (
            torch.distributions.Bernoulli(logits=torch.tensor(logits))
            .log_prob(torch.tensor(x))
            .numpy()
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_extreme_logits_stable(self):
        logits = jnp.array([-50.0, 50.0])
        x = jnp.array([0.0, 1.0])
        out = np.asarray(bernoulli_log_prob(x, logits))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, [0.0, 0.0], atol=1e-6)


class TestGaussianLikelihood:
    def test_matches_torch(self, rng):
        x = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
        mean = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
        lv = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        out = np.asarray(
            gaussian_likelihood_log_prob(*map(jnp.asarray, (x, mean, lv)))
        )
        ref = (
            torch.distributions.Normal(torch.tensor(mean), torch.tensor(lv / 2).exp())
            .log_prob(torch.tensor(x))
            .numpy()
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def _np_discretized_logistic(x, mean, log_scale, n_bins=256):
    """Independent float64 oracle via scipy's logistic logcdf/logsf.

    Interior bins use log(cdf(b)-cdf(a)) = logcdf(b) + log1p(-exp(logcdf(a)
    - logcdf(b))) in float64, which is accurate because the bin width gives
    logcdf(a) - logcdf(b) ~ -O(bin/scale), far above fp64 rounding."""
    from scipy.stats import logistic

    x = x.astype(np.float64)
    mean = mean.astype(np.float64)
    s = np.exp(log_scale.astype(np.float64))
    half = 1.0 / (2 * (n_bins - 1))

    a = (x - half - mean) / s
    b = (x + half - mean) / s
    lcdf_b = logistic.logcdf(b)
    lcdf_a = logistic.logcdf(a)
    lsf_a = logistic.logsf(a)
    lsf_b = logistic.logsf(b)
    with np.errstate(divide="ignore"):
        via_cdf = lcdf_b + np.log1p(-np.exp(lcdf_a - lcdf_b))
        via_sf = lsf_a + np.log1p(-np.exp(lsf_b - lsf_a))
    # cdf form is accurate in the left tail, sf form in the right tail
    interior = np.where((a + b) < 0, via_cdf, via_sf)
    return np.where(x < half, lcdf_b, np.where(x > 1.0 - half, lsf_a, interior))


class TestDiscretizedLogistic:
    def test_matches_float64_oracle(self, rng):
        k = rng.integers(0, 256, size=(4, 8, 8, 3))
        x = (k / 255.0).astype(np.float32)
        mean = rng.uniform(-0.2, 1.2, size=x.shape).astype(np.float32)
        log_scale = rng.uniform(-5, 0, size=x.shape).astype(np.float32)
        out = np.asarray(
            discretized_logistic_log_prob(
                jnp.asarray(x), jnp.asarray(mean), jnp.asarray(log_scale)
            )
        )
        ref = _np_discretized_logistic(x, mean, log_scale)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_sums_to_one(self):
        # Total probability over all 256 bins ~= 1 for a well-centered dist.
        x = jnp.arange(256, dtype=jnp.float32) / 255.0
        mean = jnp.full_like(x, 0.37)
        log_scale = jnp.full_like(x, -3.0)
        lp = np.asarray(discretized_logistic_log_prob(x, mean, log_scale))
        np.testing.assert_allclose(np.exp(lp).sum(), 1.0, rtol=1e-5)

    def test_edge_bins_finite(self):
        x = jnp.array([0.0, 1.0])
        mean = jnp.array([0.9, 0.1])  # far from the observed edge values
        log_scale = jnp.array([-6.0, -6.0])
        lp = np.asarray(discretized_logistic_log_prob(x, mean, log_scale))
        assert np.all(np.isfinite(lp))


class TestDiscretizedLogisticMixture:
    def test_single_component_reduces_to_plain(self, rng):
        # K=1, C=1, zero coeff -> per-pixel mix log-prob equals plain
        # discretized logistic with matched parameterization ([-1,1] scale).
        x01 = (rng.integers(0, 256, size=(2, 4, 4, 1)) / 255.0).astype(np.float32)
        mean = rng.uniform(-0.5, 0.5, size=(2, 4, 4, 1)).astype(np.float32)
        log_scale = rng.uniform(-4, -1, size=(2, 4, 4, 1)).astype(np.float32)
        params = np.concatenate(
            [np.zeros((2, 4, 4, 1), np.float32), mean, log_scale,
             np.zeros((2, 4, 4, 1), np.float32)],
            axis=-1,
        )
        out = np.asarray(
            discretized_logistic_mix_log_prob(jnp.asarray(x01), jnp.asarray(params), n_components=1)
        )
        # oracle on the [-1,1] scale with bin half-width 1/255:
        x2 = (2 * x01 - 1).astype(np.float64).squeeze(-1)
        m = mean.astype(np.float64).squeeze(-1)
        s = np.exp(log_scale.astype(np.float64)).squeeze(-1)
        half = 1.0 / 255.0

        def cdf(v):
            return 1.0 / (1.0 + np.exp(-(v - m) / s))

        p = cdf(x2 + half) - cdf(x2 - half)
        p = np.where(x2 < -1 + half, cdf(x2 + half), p)
        p = np.where(x2 > 1 - half, 1 - cdf(x2 - half), p)
        ref = np.log(np.maximum(p, 1e-300))
        # naive fp64 oracle cancels mildly past ~-30 nats; 5e-4 covers it
        np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-5)

    def test_rgb_shapes_and_finite(self, rng):
        k = 10
        x = (rng.integers(0, 256, size=(2, 8, 8, 3)) / 255.0).astype(np.float32)
        params = rng.standard_normal((2, 8, 8, k * 10)).astype(np.float32)
        out = np.asarray(
            discretized_logistic_mix_log_prob(jnp.asarray(x), jnp.asarray(params), n_components=k)
        )
        assert out.shape == (2, 8, 8)
        assert np.all(np.isfinite(out))

    def test_mixture_weights_normalize(self, rng):
        # Uniform mixture of identical components == single component.
        x = (rng.integers(0, 256, size=(1, 4, 4, 1)) / 255.0).astype(np.float32)
        mean = rng.uniform(-0.5, 0.5, size=(1, 4, 4, 1)).astype(np.float32)
        ls = np.full((1, 4, 4, 1), -2.0, np.float32)
        k = 5
        params_k = np.concatenate(
            [np.zeros((1, 4, 4, k), np.float32),
             np.repeat(mean, k, -1), np.repeat(ls, k, -1),
             np.zeros((1, 4, 4, k), np.float32)],
            axis=-1,
        )
        params_1 = np.concatenate(
            [np.zeros((1, 4, 4, 1), np.float32), mean, ls,
             np.zeros((1, 4, 4, 1), np.float32)],
            axis=-1,
        )
        out_k = np.asarray(discretized_logistic_mix_log_prob(jnp.asarray(x), jnp.asarray(params_k), n_components=k))
        out_1 = np.asarray(discretized_logistic_mix_log_prob(jnp.asarray(x), jnp.asarray(params_1), n_components=1))
        np.testing.assert_allclose(out_k, out_1, rtol=1e-5, atol=1e-6)
