"""Likelihood log-probability primitives (pure XLA, elementwise).

TPU-native re-implementation of the math in the reference's
``lib/likelihoods.py`` (SURVEY.md §2.1): Bernoulli-from-logits, Gaussian,
discretized logistic (256-bin CDF difference with edge-bin handling), and
the PixelCNN++-style discretized logistic mixture with linear channel
autoregression.

Conventions:
- images are NHWC, values in [0, 1]
- all functions return *per-element* log-probs; the caller reduces
  (sum over H, W, C -> per-sample log-likelihood)
- fp32 math throughout; these feed the ELBO so precision matters
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bernoulli_log_prob(x: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Elementwise log Bernoulli(x; sigmoid(logits)).

    Stable form: x*log_sigmoid(l) + (1-x)*log_sigmoid(-l)
               = -softplus(-l) * x - softplus(l) * (1 - x)  variant.
    Equivalent to torch.distributions.Bernoulli(logits=l).log_prob(x)
    (the oracle used in tests/test_likelihoods.py).
    """
    return x * jax.nn.log_sigmoid(logits) + (1.0 - x) * jax.nn.log_sigmoid(-logits)


def gaussian_likelihood_log_prob(
    x: jnp.ndarray, mean: jnp.ndarray, log_var: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise log N(x; mean, exp(log_var))."""
    return -0.5 * (
        jnp.log(2.0 * jnp.pi) + log_var + (x - mean) ** 2 * jnp.exp(-log_var)
    )


def _logistic_log_cdf(z: jnp.ndarray) -> jnp.ndarray:
    # log sigmoid(z), stable
    return jax.nn.log_sigmoid(z)


def _logistic_log_sf(z: jnp.ndarray) -> jnp.ndarray:
    # log(1 - sigmoid(z)) = log sigmoid(-z), stable
    return jax.nn.log_sigmoid(-z)


def _log_cdf_diff(minus_in: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Exact, cancellation-free log(sigmoid(a + delta) - sigmoid(a)).

    Identity:  sigmoid(b) - sigmoid(a) = (e^b - e^a) / ((1+e^a)(1+e^b))
                                       = e^b (1 - e^{-(b-a)}) / ((1+e^a)(1+e^b))
    so         log diff = b + log(-expm1(-(b-a))) - softplus(a) - softplus(b).

    `delta = b - a > 0` is formed directly from the bin width (never by
    subtracting two nearly-equal CDFs), so this stays accurate in fp32 even
    hundreds of nats into the tail — where the naive
    ``log(cdf(b) - cdf(a))`` catastrophically cancels.
    """
    plus_in = minus_in + delta
    return (
        plus_in
        + jnp.log(-jnp.expm1(-delta))
        - jax.nn.softplus(minus_in)
        - jax.nn.softplus(plus_in)
    )


def discretized_logistic_log_prob(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    log_scale: jnp.ndarray,
    n_bins: int = 256,
) -> jnp.ndarray:
    """Elementwise log-prob of x under a logistic discretized to `n_bins` bins.

    x holds pixel values in [0, 1] at levels k/(n_bins-1). The probability of
    bin k is the logistic CDF difference over the bin, with the edge bins
    integrating to -inf / +inf respectively (reference lib/likelihoods.py
    "256-bin CDF-difference with edge-bin handling", SURVEY.md §2.1).

    Numerically stable: uses log-CDF / log-survival at the edges and a
    log(cdf_plus - cdf_minus) with a floor in the interior, computed via
    logsumexp-style subtraction:

        log(sigmoid(b) - sigmoid(a)) = log_sigmoid(b) + log1p(-exp(log_sigmoid(a) - log_sigmoid(b)))
    """
    inv_scale = jnp.exp(-log_scale)
    half_bin = 1.0 / (2.0 * (n_bins - 1))
    plus_in = inv_scale * (x + half_bin - mean)
    minus_in = inv_scale * (x - half_bin - mean)
    delta = (2.0 * half_bin) * inv_scale

    log_interior = _log_cdf_diff(minus_in, delta)

    # Edge bins: left integrates (-inf, first_edge], right [last_edge, inf).
    log_left = _logistic_log_cdf(plus_in)
    log_right = _logistic_log_sf(minus_in)

    lo = 0.5 / (n_bins - 1)
    hi = 1.0 - 0.5 / (n_bins - 1)
    return jnp.where(x < lo, log_left, jnp.where(x > hi, log_right, log_interior))


def discretized_logistic_mix_log_prob(
    x: jnp.ndarray,
    params: jnp.ndarray,
    n_components: int = 10,
    n_bins: int = 256,
) -> jnp.ndarray:
    """Per-*pixel* (summed over channels) log-prob under a discretized
    logistic mixture with linear channel autoregression (PixelCNN++ style;
    reference lib/likelihoods.py DiscretizedLogisticMixLikelihood,
    SURVEY.md §2.1).

    x: [..., H, W, C] with C in {1, 3}, values in [0, 1].
    params: [..., H, W, K*(1 + 3*C)] laid out per component as
        [logit_pi (K)] ++ [means (K*C)] ++ [log_scales (K*C)] ++ [coeffs (K*C)]
    (coeffs present but unused for C == 1).

    Returns [..., H, W] per-pixel log-prob (channels are coupled by the
    autoregression so a per-channel factorization does not exist).
    """
    c = x.shape[-1]
    k = n_components
    logit_pi = params[..., :k]
    means = params[..., k : k + k * c]
    log_scales = params[..., k + k * c : k + 2 * k * c]
    coeffs_raw = params[..., k + 2 * k * c : k + 3 * k * c]

    new_shape = x.shape[:-1] + (k, c)
    means = means.reshape(new_shape)
    log_scales = jnp.clip(log_scales.reshape(new_shape), min=-7.0)
    coeffs = jnp.tanh(coeffs_raw.reshape(new_shape))

    # x in [0,1] -> [-1,1] like PixelCNN++ (autoregression is linear on
    # the centered scale).
    xs = (2.0 * x - 1.0)[..., None, :]  # [..., 1, C] broadcast over K

    if c == 3:
        m0 = means[..., 0]
        m1 = means[..., 1] + coeffs[..., 0] * xs[..., 0]
        m2 = means[..., 2] + coeffs[..., 1] * xs[..., 0] + coeffs[..., 2] * xs[..., 1]
        means = jnp.stack([m0, m1, m2], axis=-1)

    centered = xs - means
    inv_s = jnp.exp(-log_scales)
    half_bin = 1.0 / (n_bins - 1)  # bin half-width on the [-1,1] scale
    plus_in = inv_s * (centered + half_bin)
    minus_in = inv_s * (centered - half_bin)
    delta = (2.0 * half_bin) * inv_s

    log_interior = _log_cdf_diff(minus_in, delta)
    log_left = _logistic_log_cdf(plus_in)
    log_right = _logistic_log_sf(minus_in)

    xb = xs  # broadcasted x on [-1,1]
    log_probs_c = jnp.where(
        xb < -1.0 + half_bin,
        log_left,
        jnp.where(xb > 1.0 - half_bin, log_right, log_interior),
    )
    # Sum over channels within each component, then mix.
    log_probs_k = jnp.sum(log_probs_c, axis=-1) + jax.nn.log_softmax(logit_pi, axis=-1)
    return jax.nn.logsumexp(log_probs_k, axis=-1)
