"""Gaussian reparameterization + analytic KL (pure-XLA reference impls).

TPU-native re-implementation of the math inside the reference's
``lib/stochastic.py`` ``NormalStochasticBlock2d`` (SURVEY.md §2.1 / §3.4),
which it obtains from ``torch.distributions``:

    z  = mu_q + sigma_q * eps,    eps ~ N(0, 1)
    kl = log sigma_p - log sigma_q
         + (sigma_q^2 + (mu_q - mu_p)^2) / (2 sigma_p^2) - 1/2

Everything here is elementwise and fp32 — these functions are the
correctness oracle for the fused Pallas kernel in
``lvae_tpu.kernels.stochastic_pallas``.

Parameterization: a "params" array is the channel-concatenation
[mu, log_var] (NHWC, channels last), matching the conv projections that
produce it. We use log-variance (not log-sigma) like torch's
``Normal(mu, (0.5*lv).exp())`` pattern the reference uses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def split_params(params: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a [..., 2C] params array into (mu, log_var), each [..., C]."""
    c = params.shape[-1] // 2
    return params[..., :c], params[..., c:]


def normal_rsample(
    key: jax.Array, mu: jnp.ndarray, log_var: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Reparameterized draw z = mu + T * sigma * eps, eps ~ N(0,1).

    ``temperature`` scales the standard deviation (generation-time
    diagnostic; T=1 is the distribution itself, T=0 degenerates to the
    mode)."""
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + temperature * jnp.exp(0.5 * log_var) * eps


def logistic_rsample(key: jax.Array, mu: jnp.ndarray, log_scale: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized draw from a Logistic(mu, s): mu + s * logit(u)."""
    # Clip u away from {0,1} for a finite logit.
    u = jax.random.uniform(key, mu.shape, dtype=mu.dtype, minval=1e-6, maxval=1.0 - 1e-6)
    return mu + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u))


def sample_from_params(key: jax.Array, params: jnp.ndarray, mode: bool = False) -> jnp.ndarray:
    """Sample from N(mu, sigma) given a [mu, log_var] params array.

    With ``mode=True`` returns the distribution mode (= mu), used for the
    reference's ``mode_layers`` generation diagnostics.
    """
    mu, log_var = split_params(params)
    if mode:
        return mu
    return normal_rsample(key, mu, log_var)


def gaussian_kl(
    q_mu: jnp.ndarray,
    q_log_var: jnp.ndarray,
    p_mu: jnp.ndarray,
    p_log_var: jnp.ndarray,
) -> jnp.ndarray:
    """Elementwise analytic KL( N(q_mu, q_var) || N(p_mu, p_var) ).

    Kept per-element (per spatial location and channel) to support the
    reference's per-layer and spatial KL diagnostics (SURVEY.md §2.1,
    lib/stochastic.py keeps KL per-sample and per-location).
    """
    var_ratio = jnp.exp(q_log_var - p_log_var)
    t1 = (q_mu - p_mu) ** 2 * jnp.exp(-p_log_var)
    return 0.5 * (var_ratio + t1 - 1.0 - (q_log_var - p_log_var))


def gaussian_log_prob(x: jnp.ndarray, mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """Elementwise log N(x; mu, sigma^2)."""
    return -0.5 * (
        jnp.log(2.0 * jnp.pi) + log_var + (x - mu) ** 2 * jnp.exp(-log_var)
    )
