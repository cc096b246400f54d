"""Likelihood heads: decoder features -> output distribution (flax.linen).

TPU-native re-design of the reference's ``lib/likelihoods.py``
``LikelihoodModule`` hierarchy (SURVEY.md §2.1): each head maps the final
top-down feature map to distribution parameters, and returns the
per-element log-likelihood of the target plus a dict with ``mean``,
``mode``, ``params`` (and a ``sample`` drawn lazily via
:func:`sample_from_likelihood` so the forward pass stays cheap).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lvae_tpu.ops.likelihoods import (
    bernoulli_log_prob,
    discretized_logistic_log_prob,
    discretized_logistic_mix_log_prob,
    gaussian_likelihood_log_prob,
)
from lvae_tpu.ops.stochastic import logistic_rsample, normal_rsample, split_params

LIKELIHOODS = ("bernoulli", "gaussian", "discretized_logistic", "discretized_logistic_mix")


class BernoulliLikelihood(nn.Module):
    """Bernoulli over binary images; params are logits."""

    color_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: Optional[jnp.ndarray]) -> Tuple[Optional[jnp.ndarray], dict]:
        logits = nn.Conv(
            self.color_ch, (1, 1), name="param_conv", dtype=self.dtype,
            kernel_init=nn.initializers.normal(1e-2),
        )(h).astype(jnp.float32)
        mean = nn.sigmoid(logits)
        data = {"params": logits, "mean": mean, "mode": jnp.round(mean)}
        ll = bernoulli_log_prob(x, logits) if x is not None else None
        return ll, data


class GaussianLikelihood(nn.Module):
    """Gaussian with learned per-pixel mean and log-variance."""

    color_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x):
        params = nn.Conv(
            2 * self.color_ch, (1, 1), name="param_conv", dtype=self.dtype,
            kernel_init=nn.initializers.normal(1e-2),
        )(h).astype(jnp.float32)
        mean, _ = split_params(params)
        data = {"params": params, "mean": mean, "mode": mean}
        if x is None:
            return None, data
        _, log_var = split_params(params)
        return gaussian_likelihood_log_prob(x, mean, log_var), data


class DiscretizedLogisticLikelihood(nn.Module):
    """256-bin discretized logistic; params are (mean, log_scale)."""

    color_ch: int
    n_bins: int = 256
    # floor on log_scale: keeps the discretization well-conditioned
    log_scale_min: float = -7.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x):
        params = nn.Conv(
            2 * self.color_ch, (1, 1), name="param_conv", dtype=self.dtype,
            kernel_init=nn.initializers.normal(1e-2),
        )(h).astype(jnp.float32)
        mean, log_scale = split_params(params)
        log_scale = jnp.maximum(log_scale, self.log_scale_min)
        data = {
            "params": jnp.concatenate([mean, log_scale], axis=-1),
            "mean": mean,
            "mode": mean,
        }
        if x is None:
            return None, data
        ll = discretized_logistic_log_prob(x, mean, log_scale, n_bins=self.n_bins)
        return ll, data


class DiscretizedLogisticMixLikelihood(nn.Module):
    """PixelCNN++-style mixture of discretized logistics with linear
    channel autoregression. Per-pixel log-prob is broadcast back to a
    per-element map (divided evenly across channels) so every head returns
    the same-shaped ll tensor."""

    color_ch: int
    n_components: int = 10
    n_bins: int = 256
    fused: bool = False   # Pallas fused log-prob kernel (kernels/mixture_pallas)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x):
        k = self.n_components
        raw = nn.Conv(
            k * (1 + 3 * self.color_ch), (1, 1), name="param_conv",
            dtype=self.dtype, kernel_init=nn.initializers.normal(1e-2),
        )(h)
        params = raw.astype(jnp.float32)
        # mixture mean (for viz): sum_k pi_k * mu_k, coeffs ignored
        logit_pi = params[..., :k]
        means = params[..., k : k + k * self.color_ch]
        means = means.reshape(means.shape[:-1] + (k, self.color_ch))
        pi = jax.nn.softmax(logit_pi, axis=-1)[..., None]
        mix_mean = jnp.clip((jnp.sum(pi * means, axis=-2) + 1.0) / 2.0, 0.0, 1.0)
        data = {"params": params, "mean": mix_mean, "mode": mix_mean}
        if x is None:
            return None, data
        if self.fused:
            from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob

            # feed the RAW (possibly bf16) conv output: the kernel upcasts
            # per block, halving the custom-call boundary traffic
            ll_pixel = fused_mix_log_prob(
                x, raw, n_components=k, n_bins=self.n_bins
            )
        else:
            ll_pixel = discretized_logistic_mix_log_prob(
                x, params, n_components=k, n_bins=self.n_bins
            )
        ll = jnp.repeat(
            ll_pixel[..., None] / self.color_ch, self.color_ch, axis=-1
        )
        return ll, data


def make_likelihood(name: str, color_ch: int, dtype=None, fused=False) -> nn.Module:
    if name == "bernoulli":
        return BernoulliLikelihood(color_ch, dtype=dtype)
    if name == "gaussian":
        return GaussianLikelihood(color_ch, dtype=dtype)
    if name == "discretized_logistic":
        return DiscretizedLogisticLikelihood(color_ch, dtype=dtype)
    if name == "discretized_logistic_mix":
        return DiscretizedLogisticMixLikelihood(color_ch, dtype=dtype, fused=fused)
    raise ValueError(f"unknown likelihood {name!r}; choose from {LIKELIHOODS}")


def sample_from_likelihood(
    key: jax.Array,
    name: str,
    params: jnp.ndarray,
    n_bins: int = 256,
    n_components: int = 10,
) -> jnp.ndarray:
    """Draw an image sample given a head's params array (outside the model)."""
    if name == "bernoulli":
        return jax.random.bernoulli(key, nn.sigmoid(params)).astype(jnp.float32)
    if name == "gaussian":
        mean, log_var = split_params(params)
        return normal_rsample(key, mean, log_var)
    if name == "discretized_logistic":
        mean, log_scale = split_params(params)
        cont = logistic_rsample(key, mean, log_scale)
        q = jnp.round(jnp.clip(cont, 0.0, 1.0) * (n_bins - 1)) / (n_bins - 1)
        return q
    if name == "discretized_logistic_mix":
        return _sample_dlogistic_mix(
            key, params, n_components=n_components, n_bins=n_bins
        )
    raise ValueError(f"unknown likelihood {name!r}")


def _sample_dlogistic_mix(
    key: jax.Array, params: jnp.ndarray, n_components: int = 10, n_bins: int = 256
) -> jnp.ndarray:
    """PixelCNN++-style mixture sampling: Gumbel-max component selection,
    logistic draw per channel, linear channel autoregression, discretize.
    Infers C from the params channel count: K*(1+3C)."""
    k = n_components
    c = (params.shape[-1] // k - 1) // 3
    logit_pi = params[..., :k]
    means = params[..., k : k + k * c].reshape(params.shape[:-1] + (k, c))
    log_scales = jnp.clip(
        params[..., k + k * c : k + 2 * k * c].reshape(params.shape[:-1] + (k, c)),
        min=-7.0,
    )
    coeffs = jnp.tanh(
        params[..., k + 2 * k * c : k + 3 * k * c].reshape(params.shape[:-1] + (k, c))
    )

    k_sel, k_draw = jax.random.split(key)
    g = jax.random.gumbel(k_sel, logit_pi.shape, dtype=params.dtype)
    sel = jnp.argmax(logit_pi + g, axis=-1)  # [..., H, W]
    take = lambda a: jnp.take_along_axis(a, sel[..., None, None], axis=-2)[..., 0, :]
    m, ls, co = take(means), take(log_scales), take(coeffs)

    u = jax.random.uniform(
        k_draw, m.shape, dtype=params.dtype, minval=1e-5, maxval=1.0 - 1e-5
    )
    draw = jnp.exp(ls) * (jnp.log(u) - jnp.log1p(-u))  # centered logistic

    x0 = jnp.clip(m[..., 0] + draw[..., 0], -1.0, 1.0)
    if c == 1:
        out = x0[..., None]
    else:
        x1 = jnp.clip(m[..., 1] + co[..., 0] * x0 + draw[..., 1], -1.0, 1.0)
        x2 = jnp.clip(
            m[..., 2] + co[..., 1] * x0 + co[..., 2] * x1 + draw[..., 2], -1.0, 1.0
        )
        out = jnp.stack([x0, x1, x2], axis=-1)
    # [-1,1] -> [0,1], snapped to the n_bins grid
    out01 = (out + 1.0) / 2.0
    return jnp.round(out01 * (n_bins - 1)) / (n_bins - 1)
