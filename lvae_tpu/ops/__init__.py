"""Math and distribution primitives (pure XLA reference implementations).

These are the correctness oracles for the Pallas kernels in
``lvae_tpu.kernels`` — every fused kernel has an equivalent function here
and is tested ``allclose`` against it.
"""

from lvae_tpu.ops.math import (
    crop_img_tensor,
    free_bits_kl,
    linear_anneal,
    pad_img_tensor,
)
from lvae_tpu.ops.stochastic import (
    gaussian_kl,
    gaussian_log_prob,
    logistic_rsample,
    normal_rsample,
    sample_from_params,
)
from lvae_tpu.ops.likelihoods import (
    bernoulli_log_prob,
    discretized_logistic_log_prob,
    discretized_logistic_mix_log_prob,
    gaussian_likelihood_log_prob,
)

__all__ = [
    "crop_img_tensor",
    "free_bits_kl",
    "linear_anneal",
    "pad_img_tensor",
    "gaussian_kl",
    "gaussian_log_prob",
    "logistic_rsample",
    "normal_rsample",
    "sample_from_params",
    "bernoulli_log_prob",
    "discretized_logistic_log_prob",
    "discretized_logistic_mix_log_prob",
    "gaussian_likelihood_log_prob",
]
