"""Stochastic (latent) block for the ladder (flax.linen).

TPU-native re-design of the reference's ``lib/stochastic.py``
``NormalStochasticBlock2d`` (SURVEY.md §2.1 / §3.4): conv-project the
generative and inference feature streams to Gaussian (mu, log_var) maps,
draw a reparameterized sample, compute the elementwise analytic KL, and
conv-project the sample back into the deterministic stream.

The elementwise math (reparam + KL) is delegated to ``lvae_tpu.ops``
(pure XLA) or to the fused Pallas kernel in
``lvae_tpu.kernels.stochastic_pallas`` when ``fused=True`` — both are
numerically equivalent (tested allclose); the convs always stay in XLA
where they tile onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lvae_tpu.models.blocks import conv_padding
from lvae_tpu.ops.stochastic import gaussian_kl, normal_rsample, split_params


class NormalStochasticBlock(nn.Module):
    """One Gaussian latent: p from the TD stream, q from the merged stream.

    Returns a dict with the sampled ``z``, its projection ``out`` into the
    deterministic stream, elementwise KL (inference only), and both
    parameter maps (for diagnostics and IW evaluation).
    """

    c_vars: int          # latent channels
    c_out: int           # channels of the projection back into the TD stream
    kernel_size: int = 3
    transform_p_params: bool = True  # False at the top layer (params direct)
    fused: bool = False  # use the Pallas fused sample+KL kernel
    conv_pad: str = "same"  # identical to 'torch' here (stride-1, odd k)
    dtype: Optional[Any] = None      # conv compute dtype; latent math is fp32

    @nn.compact
    def __call__(
        self,
        p_in: jnp.ndarray,
        q_in: Optional[jnp.ndarray] = None,
        *,
        forced_latent: Optional[jnp.ndarray] = None,
        forced_eps: Optional[jnp.ndarray] = None,
        use_mode: bool = False,
        constant_latent: bool = False,
        train: bool = False,
        temperature: float = 1.0,
    ) -> dict[str, Any]:
        k = (self.kernel_size, self.kernel_size)
        pad = conv_padding(self.conv_pad, self.kernel_size)
        # Near-zero-init the Gaussian parameter heads (NVAE-style): every
        # layer starts at q ~= p ~= N(0,1), so the initial KL is ~0 and deep
        # ladders don't blow up in the first optimizer steps (observed:
        # 6-layer model's bottom KL starts ~7e4 and NaNs by step 2 with
        # default conv init). A small nonzero scale (vs exact zeros) keeps
        # gradients flowing into the encoder from step 0 instead of
        # unlocking one ladder rung per step.
        head_init = nn.initializers.normal(1e-2)
        if self.transform_p_params:
            p_params = nn.Conv(
                2 * self.c_vars, k, name="conv_in_p", padding=pad,
                dtype=self.dtype, kernel_init=head_init,
            )(p_in)
        else:
            if p_in.shape[-1] != 2 * self.c_vars:
                raise ValueError(
                    f"expected direct p_params with {2 * self.c_vars} channels, "
                    f"got {p_in.shape[-1]}"
                )
            p_params = p_in

        # reparameterization + KL stay fp32 regardless of conv dtype
        p_params = p_params.astype(jnp.float32)

        q_params = None
        if q_in is not None:
            q_params = nn.Conv(
                2 * self.c_vars, k, name="conv_in_q", padding=pad,
                dtype=self.dtype, kernel_init=head_init,
            )(q_in).astype(jnp.float32)

        sampling_params = q_params if q_params is not None else p_params
        mu, log_var = split_params(sampling_params)

        kl_elementwise = None
        kl_sample = None
        if forced_latent is not None:
            z = forced_latent
        elif forced_eps is not None:
            # caller-supplied standard-normal draw: z = mu + sigma * eps.
            # Used by the cross-framework parity harness (tests share ONE
            # numpy eps stream between this model and the torch mirror, so
            # 500-step trajectories are comparable under the REAL stochastic
            # objective, not just the z=mu mode objective).
            z = mu + jnp.exp(0.5 * log_var) * forced_eps
        elif use_mode:
            z = mu
        elif self.fused and q_params is not None and train:
            # Training fast path: in-kernel KL accumulation — the [B,h,w,zc]
            # KL map never touches HBM; only per-sample sums come out. The
            # training loss needs nothing finer (free-bits clamps the batch
            # mean per layer). Eval (train=False) keeps the elementwise map
            # for the spatial-KL diagnostics.
            from lvae_tpu.kernels.stochastic_pallas import (
                fused_sample_kl_per_sample,
            )

            p_mu, p_lv = split_params(p_params)
            z, kl_sample = fused_sample_kl_per_sample(
                self.make_rng("sample"), mu, log_var, p_mu, p_lv
            )
        elif self.fused and q_params is not None:
            from lvae_tpu.kernels.stochastic_pallas import fused_sample_kl

            p_mu, p_lv = split_params(p_params)
            z, kl_elementwise = fused_sample_kl(
                self.make_rng("sample"), mu, log_var, p_mu, p_lv
            )
        else:
            # temperature != 1 only reaches this branch from the generation
            # path (prior sampling diagnostics); the fused branches above
            # require q_params and train=True.
            z = normal_rsample(
                self.make_rng("sample"), mu, log_var, temperature
            )

        if q_params is not None and kl_elementwise is None and kl_sample is None:
            p_mu, p_lv = split_params(p_params)
            kl_elementwise = gaussian_kl(mu, log_var, p_mu, p_lv)

        if constant_latent:
            # Diagnostics: share one latent draw across the whole batch
            # (reference's constant_layers option, SURVEY.md §3.3).
            z = jnp.broadcast_to(z[:1], z.shape)

        out = nn.Conv(
            self.c_out, k, name="conv_out", padding=pad, dtype=self.dtype
        )(z)
        return {
            "z": z,
            "out": out,
            "kl_elementwise": kl_elementwise,
            "kl_sample": kl_sample,   # [B] when the reduced fused path ran
            "q_params": q_params,
            "p_params": p_params,
        }
