"""PyTorch mirror of lvae_tpu's LadderVAE for offline parity testing.

VERDICT round 1 item 2: with the reference mount empty and no network,
the only way to de-risk the 0.01-bpd parity target is a torch-CPU mirror
built from SURVEY.md §2.1's architecture (reference ``models/lvae.py`` /
``lib/*``), weight-ported through the ``docs/CHECKPOINT_FORMAT.md``
mapping. ``tests/test_parity.py`` asserts (i) same-weights same-input
ELBO agreement, (ii) N-step Adamax training-trajectory agreement
(``torch.optim.Adamax`` vs ``optax.adamax``), and (iii) BatchNorm
running-stats parity.

Layout conventions bridged here (see docs/CHECKPOINT_FORMAT.md):
- NHWC (flax) vs NCHW (torch); conv kernels ``[kh,kw,in,out]`` vs
  ``[out,in,kh,kw]`` (transpose ``(3,2,0,1)`` flax->torch).
- flax ``nn.Conv(padding='SAME')`` with stride 2 on even inputs pads
  asymmetrically (low = total//2, high = total - low); mirrored via
  ``F.pad`` + ``padding=0`` convs (verified exact).
- flax ``nn.ConvTranspose(strides=2, padding='SAME')`` equals torch
  ``F.conv_transpose2d(x, w, stride=2, padding=0)`` with the kernel
  spatially FLIPPED and laid out ``[in,out,kh,kw]``, sliced to the
  top-left ``[.., :2H, :2W]`` corner (verified exact for k=3, s=2 —
  the only transposed-conv shape the model uses).
- torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9);
  torch tracks the UNBIASED batch var in running_var while flax tracks
  the biased one — test (iii) reconciles with the n/(n-1) factor.

Convention switches (VERDICT round 2 #1 — both sides now support both):
- ``conv_pad='same'`` (flax/XLA SAME) or ``'torch'`` (the reference's
  symmetric ``padding=k//2``; transposed convs use literal
  ``F.conv_transpose2d(padding=k//2, output_padding=1)`` semantics,
  which lvae_tpu reproduces with a VALID transposed conv sliced
  ``[k//2 : k//2 + 2H]``).
- ``skip_merge_mode='pre'`` (merge before the TD blocks) or ``'post'``
  (after upsampling, skip stream nearest-resized — SURVEY §3.4's
  reading of the reference wiring).
The parity battery in tests/test_parity.py runs in BOTH modes, so
whichever convention the mounted reference turns out to use, matching
it is a config flip with test coverage already in place.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

NONLIN_T = {
    "relu": F.relu,
    "leakyrelu": F.leaky_relu,
    "elu": F.elu,
    "selu": F.selu,
    "gelu": F.gelu,
    "silu": F.silu,
}


def _same_pad(x: torch.Tensor, k: int, s: int) -> torch.Tensor:
    """flax/XLA SAME padding: total = max((ceil(H/s)-1)*s + k - H, 0)."""
    h, w = x.shape[-2], x.shape[-1]
    ph = max((-(-h // s) - 1) * s + k - h, 0)
    pw = max((-(-w // s) - 1) * s + k - w, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class SameConv2d(nn.Module):
    """Conv2d with selectable padding semantics (weight [out,in,kh,kw]):
    flax-SAME (``conv_pad='same'``) or the reference's symmetric
    ``padding=k//2`` (``'torch'``)."""

    def __init__(self, cin: int, cout: int, k: int, stride: int = 1,
                 conv_pad: str = "same"):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(cout, cin, k, k))
        self.bias = nn.Parameter(torch.zeros(cout))
        self.k, self.stride, self.conv_pad = k, stride, conv_pad

    def forward(self, x):
        if self.conv_pad == "torch":
            return F.conv2d(
                x, self.weight, self.bias, stride=self.stride,
                padding=self.k // 2,
            )
        return F.conv2d(
            _same_pad(x, self.k, self.stride), self.weight, self.bias,
            stride=self.stride,
        )


class SameConvTranspose2d(nn.Module):
    """Transposed conv with selectable semantics (weight [in,out,kh,kw],
    spatially flipped from the flax kernel at port time):

    - ``conv_pad='same'``: flax ConvTranspose(SAME, s=2) == full transposed
      conv sliced to the top-left s*H x s*W (verified exact for k=3, s=2).
    - ``conv_pad='torch'``: literal torch
      ``conv_transpose2d(padding=k//2, output_padding=s-1)`` — the
      reference's ConvTranspose2d exact-2x-upsampling configuration; the
      flax side reproduces it with a VALID transposed conv sliced
      ``[k//2 : k//2 + s*H]``.
    """

    def __init__(self, cin: int, cout: int, k: int, stride: int = 2,
                 conv_pad: str = "same"):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(cin, cout, k, k))
        self.bias = nn.Parameter(torch.zeros(cout))
        self.k, self.stride, self.conv_pad = k, stride, conv_pad

    def forward(self, x):
        h, w = x.shape[-2], x.shape[-1]
        if self.conv_pad == "torch":
            return F.conv_transpose2d(
                x, self.weight, self.bias, stride=self.stride,
                padding=self.k // 2, output_padding=self.stride - 1,
            )
        y = F.conv_transpose2d(x, self.weight, self.bias, stride=self.stride)
        return y[:, :, : h * self.stride, : w * self.stride]


class GateLayerT(nn.Module):
    """lvae_tpu.models.blocks.GateLayer: a * sigmoid(b) from a 1x1 conv."""

    def __init__(self, channels: int):
        super().__init__()
        self.Conv_0 = SameConv2d(channels, 2 * channels, 1)

    def forward(self, x):
        a, b = torch.chunk(self.Conv_0(x), 2, dim=1)
        return a * torch.sigmoid(b)


class ResidualBlockT(nn.Module):
    """lvae_tpu.models.blocks.ResidualBlock (block-type-string ordering)."""

    def __init__(self, channels: int, block_type: str = "bacdbacd",
                 kernel_size: int = 3, nonlin: str = "elu",
                 dropout_rate: float = 0.0, batchnorm: bool = True,
                 gated: bool = False, conv_pad: str = "same"):
        super().__init__()
        self.block_type = block_type
        self.nonlin = NONLIN_T[nonlin]
        self.dropout_rate = dropout_rate
        self.batchnorm = batchnorm
        self.gated = gated
        nb = nc = 0
        for ch in block_type:
            if ch == "b" and batchnorm:
                # torch momentum 0.1 == flax momentum 0.9 (new = 0.9 old + 0.1 batch)
                setattr(self, f"BatchNorm_{nb}",
                        nn.BatchNorm2d(channels, eps=1e-5, momentum=0.1))
                nb += 1
            elif ch == "c":
                setattr(self, f"Conv_{nc}",
                        SameConv2d(channels, channels, kernel_size,
                                   conv_pad=conv_pad))
                nc += 1
        if gated:
            self.GateLayer_0 = GateLayerT(channels)

    def forward(self, x):
        h = x
        nb = nc = 0
        for ch in self.block_type:
            if ch == "b":
                if self.batchnorm:
                    h = getattr(self, f"BatchNorm_{nb}")(h)
                    nb += 1
            elif ch == "a":
                h = self.nonlin(h)
            elif ch == "c":
                h = getattr(self, f"Conv_{nc}")(h)
                nc += 1
            elif ch == "d":
                if self.dropout_rate > 0.0:
                    h = F.dropout(h, self.dropout_rate, self.training)
        if self.gated:
            h = self.GateLayer_0(h)
        return x + h


class ResBlockWithResamplingT(nn.Module):
    """lvae_tpu.models.blocks.ResBlockWithResampling."""

    def __init__(self, mode: str, channels: int, cin: int,
                 resample: bool = False, **block_kw):
        super().__init__()
        self.resample, self.mode = resample, mode
        conv_pad = block_kw.get("conv_pad", "same")
        if resample:
            if mode == "bottom-up":
                self.Conv_0 = SameConv2d(cin, channels, 3, stride=2,
                                         conv_pad=conv_pad)
            else:
                self.ConvTranspose_0 = SameConvTranspose2d(
                    cin, channels, 3, 2, conv_pad=conv_pad
                )
        elif cin != channels:
            self.Conv_0 = SameConv2d(cin, channels, 1)
        self.ResidualBlock_0 = ResidualBlockT(channels, **block_kw)

    def forward(self, x):
        if self.resample:
            x = (self.Conv_0(x) if self.mode == "bottom-up"
                 else self.ConvTranspose_0(x))
        elif hasattr(self, "Conv_0"):
            x = self.Conv_0(x)
        return self.ResidualBlock_0(x)


class MergeLayerT(nn.Module):
    """lvae_tpu.models.blocks.MergeLayer (gated=False always, like flax)."""

    def __init__(self, channels: int, merge_type: str = "residual", **block_kw):
        super().__init__()
        self.merge_type = merge_type
        self.Conv_0 = SameConv2d(2 * channels, channels, 1)
        if merge_type == "residual":
            block_kw.pop("gated", None)
            self.ResidualBlock_0 = ResidualBlockT(channels, **block_kw)

    def forward(self, a, b):
        x = self.Conv_0(torch.cat([a, b], dim=1))
        if self.merge_type == "residual":
            x = self.ResidualBlock_0(x)
        return x


class NormalStochasticBlockT(nn.Module):
    """lvae_tpu.models.stochastic.NormalStochasticBlock with deterministic
    sampling (z = mu + sigma*eps with caller-supplied eps, or z = mu, or a
    forced z) so jax and torch see identical latents."""

    def __init__(self, c_in: int, c_vars: int, c_out: int,
                 transform_p_params: bool = True, kernel_size: int = 3):
        super().__init__()
        self.c_vars = c_vars
        self.transform_p_params = transform_p_params
        if transform_p_params:
            self.conv_in_p = SameConv2d(c_in, 2 * c_vars, kernel_size)
        self.conv_in_q = SameConv2d(c_in, 2 * c_vars, kernel_size)
        self.conv_out = SameConv2d(c_vars, c_out, kernel_size)

    def forward(self, p_in, q_in, eps=None, forced_z=None):
        p_params = self.conv_in_p(p_in) if self.transform_p_params else p_in
        p_mu, p_lv = torch.chunk(p_params, 2, dim=1)
        q_params = self.conv_in_q(q_in) if q_in is not None else None
        if q_params is not None:
            mu, lv = torch.chunk(q_params, 2, dim=1)
        else:
            mu, lv = p_mu, p_lv
        if forced_z is not None:
            z = forced_z
        elif eps is None:
            z = mu  # mode
        else:
            z = mu + torch.exp(0.5 * lv) * eps
        kl = None
        if q_params is not None:
            kl = 0.5 * (
                torch.exp(lv - p_lv) + (mu - p_mu) ** 2 * torch.exp(-p_lv)
                - 1.0 - lv + p_lv
            )
        return {"z": z, "out": self.conv_out(z), "kl_elementwise": kl}


class TopDownLayerT(nn.Module):
    """lvae_tpu.models.lvae.TopDownLayer."""

    def __init__(self, z_dim: int, n_filters: int, n_res_blocks: int,
                 upsample_steps: int = 0, is_top: bool = False,
                 learn_top_prior: bool = False, top_prior_hw=(4, 4),
                 stochastic_skip: bool = False, merge_type: str = "residual",
                 gated: bool = False, skip_merge_mode: str = "pre",
                 **block_kw):
        super().__init__()
        self.is_top, self.z_dim = is_top, z_dim
        self.learn_top_prior = learn_top_prior
        self.top_prior_hw = top_prior_hw
        self.stochastic_skip = stochastic_skip
        self.skip_merge_mode = skip_merge_mode
        merge_kw = dict(block_kw)
        if not is_top:
            self.merge = MergeLayerT(n_filters, merge_type, **merge_kw)
        if stochastic_skip and not is_top:
            # the top layer's td_in is always None, so flax never calls (and
            # therefore never materializes) a top skip_merge — mirror that
            self.skip_merge = MergeLayerT(n_filters, merge_type, **merge_kw)
        self.stochastic = NormalStochasticBlockT(
            n_filters, z_dim, n_filters, transform_p_params=not is_top
        )
        if is_top and learn_top_prior:
            h, w = top_prior_hw
            self.top_prior = nn.Parameter(torch.zeros(1, 2 * z_dim, h, w))
        for j in range(n_res_blocks):
            setattr(self, f"det_blocks_{j}", ResBlockWithResamplingT(
                "top-down", n_filters, n_filters,
                resample=j < upsample_steps, gated=gated, **block_kw,
            ))
        self.n_res_blocks = n_res_blocks

    def forward(self, td_in, bu_value, eps=None, forced_z=None, batch=None):
        if self.is_top:
            b = bu_value.shape[0] if bu_value is not None else batch
            if self.learn_top_prior:
                p_in = self.top_prior.expand(b, -1, -1, -1)
            else:
                h, w = self.top_prior_hw
                p_in = torch.zeros(b, 2 * self.z_dim, h, w)
        else:
            p_in = td_in
        if bu_value is not None:
            q_in = bu_value if self.is_top else self.merge(bu_value, td_in)
        else:
            q_in = None
        s = self.stochastic(p_in, q_in, eps=eps, forced_z=forced_z)
        h = s["out"]
        do_skip = self.stochastic_skip and td_in is not None
        if do_skip and self.skip_merge_mode == "pre":
            h = self.skip_merge(h, td_in)
        for j in range(self.n_res_blocks):
            h = getattr(self, f"det_blocks_{j}")(h)
        if do_skip and self.skip_merge_mode == "post":
            skip = td_in
            if skip.shape[-2:] != h.shape[-2:]:
                skip = F.interpolate(skip, size=h.shape[-2:], mode="nearest")
            h = self.skip_merge(h, skip)
        return h, s


class BernoulliLikelihoodT(nn.Module):
    def __init__(self, c_features: int, color_ch: int):
        super().__init__()
        self.param_conv = SameConv2d(c_features, color_ch, 1)

    def forward(self, h, x):
        logits = self.param_conv(h)
        ll = None
        if x is not None:
            ll = x * F.logsigmoid(logits) + (1.0 - x) * F.logsigmoid(-logits)
        return ll, logits


def _log_cdf_diff_t(minus_in, delta):
    """torch mirror of ops.likelihoods._log_cdf_diff: exact,
    cancellation-free log(sigmoid(a + delta) - sigmoid(a))."""
    plus_in = minus_in + delta
    return (
        plus_in
        + torch.log(-torch.expm1(-delta))
        - F.softplus(minus_in)
        - F.softplus(plus_in)
    )


class DiscretizedLogisticLikelihoodT(nn.Module):
    """torch mirror of models.likelihoods.DiscretizedLogisticLikelihood
    (256-bin CDF difference with edge-bin handling; same cancellation-free
    interior identity as ops.likelihoods.discretized_logistic_log_prob)."""

    def __init__(self, c_features: int, color_ch: int, n_bins: int = 256):
        super().__init__()
        self.param_conv = SameConv2d(c_features, 2 * color_ch, 1)
        self.n_bins = n_bins

    def forward(self, h, x):
        p = self.param_conv(h)
        mean, log_scale = torch.chunk(p, 2, dim=1)
        log_scale = torch.clamp(log_scale, min=-7.0)
        ll = None
        if x is not None:
            nb = self.n_bins
            inv_scale = torch.exp(-log_scale)
            half_bin = 1.0 / (2.0 * (nb - 1))
            plus_in = inv_scale * (x + half_bin - mean)
            minus_in = inv_scale * (x - half_bin - mean)
            delta = (2.0 * half_bin) * inv_scale
            log_interior = _log_cdf_diff_t(minus_in, delta)
            log_left = F.logsigmoid(plus_in)
            log_right = F.logsigmoid(-minus_in)
            lo = 0.5 / (nb - 1)
            hi = 1.0 - 0.5 / (nb - 1)
            ll = torch.where(
                x < lo, log_left, torch.where(x > hi, log_right, log_interior)
            )
        return ll, p


class DiscretizedLogisticMixLikelihoodT(nn.Module):
    """torch mirror of models.likelihoods.DiscretizedLogisticMixLikelihood
    (PixelCNN++-style mixture, linear channel autoregression; channel
    layout [pi (K)] ++ [means (KC)] ++ [log_scales (KC)] ++ [coeffs (KC)]
    with component-major/channel-minor (k, c) sub-layout, matching
    ops.likelihoods.discretized_logistic_mix_log_prob)."""

    def __init__(self, c_features: int, color_ch: int,
                 n_components: int = 10, n_bins: int = 256):
        super().__init__()
        self.param_conv = SameConv2d(
            c_features, n_components * (1 + 3 * color_ch), 1
        )
        self.color_ch = color_ch
        self.k = n_components
        self.n_bins = n_bins

    def forward(self, h, x):
        p = self.param_conv(h)
        ll = None
        if x is not None:
            b, c, hh, ww = x.shape
            k = self.k
            logit_pi = p[:, :k]
            means = p[:, k : k + k * c].view(b, k, c, hh, ww)
            log_scales = torch.clamp(
                p[:, k + k * c : k + 2 * k * c].view(b, k, c, hh, ww),
                min=-7.0,
            )
            coeffs = torch.tanh(
                p[:, k + 2 * k * c : k + 3 * k * c].view(b, k, c, hh, ww)
            )
            xs = (2.0 * x - 1.0).unsqueeze(1)  # [B,1,C,H,W] broadcast over K
            if c == 3:
                m0 = means[:, :, 0]
                m1 = means[:, :, 1] + coeffs[:, :, 0] * xs[:, :, 0]
                m2 = (means[:, :, 2] + coeffs[:, :, 1] * xs[:, :, 0]
                      + coeffs[:, :, 2] * xs[:, :, 1])
                means = torch.stack([m0, m1, m2], dim=2)
            centered = xs - means
            inv_s = torch.exp(-log_scales)
            half_bin = 1.0 / (self.n_bins - 1)
            plus_in = inv_s * (centered + half_bin)
            minus_in = inv_s * (centered - half_bin)
            delta = (2.0 * half_bin) * inv_s
            log_interior = _log_cdf_diff_t(minus_in, delta)
            log_left = F.logsigmoid(plus_in)
            log_right = F.logsigmoid(-minus_in)
            xb = xs.expand_as(means)
            lp = torch.where(
                xb < -1.0 + half_bin,
                log_left,
                torch.where(xb > 1.0 - half_bin, log_right, log_interior),
            )
            log_probs_k = lp.sum(dim=2) + F.log_softmax(logit_pi, dim=1)
            ll_pixel = torch.logsumexp(log_probs_k, dim=1)  # [B,H,W]
            # per-element map like the flax head: per-pixel / C per channel
            ll = ll_pixel.unsqueeze(1).expand(-1, c, -1, -1) / c
        return ll, p


class LadderVAET(nn.Module):
    """Torch mirror of lvae_tpu.models.lvae.LadderVAE (NCHW).

    Latent sampling is deterministic: per-layer ``eps`` (or ``forced_z``)
    tensors are passed to ``forward`` so the jax and torch models compute
    identical ELBOs / gradients. All three deterministic-ll likelihood
    heads are mirrored (bernoulli, discretized_logistic,
    discretized_logistic_mix — VERDICT r3 next #4); the Gaussian head is
    covered by unit-level torch-oracle parity in tests/test_likelihoods.py.
    """

    def __init__(self, color_ch: int, z_dims=(4, 4), blocks_per_layer: int = 1,
                 n_filters: int = 8, stochastic_skip: bool = False,
                 gated: bool = False, downsample=(1, 1),
                 learn_top_prior: bool = False, img_size=(16, 16),
                 data_size=(14, 14), batchnorm: bool = True,
                 dropout_rate: float = 0.0, nonlin: str = "elu",
                 res_block_type: str = "bacdbacd", merge_type: str = "residual",
                 no_initial_downscaling: bool = False, conv_pad: str = "same",
                 skip_merge_mode: str = "pre", likelihood: str = "bernoulli"):
        super().__init__()
        self.n_layers = len(z_dims)
        self.img_size, self.data_size = img_size, data_size
        self.no_initial_downscaling = no_initial_downscaling
        self.nonlin = NONLIN_T[nonlin]
        block_kw = dict(block_type=res_block_type, nonlin=nonlin,
                        dropout_rate=dropout_rate, batchnorm=batchnorm,
                        conv_pad=conv_pad)

        init = 0 if no_initial_downscaling else 1
        scales, s = [], init
        for d in downsample:
            s += d
            scales.append(s)
        h, w = img_size

        self.first_conv = SameConv2d(
            color_ch, n_filters, 5, stride=1 if no_initial_downscaling else 2,
            conv_pad=conv_pad,
        )
        self.first_block = ResidualBlockT(n_filters, gated=gated, **block_kw)
        for i in range(self.n_layers):
            for j in range(blocks_per_layer):
                setattr(self, f"bottom_up_layers_{i}_{j}", ResBlockWithResamplingT(
                    "bottom-up", n_filters, n_filters,
                    resample=j < downsample[i], gated=gated, **block_kw,
                ))
            setattr(self, f"top_down_layers_{i}", TopDownLayerT(
                z_dim=z_dims[i], n_filters=n_filters,
                n_res_blocks=blocks_per_layer, upsample_steps=downsample[i],
                is_top=i == self.n_layers - 1, learn_top_prior=learn_top_prior,
                top_prior_hw=(h >> scales[-1], w >> scales[-1]),
                stochastic_skip=stochastic_skip, merge_type=merge_type,
                gated=gated, skip_merge_mode=skip_merge_mode, **block_kw,
            ))
        self.blocks_per_layer = blocks_per_layer
        nf = 0
        if not no_initial_downscaling:
            setattr(self, f"final_blocks_{nf}", ResBlockWithResamplingT(
                "top-down", n_filters, n_filters, resample=True,
                gated=gated, **block_kw,
            ))
            nf += 1
        setattr(self, f"final_blocks_{nf}",
                ResidualBlockT(n_filters, gated=gated, **block_kw))
        self.n_final = nf + 1
        if likelihood == "bernoulli":
            self.likelihood_head = BernoulliLikelihoodT(n_filters, color_ch)
        elif likelihood == "discretized_logistic":
            self.likelihood_head = DiscretizedLogisticLikelihoodT(
                n_filters, color_ch
            )
        elif likelihood == "discretized_logistic_mix":
            self.likelihood_head = DiscretizedLogisticMixLikelihoodT(
                n_filters, color_ch
            )
        else:
            raise ValueError(f"unmirrored likelihood {likelihood!r}")

    def forward(self, x, eps=None, forced_z=None):
        """x: [B, C, h, w] in [0,1]. eps / forced_z: per-layer lists (bottom
        -> top) or None (mode sampling, z = mu)."""
        L = self.n_layers
        eps = eps if eps is not None else [None] * L
        forced_z = forced_z if forced_z is not None else [None] * L

        th, tw = self.img_size
        h0, w0 = x.shape[-2], x.shape[-1]
        dh, dw = th - h0, tw - w0
        xp = F.pad(x, (dw // 2, dw - dw // 2, dh // 2, dh - dh // 2))

        h = self.first_block(self.nonlin(self.first_conv(xp)))
        bu_values = []
        for i in range(L):
            for j in range(self.blocks_per_layer):
                h = getattr(self, f"bottom_up_layers_{i}_{j}")(h)
            bu_values.append(h)

        td = None
        kls = [None] * L
        for i in reversed(range(L)):
            td, s = getattr(self, f"top_down_layers_{i}")(
                td, bu_values[i], eps=eps[i], forced_z=forced_z[i]
            )
            kls[i] = s["kl_elementwise"]
        for j in range(self.n_final):
            td = getattr(self, f"final_blocks_{j}")(td)

        ch, cw = td.shape[-2] - h0, td.shape[-1] - w0
        td = td[:, :, ch // 2 : ch // 2 + h0, cw // 2 : cw // 2 + w0]
        ll, logits = self.likelihood_head(td, x)
        ll_sample = ll.sum(dim=(1, 2, 3))
        kl_sep = torch.stack([k.sum(dim=(1, 2, 3)) for k in kls])  # [L, B]
        return {"ll": ll_sample, "kl_sep": kl_sep, "logits": logits}


def data_dependent_init_torch(
    tmodel: nn.Module, conv_paths, x: torch.Tensor,
    max_gain: float = 10.0, eps: float = 1e-6, n_iter: int = 1,
) -> None:
    """torch mirror of lvae_tpu.train.init.data_dependent_init: walk the
    convolutions in execution order (``conv_paths``, flax path tuples —
    the same list the jax side derives, resolved here via the shared
    attribute naming); for each, run a fresh forward, rescale that conv's
    kernel by 1/std and shift its bias by -mean/std per OUTPUT channel
    (std clipped to [1/max_gain, max_gain], biased estimator, matching
    jnp.std). The model must be deterministic for numerics parity (z =
    mu: forward with eps=None; dropout off)."""
    tmodel.train()
    for _ in range(n_iter):
        for path in conv_paths:
            mod = _resolve(tmodel, path)
            captured = {}
            handle = mod.register_forward_hook(
                lambda m, i, o: captured.__setitem__("out", o)
            )
            with torch.no_grad():
                tmodel(x)
                handle.remove()
                out = captured["out"]
                dims = tuple(d for d in range(out.ndim) if d != 1)
                mean = out.mean(dim=dims)
                std = torch.clamp(
                    out.std(dim=dims, unbiased=False), 1.0 / max_gain, max_gain
                ) + eps
                # out-channel axis: dim 0 for conv [out,in,kh,kw], dim 1
                # for transposed [in,out,kh,kw]
                if isinstance(mod, SameConvTranspose2d):
                    mod.weight.div_(std[None, :, None, None])
                else:
                    mod.weight.div_(std[:, None, None, None])
                mod.bias.copy_((mod.bias - mean) / std)


# ---------------------------------------------------------------------------
# weight port: flax params/batch_stats -> the torch mirror
# ---------------------------------------------------------------------------

def _resolve(tmodel: nn.Module, path) -> nn.Module:
    obj = tmodel
    for comp in path:
        obj = getattr(obj, comp)
    return obj


def port_params_to_torch(params, batch_stats, tmodel: LadderVAET) -> None:
    """Copy a flax param tree into the mirror via the CHECKPOINT_FORMAT.md
    name mapping. Conversions: conv kernels [kh,kw,in,out]->[out,in,kh,kw];
    transposed-conv kernels flipped spatially -> [in,out,kh,kw]; BN
    scale->weight; top_prior NHWC->NCHW."""
    from flax.traverse_util import flatten_dict

    with torch.no_grad():
        for path, val in flatten_dict(params).items():
            # copy: np.asarray of a jax array is read-only, torch warns
            v = np.array(val, dtype=np.float32)
            leaf = path[-1]
            if leaf == "top_prior":
                _resolve(tmodel, path[:-1]).top_prior.copy_(
                    torch.from_numpy(v.transpose(0, 3, 1, 2)))
                continue
            mod = _resolve(tmodel, path[:-1])
            if leaf == "kernel":
                if isinstance(mod, SameConvTranspose2d):
                    w = v[::-1, ::-1].transpose(2, 3, 0, 1)  # flip, [in,out,kh,kw]
                else:
                    w = v.transpose(3, 2, 0, 1)
                mod.weight.copy_(torch.from_numpy(np.ascontiguousarray(w)))
            elif leaf == "bias":
                mod.bias.copy_(torch.from_numpy(v))
            elif leaf == "scale":
                mod.weight.copy_(torch.from_numpy(v))
            else:
                raise KeyError(f"unmapped param leaf {path}")
        for path, val in flatten_dict(batch_stats or {}).items():
            v = torch.from_numpy(np.array(val, dtype=np.float32))
            mod = _resolve(tmodel, path[:-1])
            if path[-1] == "mean":
                mod.running_mean.copy_(v)
            elif path[-1] == "var":
                mod.running_var.copy_(v)
            else:
                raise KeyError(f"unmapped batch_stat leaf {path}")


def torch_params_as_flax(tmodel: LadderVAET, params_template) -> dict:
    """Read the mirror's parameters back into a flax-shaped tree (inverse
    of port_params_to_torch) for trajectory comparisons."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    out = {}
    for path, val in flatten_dict(params_template).items():
        leaf = path[-1]
        if leaf == "top_prior":
            t = _resolve(tmodel, path[:-1]).top_prior.detach().numpy()
            out[path] = t.transpose(0, 2, 3, 1)
            continue
        mod = _resolve(tmodel, path[:-1])
        if leaf == "kernel":
            w = mod.weight.detach().numpy()
            if isinstance(mod, SameConvTranspose2d):
                out[path] = np.ascontiguousarray(
                    w.transpose(2, 3, 0, 1)[::-1, ::-1])
            else:
                out[path] = w.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            out[path] = mod.bias.detach().numpy()
        elif leaf == "scale":
            out[path] = mod.weight.detach().numpy()
        else:
            raise KeyError(f"unmapped param leaf {path}")
    return unflatten_dict(out)
