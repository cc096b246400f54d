"""The Ladder VAE model (flax.linen, NHWC).

TPU-native re-design of the reference's ``models/lvae.py`` ``LadderVAE``
(SURVEY.md §2.1, §3.1, §3.3): a bottom-up deterministic conv encoder
collecting per-scale features, and a top-down generative decoder whose
per-layer Gaussian latents are inferred by merging bottom-up and top-down
streams in feature space (BIVA/NVAE-style learned merge — see SURVEY.md
§2.1 "Inference-merge semantics"), with a learned (or standard-normal)
top prior, optional stochastic skip connections, and a pluggable
likelihood head.

Functional design notes (vs the reference's stateful torch modules):
- ``__call__`` is the inference pass; ``topdown_pass`` doubles as the
  generative path when ``bu_values is None`` — the same weights trace to
  two jitted programs instead of branching at runtime.
- KL is returned per-layer / per-sample (and spatially) — free-bits
  clamping and the warmup beta live in the *loss*, outside the module.
- Latent indices: layer 0 is the bottom (closest to data), layer L-1 the
  top. ``z_dims[i]`` / ``downsample[i]`` follow this order.
- Randomness comes from the ``'sample'`` PRNG collection; dropout from
  ``'dropout'``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from lvae_tpu.models.blocks import (
    MergeLayer,
    ResBlockWithResampling,
    ResidualBlock,
    conv_padding,
    get_nonlin,
)
from lvae_tpu.models.likelihoods import make_likelihood
from lvae_tpu.models.stochastic import NormalStochasticBlock
from lvae_tpu.ops.math import crop_img_tensor, pad_img_tensor


class TopDownLayer(nn.Module):
    """One rung of the generative ladder.

    Inference: q = conv(merge(bu_value, td_state)), p = conv(td_state)
    (top rung: p = top prior params, q = conv(bu_value)).
    Generation (``bu_value=None``): sample from p.
    After the latent, the sample is projected back into the deterministic
    stream, optionally merged with a residual bypass of the incoming
    td_state (``stochastic_skip``), then run through ``n_res_blocks``
    deterministic blocks which also perform this rung's upsampling.
    """

    z_dim: int
    n_filters: int
    n_res_blocks: int
    upsample_steps: int = 0
    is_top: bool = False
    learn_top_prior: bool = False
    top_prior_hw: Tuple[int, int] = (4, 4)
    stochastic_skip: bool = False
    # Where the stochastic-skip bypass merges back in:
    # 'pre'  — with td_in before the deterministic blocks (pre-upsampling
    #          scale; cheaper — the merge runs at the coarser resolution).
    # 'post' — after the deterministic blocks (post-upsampling scale), the
    #          SURVEY §3.4 reconstruction of the reference's wiring
    #          ("out = SkipMerger(TD blocks(...), prev_td_state)"); td_in is
    #          brought to the output scale by parameter-free nearest resize.
    # Same parameter shapes either way — checkpoints port across modes.
    skip_merge_mode: str = "pre"
    merge_type: str = "residual"
    block_type: str = "bacdbacd"
    nonlin: str = "elu"
    dropout_rate: float = 0.0
    dropout_impl: str = "bits8"
    batchnorm: bool = True
    bn_stat_samples: int = 0  # 0 = exact; >0 = leading-slice BN stats
    gated: bool = False
    fused: bool = False
    fused_segments: bool = False  # Pallas [d]ba segments (kernels/segment_pallas)
    resample_mode: str = "conv"  # 'conv' | 'interpolate' (lib/nn.py Interpolate)
    conv_pad: str = "same"       # 'same' | 'torch' (symmetric k//2 padding)
    dtype: Optional[Any] = None
    remat: bool = False   # rematerialize residual blocks (memory vs FLOPs)

    def setup(self):
        common = dict(
            block_type=self.block_type,
            nonlin=self.nonlin,
            dropout_rate=self.dropout_rate,
            dropout_impl=self.dropout_impl,
            batchnorm=self.batchnorm,
            bn_stat_samples=self.bn_stat_samples,
            conv_pad=self.conv_pad,
            fused_segments=self.fused_segments,
            dtype=self.dtype,
        )
        if not self.is_top:
            self.merge = MergeLayer(
                channels=self.n_filters, merge_type=self.merge_type, **common
            )
        if self.stochastic_skip:
            self.skip_merge = MergeLayer(
                channels=self.n_filters, merge_type=self.merge_type, **common
            )
        self.stochastic = NormalStochasticBlock(
            c_vars=self.z_dim,
            c_out=self.n_filters,
            transform_p_params=not self.is_top,
            fused=self.fused,
            conv_pad=self.conv_pad,
            dtype=self.dtype,
        )
        if self.is_top and self.learn_top_prior:
            h, w = self.top_prior_hw
            self.top_prior = self.param(
                "top_prior",
                nn.initializers.zeros,
                (1, h, w, 2 * self.z_dim),
            )
        Block = (
            nn.remat(ResBlockWithResampling, static_argnums=(2,))
            if self.remat
            else ResBlockWithResampling
        )
        blocks = []
        for i in range(self.n_res_blocks):
            blocks.append(
                Block(
                    mode="top-down",
                    channels=self.n_filters,
                    resample=i < self.upsample_steps,
                    resample_mode=self.resample_mode,
                    gated=self.gated,
                    **common,
                )
            )
        self.det_blocks = blocks

    def _top_prior_params(self, batch: int) -> jnp.ndarray:
        h, w = self.top_prior_hw
        if self.learn_top_prior:
            p = self.top_prior
        else:
            p = jnp.zeros((1, h, w, 2 * self.z_dim))
        return jnp.broadcast_to(p, (batch, h, w, 2 * self.z_dim))

    def __call__(
        self,
        td_in: Optional[jnp.ndarray],
        bu_value: Optional[jnp.ndarray],
        *,
        train: bool,
        n_img_prior: Optional[int] = None,
        use_mode: bool = False,
        forced_latent: Optional[jnp.ndarray] = None,
        forced_eps: Optional[jnp.ndarray] = None,
        constant_latent: bool = False,
        temperature: float = 1.0,
    ) -> Tuple[jnp.ndarray, dict[str, Any]]:
        if self.is_top:
            if bu_value is not None:
                batch = bu_value.shape[0]
            elif n_img_prior is not None:
                batch = n_img_prior
            else:
                raise ValueError("top layer needs bu_value or n_img_prior")
            p_in = self._top_prior_params(batch)
        else:
            if td_in is None:
                raise ValueError("non-top layer needs incoming top-down state")
            p_in = td_in

        if bu_value is not None:
            q_in = bu_value if self.is_top else self.merge(bu_value, td_in, train)
        else:
            q_in = None

        s = self.stochastic(
            p_in,
            q_in,
            forced_latent=forced_latent,
            forced_eps=forced_eps,
            use_mode=use_mode,
            constant_latent=constant_latent,
            train=train,
            temperature=temperature,
        )
        h = s["out"]
        do_skip = self.stochastic_skip and td_in is not None
        if do_skip and self.skip_merge_mode == "pre":
            # Residual bypass around the latent injection, merged at the
            # pre-upsampling scale (cheaper; see skip_merge_mode above).
            h = self.skip_merge(h, td_in, train)
        for blk in self.det_blocks:
            h = blk(h, train)
        if do_skip and self.skip_merge_mode == "post":
            skip = td_in
            if skip.shape[1] != h.shape[1] or skip.shape[2] != h.shape[2]:
                skip = jax.image.resize(
                    skip, (skip.shape[0], h.shape[1], h.shape[2], skip.shape[-1]),
                    method="nearest",
                )
            h = self.skip_merge(h, skip, train)
        return h, s


class LadderVAE(nn.Module):
    """Hierarchical Ladder VAE. See module docstring for conventions."""

    color_ch: int
    z_dims: Sequence[int] = (32, 32, 32)
    blocks_per_layer: int = 2
    n_filters: int = 64
    stochastic_skip: bool = False
    skip_merge_mode: str = "pre"  # 'pre' | 'post' (see TopDownLayer)
    gated: bool = False
    downsample: Sequence[int] = (1, 1, 1)
    learn_top_prior: bool = False
    img_size: Tuple[int, int] = (32, 32)      # padded model resolution
    data_size: Tuple[int, int] = (28, 28)     # true data resolution
    likelihood: str = "bernoulli"
    batchnorm: bool = True
    # >0: train-mode BN statistics from the leading this-many batch rows
    # (bandwidth lever, semantic deviation — see blocks.py
    # SubsampledBatchNorm). 0 (default): exact full-batch stats.
    bn_stat_samples: int = 0
    dropout_rate: float = 0.2
    dropout_impl: str = "bits8"   # 'bits8' (uint8 mask bits) | 'float' (fp32 uniform)
    nonlin: str = "elu"
    res_block_type: str = "bacdbacd"
    merge_type: str = "residual"
    resample_mode: str = "conv"   # 'conv' | 'interpolate' (lib/nn.py Interpolate)
    conv_pad: str = "same"        # 'same' (flax/XLA) | 'torch' (symmetric k//2)
    no_initial_downscaling: bool = False
    # Per-kernel Pallas switches (resolved from the --fused policy string by
    # train.trainer.resolve_fused; measured win/tie/loss per RESULTS.md):
    fused_stochastic: bool = False  # reparam+KL kernel (ties XLA; opt-in)
    fused_mixture: bool = False     # mixture-head log-prob kernel (wins on TPU)
    fused_segments: bool = False  # fuse [d]ba runs into Pallas segments
    dtype: Optional[Any] = None   # conv compute dtype (None=fp32; bf16 for MXU)
    remat: bool = False           # rematerialize res blocks (memory vs FLOPs)

    @property
    def n_layers(self) -> int:
        return len(self.z_dims)

    def _scales(self) -> list[int]:
        """Downsampling factor (log2) at the *output* of each BU layer."""
        if len(self.downsample) != self.n_layers:
            raise ValueError("downsample must have one entry per layer")
        if any(d > self.blocks_per_layer for d in self.downsample):
            # each block performs at most one 2x resample (setup():
            # resample = j < downsample[i]); a larger request would
            # silently drop resamples and break BU/TD shape agreement
            raise ValueError(
                f"downsample {tuple(self.downsample)} has an entry larger "
                f"than blocks_per_layer {self.blocks_per_layer}: a layer "
                "can resample at most once per block"
            )
        init = 0 if self.no_initial_downscaling else 1
        scales, s = [], init
        for d in self.downsample:
            s += d
            scales.append(s)
        return scales

    def setup(self):
        common = dict(
            block_type=self.res_block_type,
            nonlin=self.nonlin,
            dropout_rate=self.dropout_rate,
            dropout_impl=self.dropout_impl,
            batchnorm=self.batchnorm,
            bn_stat_samples=self.bn_stat_samples,
            conv_pad=self.conv_pad,
            fused_segments=self.fused_segments,
            dtype=self.dtype,
        )
        scales = self._scales()
        total = scales[-1]
        h, w = self.img_size
        if h % (1 << total) or w % (1 << total):
            raise ValueError(
                f"img_size {self.img_size} not divisible by 2^{total} "
                f"(initial downscale + sum(downsample))"
            )

        # --- bottom-up (inference) path ---
        Block = (
            nn.remat(ResBlockWithResampling, static_argnums=(2,))
            if self.remat
            else ResBlockWithResampling
        )
        stem_stride = (1, 1) if self.no_initial_downscaling else (2, 2)
        self.first_conv = nn.Conv(
            self.n_filters, (5, 5), strides=stem_stride,
            padding=conv_padding(self.conv_pad, 5), dtype=self.dtype,
        )
        self.first_block = ResidualBlock(
            channels=self.n_filters, gated=self.gated, **common
        )
        bu = []
        for i in range(self.n_layers):
            layer_blocks = []
            for j in range(self.blocks_per_layer):
                layer_blocks.append(
                    Block(
                        mode="bottom-up",
                        channels=self.n_filters,
                        resample=j < self.downsample[i],
                        resample_mode=self.resample_mode,
                        gated=self.gated,
                        **common,
                    )
                )
            bu.append(layer_blocks)
        self.bottom_up_layers = bu

        # --- top-down (generative) path ---
        td = []
        for i in range(self.n_layers):
            is_top = i == self.n_layers - 1
            td.append(
                TopDownLayer(
                    z_dim=self.z_dims[i],
                    n_filters=self.n_filters,
                    n_res_blocks=self.blocks_per_layer,
                    upsample_steps=self.downsample[i],
                    is_top=is_top,
                    learn_top_prior=self.learn_top_prior,
                    top_prior_hw=(h >> scales[-1], w >> scales[-1]),
                    stochastic_skip=self.stochastic_skip,
                    skip_merge_mode=self.skip_merge_mode,
                    merge_type=self.merge_type,
                    resample_mode=self.resample_mode,
                    gated=self.gated,
                    fused=self.fused_stochastic,
                    remat=self.remat,
                    **common,
                )
            )
        self.top_down_layers = td

        final = []
        if not self.no_initial_downscaling:
            final.append(
                Block(
                    mode="top-down",
                    channels=self.n_filters,
                    resample=True,
                    resample_mode=self.resample_mode,
                    gated=self.gated,
                    **common,
                )
            )
        final.append(
            ResidualBlock(channels=self.n_filters, gated=self.gated, **common)
        )
        self.final_blocks = final
        self.likelihood_head = make_likelihood(
            self.likelihood, self.color_ch, dtype=self.dtype,
            fused=self.fused_mixture,
        )

    # ------------------------------------------------------------------
    # passes
    # ------------------------------------------------------------------
    def bottomup_pass(self, x: jnp.ndarray, *, train: bool) -> list[jnp.ndarray]:
        act = get_nonlin(self.nonlin)
        h = self.first_block(act(self.first_conv(x)), train)
        bu_values = []
        for layer_blocks in self.bottom_up_layers:
            for blk in layer_blocks:
                h = blk(h, train)
            bu_values.append(h)
        return bu_values

    def topdown_pass(
        self,
        bu_values: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        *,
        train: bool = False,
        n_img_prior: Optional[int] = None,
        forced_latent: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        forced_eps: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        mode_layers: Sequence[int] = (),
        constant_layers: Sequence[int] = (),
        temperature: Union[float, Sequence[float]] = 1.0,
    ) -> Tuple[jnp.ndarray, dict[str, Any]]:
        """Top-down pass; the generative path when ``bu_values is None``
        (reference models/lvae.py topdown_pass — SURVEY.md §3.3).
        ``temperature`` scales the sampling std (generation diagnostics) —
        a scalar for all layers or one value per layer (layer 0 = bottom);
        T=0 at a layer degenerates to its mode, like ``mode_layers``."""
        L = self.n_layers
        if bu_values is None:
            bu_values = [None] * L
        if forced_latent is None:
            forced_latent = [None] * L
        if forced_eps is None:
            forced_eps = [None] * L
        if isinstance(temperature, (int, float)):
            temps = [float(temperature)] * L
        else:
            temps = [float(t) for t in temperature]
            if len(temps) == 1:
                temps = temps * L
            elif len(temps) != L:
                raise ValueError(
                    f"temperature needs 1 or {L} values, got {len(temps)}"
                )

        td = None
        layer_data: list[dict[str, Any]] = [None] * L  # type: ignore[list-item]
        for i in reversed(range(L)):
            td, s = self.top_down_layers[i](
                td,
                bu_values[i],
                train=train,
                n_img_prior=n_img_prior,
                use_mode=i in mode_layers,
                forced_latent=forced_latent[i],
                forced_eps=forced_eps[i],
                constant_latent=i in constant_layers,
                temperature=temps[i],
            )
            layer_data[i] = s
        for blk in self.final_blocks:
            td = blk(td, train)

        info = {
            "z": [d["z"] for d in layer_data],
            "kl_elementwise": [d["kl_elementwise"] for d in layer_data],
            "kl_sample": [d.get("kl_sample") for d in layer_data],
            "q_params": [d["q_params"] for d in layer_data],
            "p_params": [d["p_params"] for d in layer_data],
        }
        return td, info

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> dict[str, Any]:
        """Full inference pass. `x` is the raw-resolution image batch in
        [0,1] (already binarized / dequantized by the input pipeline)."""
        x_pad = pad_img_tensor(x, self.img_size)
        bu_values = self.bottomup_pass(x_pad, train=train)
        td, info = self.topdown_pass(bu_values, train=train)
        td = crop_img_tensor(td, self.data_size)

        ll, lik_data = self.likelihood_head(td, x)

        # per-sample reductions (fp32): ll summed over H,W,C; KL per layer.
        # The fused-reduced train path already accumulated per-sample KL
        # in-kernel (kl_sample); elementwise maps (and hence the spatial-KL
        # diagnostics) exist on every other path.
        ll_sample = jnp.sum(ll, axis=(1, 2, 3))
        kl_sep = jnp.stack(
            [
                ks if ks is not None else jnp.sum(ke, axis=(1, 2, 3))
                for ks, ke in zip(info["kl_sample"], info["kl_elementwise"])
            ]
        )  # [L, B]
        kl_spatial = [
            jnp.sum(k, axis=-1) if k is not None else None
            for k in info["kl_elementwise"]
        ]

        return {
            "ll": ll_sample,
            "kl_sep": kl_sep,
            "kl_spatial": kl_spatial,
            "z": info["z"],
            "q_params": info["q_params"],
            "p_params": info["p_params"],
            "out_mean": lik_data["mean"],
            "out_mode": lik_data["mode"],
            "out_params": lik_data["params"],
        }

    def sample_prior(
        self,
        n_img: int,
        *,
        mode_layers: Sequence[int] = (),
        constant_layers: Sequence[int] = (),
        temperature: Union[float, Sequence[float]] = 1.0,
    ) -> dict[str, Any]:
        """Generate from the prior (reference sample_prior, SURVEY.md §3.3).
        ``temperature`` may be per-layer (see :meth:`topdown_pass`)."""
        td, info = self.topdown_pass(
            None,
            train=False,
            n_img_prior=n_img,
            mode_layers=mode_layers,
            constant_layers=constant_layers,
            temperature=temperature,
        )
        td = crop_img_tensor(td, self.data_size)
        _, lik_data = self.likelihood_head(td, None)
        return {
            "out_mean": lik_data["mean"],
            "out_mode": lik_data["mode"],
            "out_params": lik_data["params"],
            "z": info["z"],
        }
