"""Deterministic NN building blocks (flax.linen, NHWC).

TPU-native re-design of the reference's ``lib/nn.py`` (SURVEY.md §2.1):
``ResidualBlock`` parameterized by a block-type string (ordering of
batchnorm / activation / conv / dropout, e.g. ``'bacdbacd'`` or
``'cabdcabd'``), the PixelCNN-style ``GateLayer``, and resampling residual
wrappers used by the bottom-up and top-down stacks.

All convolutions are XLA ``conv_general_dilated`` under the hood — they
tile onto the MXU; batchnorm/activation/dropout epilogues are fused by XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lvae_tpu.ops.math import bits8_dropout_f32, bits8_keep_threshold

# compute dtype: None -> fp32. With bf16, convs/batchnorm run on the MXU in
# bf16 while params (and the ELBO math in ops/) stay fp32 (SURVEY.md §2.5
# "bf16 compute / fp32 params+KL accumulation").

NONLINEARITIES: dict[str, Callable] = {
    "relu": nn.relu,
    "leakyrelu": nn.leaky_relu,
    "elu": nn.elu,
    "selu": nn.selu,
    "gelu": nn.gelu,
    "silu": nn.silu,
}


def get_nonlin(name: str) -> Callable:
    try:
        return NONLINEARITIES[name]
    except KeyError:
        raise ValueError(
            f"unknown nonlinearity {name!r}; choose from {sorted(NONLINEARITIES)}"
        ) from None


def conv_padding(conv_pad: str, k: int):
    """Spatial padding spec for a k x k convolution.

    ``'same'``: flax/XLA SAME — on even inputs with stride 2 this pads
    asymmetrically (low = total//2, high = total - low).
    ``'torch'``: the reference's symmetric torch ``padding=k//2`` on both
    sides (SURVEY.md §2.1 [M]): identical to SAME for stride-1 odd-k
    convs, but shifts the sampling grid one pixel at every stride-2
    downsampling boundary — the convention switch that makes mount-day
    weight import / 0.01-bpd parity a config flip (VERDICT round 2 #1).
    """
    if conv_pad == "same":
        return "SAME"
    if conv_pad == "torch":
        p = k // 2
        return ((p, p), (p, p))
    raise ValueError(f"unknown conv_pad {conv_pad!r}; use 'same' or 'torch'")


class GateLayer(nn.Module):
    """Gated activation a * sigmoid(b) from a 2x-channel conv projection.

    Reference: ``lib/nn.py`` GateLayer2d (PixelCNN-style gates), applied at
    the end of a gated residual block.
    """

    channels: int
    kernel_size: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            2 * self.channels, (self.kernel_size, self.kernel_size),
            dtype=self.dtype,
        )(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.sigmoid(b)


class FastDropout(nn.Module):
    """Dropout whose keep mask comes from uint8 random bits.

    ``jax.random.bernoulli`` draws an fp32 uniform (4 random bytes/element);
    at the full-resolution stages those materialized RNG words are pure HBM
    traffic in a bandwidth-bound step. Drawing uint8 bits (1 byte/element)
    and comparing against an integer threshold measured 2.4x faster for the
    mask fwd+bwd on TPU v5e (8.0 -> 3.3 ms per 4 masks at [2048,32,32,64]).

    The realized keep probability is ``round(keep*256)/256`` (|error| <=
    1/512 of the requested rate, e.g. keep 0.8 -> 205/256 = 0.80078); the
    inverse scale uses the *realized* probability and is applied in fp32
    (a bf16-rounded scale like 256/205 would bias the expectation), so
    E[output] == input exactly up to the final cast back to ``x.dtype``.
    Select ``dropout_impl='float'`` for the exact-rate fp32 path.
    """

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        t = bits8_keep_threshold(self.rate)
        if t >= 256:  # rate below the 8-bit resolution: keep everything
            return x
        if t <= 0:  # rate ~ 1.0: drop everything (nn.Dropout semantics)
            return jnp.zeros_like(x)
        u = bits8_dropout_f32(
            x.astype(jnp.float32), self.make_rng("dropout"), t
        )
        return u.astype(x.dtype)


def make_dropout(rate: float, impl: str, deterministic: bool):
    """Dropout op factory: ``impl`` is 'bits8' (TPU fast path, default) or
    'float' (flax nn.Dropout, exact rate)."""
    if impl == "bits8":
        drop = FastDropout(rate)
        return lambda h: drop(h, deterministic=deterministic)
    if impl == "float":
        drop = nn.Dropout(rate, deterministic=deterministic)
        return lambda h: drop(h)
    raise ValueError(f"unknown dropout_impl {impl!r}; use 'bits8' or 'float'")


class FusedBNActSegment(nn.Module):
    """[dropout ->] batchnorm -> activation as ONE fused unit.

    Its creator names it ``BatchNorm_n``, so the parameter / batch_stats
    tree paths are IDENTICAL to the plain ``nn.BatchNorm`` the segment
    replaces — checkpoints interop across ``--fused`` settings. In
    training mode the whole segment runs as the two-pass Pallas kernel
    (lvae_tpu.kernels.segment_pallas): the dropout mask is regenerated
    on-core in every pass (never stored), the batch stats and the full
    train-BN backward (incl. the stats correction terms) happen in-kernel.
    Eval mode is a plain fp32 map over the running stats (XLA fuses it).

    Dropout semantics match FastDropout (keep rate quantized to 1/256,
    exact-expectation rescale); the mask STREAM differs from FastDropout's
    (jax.random vs the TPU core PRNG) — dropout streams are an
    implementation detail.
    """

    # No compute-dtype knob on purpose: the segment (kernel and fallback
    # alike) always normalizes in fp32 and casts back to x.dtype, unlike
    # nn.BatchNorm(dtype=...) — BN statistics stay fp32 in bf16 runs.
    channels: int
    act: str = "elu"
    dropout_rate: float = 0.0
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.channels,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.channels,))
        )
        act = get_nonlin(self.act)
        if not train:
            xf = x.astype(jnp.float32)
            r = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = act((xf - ra_mean.value) * r * scale + bias)
            return y.astype(x.dtype)

        from lvae_tpu.kernels.segment_pallas import (
            fused_dropout_bn_act,
            segment_supported,
        )

        rate = self.dropout_rate
        key = self.make_rng("dropout") if rate > 0.0 else None
        if segment_supported(x.shape, x.shape[-1], self.act):
            y, mean, var = fused_dropout_bn_act(
                x, scale, bias, key,
                rate=rate, act=self.act, eps=self.epsilon,
            )
        else:
            # tile-unfriendly shapes: same math in plain XLA
            u = x.astype(jnp.float32)
            if rate > 0.0:
                t = bits8_keep_threshold(rate)
                if t <= 0:
                    u = jnp.zeros_like(u)
                elif t < 256:
                    u = bits8_dropout_f32(u, key, t)
            axes = tuple(range(u.ndim - 1))
            mean = jnp.mean(u, axis=axes)
            var = jnp.mean(u * u, axis=axes) - mean * mean
            r = jax.lax.rsqrt(var + self.epsilon)
            y = act((u - mean) * r * scale + bias).astype(x.dtype)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


class SubsampledBatchNorm(nn.Module):
    """BatchNorm whose training statistics come from a leading batch slice.

    In a bandwidth-bound step the train-mode stats reduction is an extra
    HBM traversal of every full-resolution activation map (BN's dominant
    cost here; removing BN entirely measures +17% img/s — DESIGN.md §4).
    Computing mean/var from ``x[:n]`` reads only ~n/B of those bytes;
    the normalize pass (and eval mode) is unchanged. This is a SEMANTIC
    DEVIATION from reference BatchNorm — noisier statistics, and gradients
    flow through the stats only for the sampled rows — so it is opt-in
    (``--bn-stat-samples``, default 0 = exact). Because epoch order is
    shuffled, a leading slice is still a uniform subsample.

    The slice MUST be contiguous, and ``n`` should be a multiple of 8
    (TPU sublane tile), measured n=16: the strided variant
    ``x[::B//n]`` was measured at a 32% end-to-end LOSS on TPU (fusion
    break — XLA kept the full activation in HBM plus a strided copy);
    the contiguous prefix fuses like exact BN and measures +1.7% img/s
    at n=16, but n=4 (sub-tile leading dim) forces padded relayouts and
    loses 65% (DESIGN.md §4, 2026-08-18). The theoretical mesh caveat
    (a leading global slice lives on shard 0 of a batch-sharded axis,
    so the stats reduction concentrates there) is a second-order effect
    next to that; semantics on a mesh are unchanged either way (GSPMD,
    slice defined on the GLOBAL batch — trajectory equality tested).

    The param / batch_stats tree (``scale``/``bias``, ``mean``/``var``)
    is IDENTICAL to ``nn.BatchNorm``'s, so the same ``BatchNorm_n`` name
    makes checkpoints interop across ``--bn-stat-samples`` settings.
    Statistics and the normalize are computed in fp32 regardless of the
    compute dtype (matching :class:`FusedBNActSegment`'s policy).
    """

    channels: int
    stat_samples: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def __post_init__(self):
        super().__post_init__()
        if self.stat_samples > 0 and self.stat_samples % 8 != 0:
            import warnings

            # warnings dedups by call site, so this fires once per process
            warnings.warn(
                f"bn_stat_samples={self.stat_samples} is not a multiple of "
                "8 (TPU sublane tile): sub-tile leading dims force padded "
                "relayouts — n=4 measured a 65% end-to-end LOSS vs exact "
                "BN (DESIGN.md §4). Use n>=8, multiple of 8.",
                stacklevel=2,
            )

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.channels,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.channels,))
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            b = x.shape[0]
            n = max(1, min(self.stat_samples, b))
            xs = x[:n].astype(jnp.float32)  # contiguous — see docstring
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axis=axes)
            # E[x^2]-E[x]^2 can dip negative in fp32 for large-mean /
            # tiny-variance channels; rsqrt of a negative is NaN
            var = jnp.maximum(
                jnp.mean(jnp.square(xs), axis=axes) - jnp.square(mean), 0.0
            )
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        y = x.astype(jnp.float32) * inv + shift
        return y.astype(x.dtype)


class ResidualBlock(nn.Module):
    """Residual block whose inner ordering is given by ``block_type``.

    Each character of ``block_type`` appends one op to the residual branch:
    ``b`` batchnorm, ``a`` activation, ``c`` 3x3 conv, ``d`` dropout.
    The reference's two documented orderings are ``'bacdbacd'`` and
    ``'cabdcabd'`` (SURVEY.md §2.1 lib/nn.py). With ``gated=True`` a
    GateLayer is applied at the end of the branch before the residual add.

    ``fused_segments=True`` collapses every ``[d] b a`` run into one
    :class:`FusedBNActSegment` (the round-3 HBM-traffic lever for the
    full-resolution stage); requires batchnorm, an elu/relu nonlinearity,
    and bits8 dropout — anything else silently keeps the unfused ops.
    """

    channels: int
    block_type: str = "bacdbacd"
    kernel_size: int = 3
    nonlin: str = "elu"
    dropout_rate: float = 0.0
    dropout_impl: str = "bits8"
    batchnorm: bool = True
    bn_stat_samples: int = 0  # 0 = exact full-batch stats; >0 = leading slice
    gated: bool = False
    conv_pad: str = "same"
    fused_segments: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = get_nonlin(self.nonlin)
        can_fuse = (
            self.fused_segments
            and self.batchnorm
            and self.bn_stat_samples == 0  # segment kernel computes full stats
            and self.nonlin in ("elu", "relu")
            and self.dropout_impl == "bits8"
        )
        chars = self.block_type
        h = x
        nb = 0  # explicit BatchNorm numbering shared by both paths
        i = 0
        while i < len(chars):
            ch = chars[i]
            if can_fuse and (
                (ch == "b" and i + 1 < len(chars) and chars[i + 1] == "a")
                or (
                    ch == "d"
                    and i + 2 < len(chars)
                    and chars[i + 1] == "b"
                    and chars[i + 2] == "a"
                )
            ):
                with_drop = ch == "d"
                h = FusedBNActSegment(
                    channels=h.shape[-1],
                    act=self.nonlin,
                    dropout_rate=self.dropout_rate if with_drop else 0.0,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"BatchNorm_{nb}",
                )(h, train)
                nb += 1
                i += 3 if with_drop else 2
                continue
            if ch == "b":
                if self.batchnorm:
                    if self.bn_stat_samples > 0:
                        h = SubsampledBatchNorm(
                            channels=h.shape[-1],
                            stat_samples=self.bn_stat_samples,
                            momentum=0.9,
                            epsilon=1e-5,
                            name=f"BatchNorm_{nb}",
                        )(h, use_running_average=not train)
                    else:
                        h = nn.BatchNorm(
                            use_running_average=not train,
                            momentum=0.9,
                            epsilon=1e-5,
                            dtype=self.dtype,
                            name=f"BatchNorm_{nb}",
                        )(h)
                    nb += 1
            elif ch == "a":
                h = act(h)
            elif ch == "c":
                h = nn.Conv(
                    self.channels, (self.kernel_size, self.kernel_size),
                    padding=conv_padding(self.conv_pad, self.kernel_size),
                    dtype=self.dtype,
                )(h)
            elif ch == "d":
                if self.dropout_rate > 0.0:
                    h = make_dropout(
                        self.dropout_rate, self.dropout_impl, not train
                    )(h)
            else:
                raise ValueError(f"unknown block_type char {ch!r} in {self.block_type!r}")
            i += 1
        if self.gated:
            h = GateLayer(self.channels, dtype=self.dtype)(h)
        return (x + h.astype(x.dtype)).astype(x.dtype)


class ResBlockWithResampling(nn.Module):
    """Optional 2x resample + channel projection, then a ResidualBlock.

    ``resample_mode='conv'`` (default): ``mode='bottom-up'`` downsamples
    with a stride-2 conv; ``mode='top-down'`` upsamples with a stride-2
    transposed conv. ``resample_mode='interpolate'``: nearest-neighbor
    2x resize (``jax.image.resize``) followed by a 1x1 channel projection —
    the reference's ``Interpolate`` wrapper option (``lib/nn.py``,
    SURVEY.md §2.1 [L]), kept as a config hedge for parity. With no
    resampling, a 1x1 conv aligns channel count when needed. Mirrors the
    reference's BottomUpDeterministicResBlock / TopDownDeterministicResBlock
    wrappers (SURVEY.md §2.1 models/lvae.py).
    """

    mode: str  # 'bottom-up' | 'top-down'
    channels: int
    resample: bool = False
    resample_mode: str = "conv"  # 'conv' | 'interpolate'
    block_type: str = "bacdbacd"
    kernel_size: int = 3
    nonlin: str = "elu"
    dropout_rate: float = 0.0
    dropout_impl: str = "bits8"
    batchnorm: bool = True
    bn_stat_samples: int = 0
    gated: bool = False
    conv_pad: str = "same"
    fused_segments: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.mode not in ("bottom-up", "top-down"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.resample_mode not in ("conv", "interpolate"):
            raise ValueError(f"unknown resample_mode {self.resample_mode!r}")
        if self.resample:
            if self.resample_mode == "interpolate":
                b, h, w, _ = x.shape
                hw = (h // 2, w // 2) if self.mode == "bottom-up" else (2 * h, 2 * w)
                x = jax.image.resize(
                    x, (b, *hw, x.shape[-1]), method="nearest"
                )
                x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
            elif self.mode == "bottom-up":
                x = nn.Conv(
                    self.channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(2, 2),
                    padding=conv_padding(self.conv_pad, self.kernel_size),
                    dtype=self.dtype,
                )(x)
            elif self.conv_pad == "torch":
                # torch ConvTranspose2d(k, s=2, padding=k//2, output_padding=1)
                # == the full ('VALID') transposed conv with the first k//2
                # rows/cols cropped, keeping the next 2H — one pixel shifted
                # vs flax SAME's top-left slice.
                h, w = x.shape[1], x.shape[2]
                p = self.kernel_size // 2
                x = nn.ConvTranspose(
                    self.channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                )(x)
                x = x[:, p : p + 2 * h, p : p + 2 * w, :]
            else:  # top-down conv, flax SAME
                x = nn.ConvTranspose(
                    self.channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(2, 2),
                    dtype=self.dtype,
                )(x)
        elif x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        return ResidualBlock(
            channels=self.channels,
            block_type=self.block_type,
            kernel_size=self.kernel_size,
            nonlin=self.nonlin,
            dropout_rate=self.dropout_rate,
            dropout_impl=self.dropout_impl,
            batchnorm=self.batchnorm,
            bn_stat_samples=self.bn_stat_samples,
            gated=self.gated,
            conv_pad=self.conv_pad,
            fused_segments=self.fused_segments,
            dtype=self.dtype,
        )(x, train)


class MergeLayer(nn.Module):
    """Merge two same-shape feature maps (inference BU + generative TD).

    ``merge_type='linear'``: 1x1 conv on the channel concat.
    ``merge_type='residual'``: 1x1 conv then a ResidualBlock.
    Reference: models/lvae.py MergeLayer (SURVEY.md §2.1; the reference
    merges in feature space, BIVA/NVAE-style, not by precision-weighting —
    see SURVEY.md §2.1 "Inference-merge semantics").
    """

    channels: int
    merge_type: str = "residual"
    block_type: str = "bacdbacd"
    nonlin: str = "elu"
    dropout_rate: float = 0.0
    dropout_impl: str = "bits8"
    batchnorm: bool = True
    bn_stat_samples: int = 0
    conv_pad: str = "same"
    fused_segments: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.concatenate([a, b], axis=-1)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        if self.merge_type == "linear":
            return x
        if self.merge_type == "residual":
            return ResidualBlock(
                channels=self.channels,
                block_type=self.block_type,
                nonlin=self.nonlin,
                dropout_rate=self.dropout_rate,
                dropout_impl=self.dropout_impl,
                batchnorm=self.batchnorm,
                bn_stat_samples=self.bn_stat_samples,
                conv_pad=self.conv_pad,
                fused_segments=self.fused_segments,
                dtype=self.dtype,
            )(x, train)
        raise ValueError(f"unknown merge_type {self.merge_type!r}")
