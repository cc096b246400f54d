"""Shape and schedule utilities.

TPU-native re-implementation of the reference's ``lib/utils.py``
(``pad_img_tensor`` / ``crop_img_tensor`` / ``linear_anneal`` /
``free_bits_kl`` — see SURVEY.md §2.1, reference ``lib/utils.py:~1-120``).

Layout note: the whole framework uses NHWC (TPU-native), not the
reference's NCHW. Padding/cropping therefore acts on axes (1, 2).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def pad_img_tensor(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Pad an NHWC image batch with zeros, centered, up to spatial `size`.

    The reference pads 28x28 MNIST to 32x32 so that repeated stride-2
    downsampling is exact, then crops the decoder output back
    (reference ``lib/utils.py`` pad_img_tensor). Padding is centered:
    extra odd pixel goes to the bottom/right (matches torch's
    ``F.pad`` with (lo, hi) = (d//2, d - d//2) convention used there).
    """
    h, w = x.shape[1], x.shape[2]
    th, tw = int(size[0]), int(size[1])
    dh, dw = th - h, tw - w
    if dh < 0 or dw < 0:
        raise ValueError(f"pad target {size} smaller than input {(h, w)}")
    if dh == 0 and dw == 0:
        return x
    pad = (
        (0, 0),
        (dh // 2, dh - dh // 2),
        (dw // 2, dw - dw // 2),
        (0, 0),
    )
    return jnp.pad(x, pad)


def crop_img_tensor(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Center-crop an NHWC image batch down to spatial `size` (inverse of
    :func:`pad_img_tensor`)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = int(size[0]), int(size[1])
    dh, dw = h - th, w - tw
    if dh < 0 or dw < 0:
        raise ValueError(f"crop target {size} larger than input {(h, w)}")
    if dh == 0 and dw == 0:
        return x
    return x[:, dh // 2 : dh // 2 + th, dw // 2 : dw // 2 + tw, :]


def linear_anneal(step, start_value: float, end_value: float, n_steps: int):
    """Linear schedule from `start_value` to `end_value` over `n_steps`.

    Used for the KL-warmup beta (reference ``lib/utils.py`` linear_anneal;
    beta ramps 0 -> 1 over ``--beta-anneal`` steps). `step` may be a traced
    scalar — the implementation is branch-free so it works under jit.
    """
    if n_steps <= 0:
        return jnp.asarray(end_value, dtype=jnp.float32)
    frac = jnp.clip(jnp.asarray(step, jnp.float32) / float(n_steps), 0.0, 1.0)
    return start_value + (end_value - start_value) * frac


def free_bits_kl(kl_per_layer: jnp.ndarray, free_bits: float) -> jnp.ndarray:
    """Free-bits clamp on the *batch mean* of each layer's KL.

    `kl_per_layer` has shape [L, B] — per-layer, per-sample KL (already
    summed over latent dims / spatial locations). Returns shape [L]:
    the batch-mean KL of each layer, clamped below at `free_bits` nats.
    The training loss uses ``free_bits_kl(...).sum()``.

    Matches the reference semantics (SURVEY.md §2.1 lib/utils.py:
    "clamp the batch-mean of each layer at lambda nats") — clamping the
    mean, not each sample, so gradients still flow through samples of a
    layer whose mean is above the floor.
    """
    mean_per_layer = jnp.mean(kl_per_layer, axis=1)
    if free_bits <= 0.0:
        return mean_per_layer
    return jnp.maximum(mean_per_layer, free_bits)


def bits8_keep_threshold(rate: float) -> int:
    """Integer keep threshold for uint8-bits dropout.

    An element is kept iff its random byte ``< t``, so the realized keep
    probability is ``t/256`` — the requested ``1-rate`` quantized to 1/256
    (|error| <= 1/512). ``t >= 256`` means keep everything, ``t <= 0`` drop
    everything. Single source of truth for the quantization rule shared by
    ``models.blocks.FastDropout``, the fused-segment XLA fallback, and the
    Pallas segment kernel (``kernels.segment_pallas``).
    """
    if rate <= 0.0:
        return 256
    return int(round((1.0 - rate) * 256.0))


def bits8_dropout_f32(u: jnp.ndarray, key, t: int) -> jnp.ndarray:
    """fp32 uint8-bits dropout at threshold ``t`` (0 < t < 256).

    Masks with ``jax.random`` bytes and rescales survivors by the realized
    keep probability (``256/t``, exact expectation — see
    :func:`bits8_keep_threshold`). Caller handles the ``t <= 0`` /
    ``t >= 256`` degenerate cases and any dtype casts.
    """
    bits = jax.random.bits(key, u.shape, jnp.uint8)
    return jnp.where(bits < jnp.uint8(t), u * jnp.float32(256.0 / t), 0.0)
