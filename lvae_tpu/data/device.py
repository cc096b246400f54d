"""Device-resident data pipeline.

The TPU-first replacement for the reference's DataLoader worker processes
+ per-batch H2D copies (SURVEY.md §2.4 "DataLoader worker processes"):
every dataset the reference supports fits in a v5e's 16 GB HBM as uint8
(CIFAR-10 60k x 32x32x3 = 184 MB; CelebA ~200k x 64x64x3 = 2.4 GB), so the
*whole split* lives on device. A training step gathers its batch by
indices and runs binarization / dequantization on the VPU, fused by XLA
into the same program as the model — the only recurring H2D transfer is a
[batch] int32 index vector (and even that disappears with
``sample_mode='fold'``).

Preprocessing semantics note (SURVEY.md §7 hard part 4): the reference
resamples dynamic binarization on host per batch; resampling on device
with a per-step PRNG key is distribution-identical (different stream).
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.data.registry import (
    PREPROCESS_BINARIZE,
    PREPROCESS_DEQUANTIZE,
    PREPROCESS_NONE,
)


def preprocess_batch(
    batch_u8: jnp.ndarray, key: Optional[jax.Array], mode: str
) -> jnp.ndarray:
    """On-device preprocessing: uint8 batch -> float32 model input in [0,1].

    Called INSIDE the jit'd train/eval step so XLA fuses it with the
    gather and the first conv (SURVEY.md §3.5 "new framework moves
    binarization/dequant on-device").
    """
    if mode == PREPROCESS_NONE:
        # binary {0,1} data stored as uint8
        return batch_u8.astype(jnp.float32)
    if mode == PREPROCESS_BINARIZE:
        probs = batch_u8.astype(jnp.float32) / 255.0
        return jax.random.bernoulli(key, probs).astype(jnp.float32)
    if mode == PREPROCESS_DEQUANTIZE:
        u = jax.random.uniform(key, batch_u8.shape, dtype=jnp.float32)
        return (batch_u8.astype(jnp.float32) + u) / 256.0
    raise ValueError(f"unknown preprocess mode {mode!r}")


def eval_preprocess_batch(
    batch_u8: jnp.ndarray, mode: str, indices: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Deterministic preprocessing for evaluation: binarization samples
    once from a FIXED key (the Bernoulli target must be binary, and the
    test set must be identical across evaluations), dequantization uses
    the bin center (u = 0.5).

    ``indices`` (int32 [B], the images' GLOBAL dataset positions) makes
    binarization per-image: each image's key is ``fold_in(key(0), index)``,
    so its binarization is independent of ``--test-batch-size`` and of its
    position in the sweep — test ELBO / IW-LL become invariant to
    evaluation batching (VERDICT round 2 weak #3). Without ``indices`` the
    whole batch-shaped array shares one key (legacy; fine for previews)."""
    if mode == PREPROCESS_NONE:
        return batch_u8.astype(jnp.float32)
    if mode == PREPROCESS_BINARIZE:
        probs = batch_u8.astype(jnp.float32) / 255.0
        if indices is None:
            return jax.random.bernoulli(
                jax.random.key(0), probs
            ).astype(jnp.float32)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(0), i)
        )(indices)
        return jax.vmap(jax.random.bernoulli)(keys, probs).astype(jnp.float32)
    if mode == PREPROCESS_DEQUANTIZE:
        return (batch_u8.astype(jnp.float32) + 0.5) / 256.0
    raise ValueError(f"unknown preprocess mode {mode!r}")


class DeviceDataset:
    """A split resident on device, gathered by per-step index vectors.

    ``sharding`` (optional ``jax.sharding.NamedSharding``) places the
    array across a mesh's data axis for multi-chip training; indices are
    then per-host (see lvae_tpu.parallel).
    """

    def __init__(
        self,
        array_u8: np.ndarray,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        arr = jnp.asarray(array_u8, dtype=jnp.uint8)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        else:
            arr = jax.device_put(arr)
        self.array = arr
        self.n = arr.shape[0]

    def epoch_indices(
        self, rng: np.random.Generator, batch_size: int, drop_remainder: bool = True
    ) -> Iterator[np.ndarray]:
        """Host-side epoch shuffle -> stream of [batch_size] index vectors."""
        perm = rng.permutation(self.n)
        end = (self.n // batch_size) * batch_size if drop_remainder else self.n
        for i in range(0, end, batch_size):
            yield perm[i : i + batch_size]

    def sequential_indices(self, batch_size: int) -> Iterator[np.ndarray]:
        """Deterministic full sweep (evaluation); last batch may be short."""
        for i in range(0, self.n, batch_size):
            yield np.arange(i, min(i + batch_size, self.n))

    def gather(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Device-side batch gather (use inside jit via the array arg)."""
        return jnp.take(self.array, indices, axis=0)


def fold_in_indices(key: jax.Array, step: jnp.ndarray, n: int, batch: int) -> jnp.ndarray:
    """Fully on-device iid batch sampling (``sample_mode='fold'``): derive
    the batch indices from (key, step) with no H2D transfer at all.
    Sampling with replacement — a distribution-preserving deviation from
    epoch shuffling, useful for peak-throughput benchmarking."""
    k = jax.random.fold_in(key, step)
    return jax.random.randint(k, (batch,), 0, n)
