"""Streaming (grain-backed) input pipeline — the non-device-resident path.

The device-resident pipeline (lvae_tpu.data.device) is the default and the
fast path: every dataset the reference supports fits in HBM. This module
covers the general case the reference handled with DataLoader worker
processes (SURVEY.md §2.4): datasets larger than HBM, or environments
where host RAM should hold the data instead. Built on `grain` MapDataset
(shuffle + batch + prefetch worker threads); preprocessing still happens
on device inside the jitted step — the stream carries raw uint8.

Enable with ``--streaming`` on the CLI.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class GrainLoader:
    """Epoch-shuffled uint8 batch stream over an in-memory / memmapped array.

    Deterministic per (seed, epoch); hands out numpy batches [B, H, W, C]
    which the jitted train step uploads and preprocesses on device.
    """

    def __init__(
        self,
        array_u8: np.ndarray,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
    ):
        import grain.python as grain

        self._grain = grain
        self.array = array_u8
        self.batch_size = batch_size
        self.seed = seed
        self.num_threads = num_threads
        self.n = len(array_u8)

    def epochs(self) -> Iterator[np.ndarray]:
        """Endless stream of batches, reshuffled each epoch."""
        grain = self._grain
        ds = (
            grain.MapDataset.source(self.array)
            .seed(self.seed)
            .shuffle()
            .repeat(None)  # endless; reshuffles per epoch
            .batch(self.batch_size, drop_remainder=True)
        )
        it = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=self.num_threads, prefetch_buffer_size=8)
        )
        for batch in it:
            yield np.asarray(batch)


def make_streaming_train_step(model, tx, loss_cfg):
    """Adapter: (state, batch_u8) -> (state, metrics) reusing the standard
    step (the gather over arange is elided by XLA)."""
    import jax.numpy as jnp

    from lvae_tpu.train.state import make_train_step

    step = make_train_step(model, tx, loss_cfg)

    def s_step(state, batch_u8):
        return step(state, batch_u8, jnp.arange(batch_u8.shape[0]))

    return s_step
