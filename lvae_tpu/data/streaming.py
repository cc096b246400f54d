"""Streaming input pipeline — the non-device-resident path.

The device-resident pipeline (lvae_tpu.data.device) is the default and the
fast path: every dataset the reference supports fits in HBM. This module
covers the general case the reference handled with DataLoader worker
processes (SURVEY.md §2.4): datasets larger than HBM, or environments
where host RAM should hold the data instead. Preprocessing still happens
on device inside the jitted step — the stream carries raw uint8.

Two backends (``--stream-impl``):

- ``array`` (default, :class:`ArrayLoader`): per-epoch permutation + one
  batched numpy gather per dispatch. For RAM- or memmap-backed sources
  the gather is ~70 us per b256 stack (measured 3.6M img/s on this host
  vs grain's 32k — DESIGN.md §4), so the host can never be the
  bottleneck; no worker threads needed or used.
- ``grain`` (:class:`GrainLoader`): grain MapDataset with shuffle +
  batch + prefetch worker threads. Per-ITEM Python overhead caps it at
  ~10k img/s under training load (measured, RESULTS.md round 3) — keep
  it for genuinely disk-bound per-record sources where grain's thread
  pool hides IO latency.

Both are deterministic per (seed, epoch) and resume-exact: a preempted +
resumed ``--streaming`` run consumes exactly the batch sequence an
uninterrupted run would. Their shuffle ORDERS differ (grain's shuffle vs
numpy Philox), so checkpoints resume under the impl recorded in their
config.json, same as every other stored flag.

Composes with the rest of the trainer (VERDICT r1 item 5):
- ``--steps-per-call k``: the loader stacks k batches into one
  [k, B, H, W, C] dispatch consumed by a ``lax.scan`` multi-step.
- ``--num-data-shards n``: the batch axis is sharded over the data mesh;
  each host's grain pipeline reads only its ``process_index``-strided
  slice of the dataset and contributes its local portion via
  ``jax.make_array_from_process_local_data`` (per-host data sharding,
  SURVEY.md §3.5 / lvae_tpu.parallel.multihost).

Enable with ``--streaming`` on the CLI.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class ArrayLoader:
    """Permutation + batched-gather stream over an in-memory/memmapped array.

    The fast streaming backend (``--stream-impl array``, the default):
    each epoch draws one deterministic permutation
    (``np.random.default_rng([seed, epoch])`` — Philox, platform-stable)
    and every dispatch is ONE fancy-index gather of its k x B rows, so the
    per-batch host cost is a memcpy, not a per-item Python loop. Within an
    epoch each image appears at most once; the ``n % B`` remainder is
    dropped PER EPOCH (torch ``DataLoader(shuffle=True, drop_last=True)``
    semantics — the convention the reference trains under, SURVEY.md §2.4),
    unlike GrainLoader whose repeat-then-batch stream straddles epoch
    boundaries.

    Same API and contracts as :class:`GrainLoader`: deterministic per
    (seed, epoch); ``epochs(start_step)`` is an O(1) fast-forward (the
    epoch permutation is recomputed from its seed, nothing is read and
    discarded) so resume is exact; ``shard_index``/``shard_count``
    restrict to the per-host strided slice with per-shard shuffles.
    """

    def __init__(
        self,
        array_u8: np.ndarray,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 0,  # accepted for API parity; no threads used
        steps_per_call: int = 1,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        if shard_count > 1:
            array_u8 = array_u8[shard_index::shard_count]
        if batch_size > len(array_u8):
            raise ValueError(
                f"per-shard batch {batch_size} exceeds the shard's "
                f"{len(array_u8)} images"
            )
        self.array = array_u8
        self.batch_size = batch_size
        # Different shards must draw different shuffles, and shuffles of
        # adjacent-seed runs must be independent — seed the rng with the
        # full (seed, shard) tuple instead of additive composition (which
        # made shard 1 of seed N collide with shard 0 of seed N+1).
        self.seed = seed
        self.shard_index = shard_index
        self.steps_per_call = max(1, steps_per_call)
        self.n = len(array_u8)

    def _perm(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng([self.seed, self.shard_index, epoch])
        return rng.permutation(self.n)

    def epochs(self, start_step: int = 0) -> Iterator[np.ndarray]:
        """Endless stream of [B, ...] batches (or [k, B, ...] stacks),
        reshuffled each epoch; ``start_step`` fast-forwards to that
        optimizer step in O(1)."""
        k = self.steps_per_call
        if start_step % k:
            raise ValueError(
                f"resume step {start_step} is not a multiple of "
                f"steps_per_call {k} — the stream cannot land mid-stack"
            )
        b = self.batch_size
        bpe = self.n // b  # batches per epoch (per-epoch drop-remainder)
        g = start_step  # global batch index: one batch per optimizer step
        perm_epoch, perm = -1, None
        idx = np.empty((k, b), dtype=np.int64)
        while True:
            # a k-stack may straddle an epoch boundary; index each of its
            # batches in its own epoch's permutation
            for j in range(k):
                epoch, i = divmod(g + j, bpe)
                if epoch != perm_epoch:
                    perm, perm_epoch = self._perm(epoch), epoch
                idx[j] = perm[i * b:(i + 1) * b]
            batch = self.array[idx.ravel()]
            batch = batch.reshape((k, b) + self.array.shape[1:])
            yield batch[0] if k == 1 else batch
            g += k


class GrainLoader:
    """Epoch-shuffled uint8 batch stream over an in-memory / memmapped array.

    Deterministic per (seed, epoch); hands out numpy batches [B, H, W, C]
    (or [k, B, H, W, C] stacks with ``steps_per_call > 1``) which the
    jitted train step uploads and preprocesses on device.

    ``shard_index``/``shard_count`` restrict the pipeline to a strided
    slice of the source array — the per-host shard in multi-host training
    (pass ``jax.process_index()`` / ``jax.process_count()``).
    """

    def __init__(
        self,
        array_u8: np.ndarray,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
        steps_per_call: int = 1,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        import grain.python as grain

        if shard_count > 1:
            array_u8 = array_u8[shard_index::shard_count]
        if batch_size > len(array_u8):
            raise ValueError(
                f"per-shard batch {batch_size} exceeds the shard's "
                f"{len(array_u8)} images"
            )
        self._grain = grain
        self.array = array_u8
        self.batch_size = batch_size
        # Different shards must draw different shuffles, independent across
        # adjacent seeds too. grain takes a scalar seed, so mix (seed,
        # shard) through SeedSequence instead of adding them (additive
        # composition collides seed N shard 1 with seed N+1 shard 0).
        if shard_count > 1:
            self.seed = int(
                np.random.SeedSequence([seed, shard_index]).generate_state(1)[0]
            )
        else:
            self.seed = seed
        self.num_threads = num_threads
        self.steps_per_call = max(1, steps_per_call)
        self.n = len(array_u8)

    def epochs(self, start_step: int = 0) -> Iterator[np.ndarray]:
        """Endless stream of [B, ...] batches (or [k, B, ...] stacks),
        reshuffled each epoch.

        ``start_step`` fast-forwards the stream to that optimizer step
        (one batch per step; ``[k, B]`` stacks consume k). grain's
        MapDataset is random-access, so this is an O(1) slice of the
        infinitely-repeated shuffled sequence, not a read-and-discard —
        a preempted + resumed ``--streaming`` run consumes exactly the
        batch sequence an uninterrupted run would (resume-exact data
        order, matching the device-resident pipeline)."""
        grain = self._grain
        ds = (
            grain.MapDataset.source(self.array)
            .seed(self.seed)
            .shuffle()
            .repeat(None)  # endless; reshuffles per epoch
            .batch(self.batch_size, drop_remainder=True)
        )
        if start_step:
            if start_step % self.steps_per_call:
                raise ValueError(
                    f"resume step {start_step} is not a multiple of "
                    f"steps_per_call {self.steps_per_call} — the stream "
                    "cannot land mid-stack"
                )
            ds = ds[start_step:]
        it = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=self.num_threads, prefetch_buffer_size=8)
        )
        if self.steps_per_call == 1:
            for batch in it:
                yield np.asarray(batch)
            return
        buf = []
        for batch in it:
            buf.append(np.asarray(batch))
            if len(buf) == self.steps_per_call:
                yield np.stack(buf)
                buf = []


def make_streaming_train_step(model, tx, loss_cfg, steps_per_call: int = 1,
                              constrain_x=None):
    """(state, batch_u8) -> (state, metrics) on an explicit host-fed batch.

    With ``steps_per_call > 1`` the input is a [k, B, ...] stack consumed
    by a ``lax.scan`` (one dispatch per k steps, same as the resident
    path's ``make_multi_train_step``)."""
    from lvae_tpu.train.state import (
        make_batch_train_step,
        make_multi_batch_train_step,
    )

    if steps_per_call > 1:
        return make_multi_batch_train_step(
            model, tx, loss_cfg, steps_per_call, constrain_x
        )
    return make_batch_train_step(model, tx, loss_cfg, constrain_x)


def make_sharded_streaming_step(model, tx, loss_cfg, mesh,
                                steps_per_call: int = 1,
                                axis_name: str = "data"):
    # NB: with a 2-D (data, space) mesh the activation height sharding is
    # applied INSIDE the step (activation_constraint hook); the host-fed
    # uint8 batch itself shards on its batch axis only.
    """Data-parallel streaming step: state replicated, the batch sharded on
    its B axis (axis 0 for [B,...], axis 1 for [k, B, ...]). Returns
    ``(jitted_step, put)`` where ``put(np_batch)`` assembles the globally
    sharded device array from this process's local portion."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lvae_tpu.parallel.mesh import (
        activation_constraint,
        assert_process_contiguous,
        replicated,
    )

    # put() feeds process-LOCAL batch slices; that is only correct when
    # each process owns one contiguous equal block of the data axis —
    # reject layouts that would corrupt the batch silently.
    assert_process_contiguous(mesh, axis_name)

    base = make_streaming_train_step(
        model, tx, loss_cfg, steps_per_call,
        activation_constraint(mesh, axis_name),
    )
    spec = P(None, axis_name) if steps_per_call > 1 else P(axis_name)
    batch_sharding = NamedSharding(mesh, spec)
    rep = replicated(mesh)
    step = jax.jit(
        base,
        in_shardings=(rep, batch_sharding),
        # pin the outputs: on a 2-D (data, space) mesh the partitioner may
        # otherwise return some param leaves sharded over the spatial axis,
        # which then mismatches the replicated in_shardings on the NEXT
        # call (strictly rejected under multi-process); state must
        # round-trip replicated anyway — same pin as make_dp_train_step
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    def put(batch_np: np.ndarray) -> jax.Array:
        return jax.make_array_from_process_local_data(batch_sharding, batch_np)

    return step, put
