"""Device mesh + sharding declarations for multi-chip training.

The reference is a single-process single-GPU codebase with NO distributed
support (SURVEY.md §2.5: no DataParallel/DDP, no torch.distributed, no
NCCL). This module is the new framework's first-class replacement: a
1-D ``data`` mesh (a ``model`` axis is reserved for completeness — the
LVAE is far too small to need tensor parallelism, see SURVEY.md §2.5) and
jit-compiled SPMD sharding:

- parameters / optimizer state / EMA: replicated
- the device-resident uint8 dataset: replicated (every split the
  reference supports fits per-chip HBM; replication makes the per-step
  batch gather purely local)
- per-step index vector and therefore the batch: sharded on ``data``

Under ``jax.jit`` with these shardings XLA's SPMD partitioner inserts the
gradient all-reduce (psum over ICI) automatically — there is no
hand-written communication, per the scaling-book recipe (mesh +
annotations + let XLA place collectives). With ``--rng-impl threefry``,
jax.random generates sharded arrays position-consistently, so per-device
RNG streams need no manual splitting: the same key yields the same global
batch regardless of mesh size, making 1-chip vs N-chip runs
bitwise-comparable. The default 'rbg' impl trades that invariance for
~25% faster steps (its streams differ across shardings but remain valid
iid draws).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "data",
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def make_dp_train_step(
    train_step, mesh: Mesh, axis_name: str = "data", idx_batch_axis: int = 0
):
    """Wrap a (state, data, idx) -> (state, metrics) step with data-parallel
    shardings: state + dataset replicated, idx (hence batch) sharded.
    ``idx_batch_axis=1`` for the [K, batch] multi-step index matrix."""
    rep = replicated(mesh)
    spec = [None] * idx_batch_axis + [axis_name]
    batch = NamedSharding(mesh, P(*spec))
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, batch),
        donate_argnums=(0,),
    )


def make_dp_eval_step(eval_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (state, batch_u8, key, idx) -> metrics step: the batch and
    its global-index vector shard on the data axis."""
    rep = replicated(mesh)
    batch = shard_batch(mesh, axis_name)
    return jax.jit(eval_step, in_shardings=(rep, batch, rep, batch))
