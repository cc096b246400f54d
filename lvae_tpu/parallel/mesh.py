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

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Name of the optional second mesh axis that shards activations along the
# image-height dimension (see `make_mesh(spatial=...)`).
SPATIAL_AXIS = "space"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "data",
    spatial: int = 1,
) -> Mesh:
    """1-D ``(data,)`` mesh, or — with ``spatial > 1`` — a 2-D
    ``(data, space)`` mesh of ``n_devices × spatial`` devices.

    The ``space`` axis shards activations along image HEIGHT (NHWC axis 1)
    via GSPMD: one `with_sharding_constraint` on the preprocessed batch
    (see :func:`activation_constraint`) and XLA's SPMD partitioner
    propagates the layout through the conv stacks, inserting halo
    exchanges for the k>1 kernels and cross-shard reductions for
    batchnorm statistics and the loss — exact semantics, no hand-written
    communication (SURVEY.md §5: the TPU analog for images that outgrow
    one chip's HBM; the reference has no counterpart)."""
    if spatial < 1:
        raise ValueError(f"spatial must be >= 1, got {spatial}")
    devs = list(devices) if devices is not None else jax.devices()
    n_data = n_devices if n_devices is not None else len(devs) // spatial
    total = n_data * spatial
    if len(devs) < total:
        raise ValueError(
            f"requested {total} devices ({n_data} data x {spatial} spatial), "
            f"only {len(devs)} available"
        )
    devs = devs[:total]
    if spatial > 1:
        grid = np.asarray(devs).reshape(n_data, spatial)
        return Mesh(grid, (axis_name, SPATIAL_AXIS))
    return Mesh(np.asarray(devs), (axis_name,))


def activation_constraint(
    mesh: Mesh, axis_name: str = "data"
) -> Optional[Callable[[jax.Array], jax.Array]]:
    """Sharding-constraint hook for NHWC activations: batch on ``data``,
    height on ``space`` when the mesh has that axis (else None — the pure
    data-parallel layout needs no in-step constraint; the sharded batch
    gather already pins it)."""
    if SPATIAL_AXIS not in mesh.axis_names:
        return None
    sh = NamedSharding(mesh, P(axis_name, SPATIAL_AXIS, None, None))

    def constrain(x: jax.Array) -> jax.Array:
        return jax.lax.with_sharding_constraint(x, sh)

    return constrain


def assert_process_contiguous(mesh: Mesh, axis_name: str = "data") -> None:
    """Raise unless every index along ``axis_name`` is owned by exactly one
    process and each process's indices form one contiguous, equal-sized
    run — the layout per-host data feeding through
    ``jax.make_array_from_process_local_data`` assumes. ``make_mesh`` /
    ``global_mesh`` layouts satisfy this; a hand-built grid (e.g. one
    transposed so spatial groups span hosts) does not, and feeding
    process-local slices onto such a mesh corrupts the batch SILENTLY —
    wrong global shape, divergent cross-process "replicas" — rather than
    raising. (Index assembly via ``multihost.make_global_batch_indices``
    is layout-agnostic and does not need this.)"""
    grid = np.asarray(mesh.devices)
    ax = list(mesh.axis_names).index(axis_name)
    rows = np.moveaxis(grid, ax, 0).reshape(grid.shape[ax], -1)
    owners = []
    for i, row in enumerate(rows):
        procs = {d.process_index for d in row}
        if len(procs) != 1:
            raise ValueError(
                f"mesh axis '{axis_name}' index {i} spans processes "
                f"{sorted(procs)} — per-host batch feeding requires each "
                "data index to live on one process"
            )
        owners.append(procs.pop())
    runs: list[tuple[int, int]] = []
    for p in owners:
        if runs and runs[-1][0] == p:
            runs[-1] = (p, runs[-1][1] + 1)
        else:
            runs.append((p, 1))
    if len({p for p, _ in runs}) != len(runs) or len({c for _, c in runs}) != 1:
        raise ValueError(
            f"mesh axis '{axis_name}' process ownership {owners} is not "
            "contiguous equal blocks — per-host batch feeding would map "
            "local slices onto the wrong global rows"
        )


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
        # pin the outputs: left to itself the partitioner may return some
        # param leaves sharded over a spatial axis, which then mismatches
        # the replicated in_shardings on the NEXT call (strictly rejected
        # under multi-process); state must round-trip replicated anyway
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_eval_step(eval_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (state, batch_u8, key, idx) -> metrics step: the batch and
    its global-index vector shard on the data axis."""
    rep = replicated(mesh)
    batch = shard_batch(mesh, axis_name)
    return jax.jit(eval_step, in_shardings=(rep, batch, rep, batch))
