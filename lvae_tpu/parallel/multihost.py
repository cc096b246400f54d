"""Multi-host / multi-slice initialization and per-host data sharding.

The reference has no distributed support at all (SURVEY.md §2.5); this
module completes the new framework's scaling story beyond one host:

- ``initialize()`` wraps ``jax.distributed.initialize`` (TPU pods
  auto-discover the coordinator from the TPU environment; explicit
  coordinator args cover GPU/CPU clusters).
- ``global_mesh()`` builds the data mesh over ALL devices of the job —
  within a slice the gradient psum rides ICI; across slices XLA routes
  the same collective over DCN, with no code changes (the scaling-book
  recipe: mesh + shardings, let XLA place collectives).
- ``make_global_batch_indices()`` assembles the globally-sharded batch
  index vector: every host passes the full (tiny) vector and each device
  slices out its own shard — with the device-resident dataset replicated
  per host, the jitted step then gathers every image locally.
  (``host_local_indices()`` remains as a contiguous-layout diagnostic
  helper.)

Single-host meshes (including the virtual 8-CPU-device test mesh) work
through the same code path with ``process_count == 1``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from lvae_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-process JAX runtime (no-op if single-process
    and no coordinator is configured). Call before any other jax use."""
    if coordinator_address is None and num_processes is None:
        # TPU pods: jax.distributed.initialize() discovers everything from
        # the TPU metadata environment. Only the specific "no cluster
        # detected" failure (ValueError: coordinator_address undefined) is
        # treated as single-process; anything else — a genuine pod-init
        # failure — must propagate, not silently degrade to one process.
        try:
            jax.distributed.initialize()
        except ValueError as e:
            if "coordinator_address" in str(e):
                return  # no cluster environment detected: single process
            raise
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(axis_name: str = "data", spatial: int = 1) -> jax.sharding.Mesh:
    """Data mesh over every device in the job (all hosts/slices); with
    ``spatial > 1`` a 2-D ``(data, space)`` mesh whose row-major layout
    keeps each spatial group on consecutive (same-host) devices — conv
    halo exchanges ride ICI within a host while the gradient psum crosses
    hosts, the bandwidth-correct orientation."""
    return make_mesh(devices=jax.devices(), axis_name=axis_name, spatial=spatial)


def host_local_indices(global_idx: np.ndarray) -> np.ndarray:
    """This host's contiguous slice of a [global_batch] index vector.

    ASSUMES the mesh's data axis is process-contiguous (host i owns global
    rows [i*b/n, (i+1)*b/n)) — true for the 1-D meshes ``make_mesh`` /
    ``global_mesh`` build and for the row-major ``(data, space)`` layout,
    NOT for arbitrary device grids. Diagnostic/data-locality helper only;
    batch assembly goes through ``make_global_batch_indices``, which does
    not rely on this assumption."""
    n = jax.process_count()
    if n == 1:
        return global_idx
    b = len(global_idx)
    if b % n:
        raise ValueError(f"global batch {b} not divisible by {n} processes")
    per = b // n
    i = jax.process_index()
    return global_idx[i * per : (i + 1) * per]


def make_global_sharded(
    mesh: jax.sharding.Mesh,
    host_array,
    axis_name: str = "data",
    batch_axis: int = 0,
) -> jax.Array:
    """Globally-sharded array from a host-resident FULL array.

    Every process passes the full array and each addressable device
    slices out exactly its own shard via ``jax.make_array_from_callback``
    (only this process's shards are materialized on device). Correct on
    ANY mesh layout, including meshes whose data shards span processes
    (e.g. a transposed ``(data, space)`` mesh): a per-host
    contiguous-slice assembly through
    ``make_array_from_process_local_data`` would violate that API's
    identical-replicas contract there and silently corrupt the batch —
    wrong global shape, divergent cross-process "replicas" — rather than
    raise. ``batch_axis=1`` shards the second axis (the [k, batch]
    multi-step index matrix)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * batch_axis), axis_name)
    sharding = NamedSharding(mesh, spec)
    full = np.ascontiguousarray(np.asarray(host_array))
    return jax.make_array_from_callback(full.shape, sharding, lambda s: full[s])


def make_global_batch_indices(
    mesh: jax.sharding.Mesh, global_idx: np.ndarray, axis_name: str = "data"
) -> jax.Array:
    """Assemble the globally-sharded [batch] index array (the images
    themselves are gathered on device from the replicated dataset)."""
    return make_global_sharded(mesh, global_idx, axis_name)


def replicated_key(mesh: jax.sharding.Mesh, seed: int = 0) -> jax.Array:
    """PRNG key as a mesh-replicated GLOBAL array. Jits whose shardings
    span processes reject a plain process-local key; building it inside a
    mesh-pinned jit is the layout-agnostic way to promote it."""
    from lvae_tpu.parallel.mesh import replicated

    return jax.jit(lambda: jax.random.key(seed), out_shardings=replicated(mesh))()


def eval_batch_stream(
    mesh: Optional[jax.sharding.Mesh],
    test_data,
    bundle_test,
    batch_size: int,
    max_batches: Optional[int] = None,
):
    """Yield ``(jidx, batch, n_valid)`` for a sequential test sweep — the
    ONE shared implementation of the eval feeding convention (used by both
    ``Experiment.evaluate`` and ``evaluate_iwll``, which previously carried
    drifting copies of it).

    The short last batch is padded to the common compiled shape by
    repeating its final index; callers mask with ``n_valid`` on device.
    Under ``process_count > 1`` the index vector and the batch are
    assembled as GLOBAL arrays via :func:`make_global_sharded` (a sharded
    jit rejects process-local inputs); single-process keeps the
    device-resident ``gather`` fast path.
    """
    import jax.numpy as jnp

    multi = mesh is not None and jax.process_count() > 1
    test_np = np.asarray(bundle_test) if multi else None
    for bi, idx in enumerate(test_data.sequential_indices(batch_size)):
        if max_batches is not None and bi >= max_batches:
            break
        n_valid = len(idx)
        if n_valid < batch_size:
            idx = np.concatenate([idx, np.full(batch_size - n_valid, idx[-1])])
        if multi:
            yield (
                make_global_sharded(mesh, idx),
                make_global_sharded(mesh, test_np[idx]),
                n_valid,
            )
        else:
            jidx = jnp.asarray(idx)
            yield jidx, test_data.gather(jidx), n_valid


def replicate_to_mesh(tree, mesh: jax.sharding.Mesh):
    """Convert a pytree of process-local (host or single-device) arrays to
    fully-replicated GLOBAL arrays over ``mesh``. No-op single-process.

    Needed before feeding state / datasets into a jit whose ``in_shardings``
    span processes: under ``process_count > 1`` such a jit only accepts
    global arrays (plus genuinely host-side scalars), and every process
    must hold identical values — which is true by construction for
    seed-deterministic state and replicated datasets."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # typed PRNG keys (state.rng) can't cross np.asarray — ship their raw
    # data and re-wrap on the global side (a pure bitcast view)
    is_key = [
        isinstance(x, jax.Array)
        and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
        for x in leaves
    ]
    impls = [jax.random.key_impl(x) if k else None
             for x, k in zip(leaves, is_key)]
    host = [
        np.asarray(jax.random.key_data(x)) if k else np.asarray(x)
        for x, k in zip(leaves, is_key)
    ]
    glob = multihost_utils.host_local_array_to_global_array(host, mesh, P())
    out = [
        jax.random.wrap_key_data(g, impl=i) if k else g
        for g, k, i in zip(glob, is_key, impls)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def local_copy(tree):
    """Inverse of :func:`replicate_to_mesh` for fully-replicated trees:
    pull each leaf's (locally addressable) replica to this process and
    rebuild plain process-local arrays, so unsharded jits — image dumps,
    diagnostics — can run host-locally without tripping the global-array
    input rules. No-op single-process."""
    if jax.process_count() == 1:
        return tree

    import jax.numpy as jnp

    def _leaf(x):
        if not isinstance(x, jax.Array):
            return x
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = jax.device_get(jax.random.key_data(x))
            return jax.random.wrap_key_data(
                jnp.asarray(data), impl=jax.random.key_impl(x)
            )
        return jnp.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(_leaf, tree)
