"""Parallelism: device mesh + sharding (data-parallel, optional spatial)."""

from lvae_tpu.parallel.mesh import (
    SPATIAL_AXIS,
    activation_constraint,
    assert_process_contiguous,
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicated,
    shard_batch,
)
from lvae_tpu.parallel.multihost import (
    eval_batch_stream,
    global_mesh,
    host_local_indices,
    initialize,
    local_copy,
    make_global_batch_indices,
    make_global_sharded,
    replicate_to_mesh,
    replicated_key,
)

__all__ = [
    "SPATIAL_AXIS",
    "activation_constraint",
    "assert_process_contiguous",
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_mesh",
    "replicated",
    "shard_batch",
    "eval_batch_stream",
    "global_mesh",
    "host_local_indices",
    "initialize",
    "local_copy",
    "make_global_batch_indices",
    "make_global_sharded",
    "replicate_to_mesh",
    "replicated_key",
]
