"""Parallelism: device mesh + sharding for data-parallel training."""

from lvae_tpu.parallel.mesh import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicated,
    shard_batch,
)
from lvae_tpu.parallel.multihost import (
    global_mesh,
    host_local_indices,
    initialize,
    make_global_batch_indices,
)

__all__ = [
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_mesh",
    "replicated",
    "shard_batch",
    "global_mesh",
    "host_local_indices",
    "initialize",
    "make_global_batch_indices",
]
